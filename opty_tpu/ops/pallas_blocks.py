"""Pallas TPU kernels for the batched small-block linear algebra at
the heart of the KKT factorizations.

Why a kernel: the factorizations (nlp/kkt.py scan path, ops/tridiag.py
PCR) spend their time on huge *batches* of tiny d x d matrices
(d = states + inputs + eoms per collocation node, typically 5-50;
batch = nodes x vmapped problem instances, thousands).  XLA lays a
``(B, d, d)`` array out with the trailing ``d`` on the 128-wide lane
axis — for d ~ 10 that wastes >90% of every VPU register and of the
VMEM traffic.  These kernels transpose to a *batch-in-lanes* layout
``(d, d, B)``: each lane owns one matrix, every elimination step is a
dense (d, d, 128) vector op with zero padding waste, and one grid step
factors 128 matrices entirely in VMEM.

The algorithm matches ops/smallblock.py (Gaussian elimination with
partial pivoting + triangular back-substitution, the swap expressed
with one-hot masks — per-lane pivoting needs no gathers), so the two
implementations are interchangeable oracles for each other; see
tests/test_pallas_blocks.py (interpret mode on CPU, native on TPU).
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['block_inv_pallas', 'block_matmul_pallas',
           'has_pallas_support']

_LANES = 128


def has_pallas_support():
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:  # pragma: no cover
        return False
    return True


def _inv_kernel(a_ref, out_ref, *, d):
    """Invert 128 lane-resident d x d matrices: refs are (d, d, 128)."""
    A = a_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, _LANES), 0)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 1))
    R = jnp.broadcast_to(eye.astype(A.dtype), (d, d, _LANES))

    for k in range(d):
        col = jnp.abs(A[:, k, :])
        col = jnp.where(rows >= k, col, -jnp.inf)
        # lax.argmax with an explicit int32 index dtype: under x64 the
        # jnp wrapper defaults to int64, which Mosaic can't lower
        p = jax.lax.argmax(col, 0, jnp.int32)            # (128,) per lane
        is_p = (rows == p[None, :])[:, None, :]          # (d, 1, 128)
        is_k = (rows == k)[:, None, :]

        def swap(M):
            # exact select-based permutation (an additive swap loses
            # relative accuracy when magnitudes differ; see
            # ops/smallblock.py)
            Mp = jnp.sum(M * is_p, axis=0)               # (d, 128) row p
            Mk = M[k]
            return jnp.where(is_k, Mp[None, :, :],
                             jnp.where(is_p, Mk[None, :, :], M))

        A = swap(A)
        R = swap(R)

        pivot = A[k, k, :]
        f = jnp.where(rows > k, A[:, k, :] / pivot[None, :], 0.0)
        A = A - f[:, None, :] * A[k][None, :, :]
        R = R - f[:, None, :] * R[k][None, :, :]

    X = jnp.zeros_like(R)
    for k in reversed(range(d)):
        contrib = jnp.sum(A[k][:, None, :] * X, axis=0)  # (d, 128)
        xk = (R[k] - contrib) / A[k, k, :][None, :]
        X = jnp.where((rows == k)[:, None, :], xk[None, :, :], X)
    out_ref[:] = X


def _matmul_kernel(a_ref, b_ref, out_ref, *, d):
    """C[i,j,lane] = sum_k A[i,k,lane] B[k,j,lane] for 128 lanes."""
    A = a_ref[:]
    B = b_ref[:]
    acc = jnp.zeros_like(A)
    for k in range(d):
        acc = acc + A[:, k, None, :] * B[None, k, :, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=('interpret',))
def block_matmul_pallas(A, B, interpret=False):
    """Batched d x d matmul in the batch-in-lanes layout.

    A, B (..., d, d) -> (..., d, d); equivalent to ``A @ B`` but with
    one matrix per VPU lane instead of XLA's padded trailing-dim
    tiling."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = A.shape[:-2]
    d = A.shape[-1]
    Bn = 1
    for s in batch_shape:
        Bn *= s
    Bp = ((Bn + _LANES - 1) // _LANES) * _LANES
    Af = A.reshape(Bn, d, d)
    Bf = B.reshape(Bn, d, d)
    if Bp != Bn:
        pad = jnp.zeros((Bp - Bn, d, d), A.dtype)
        Af = jnp.concatenate([Af, pad], axis=0)
        Bf = jnp.concatenate([Bf, pad], axis=0)
    At = jnp.transpose(Af, (1, 2, 0))
    Bt = jnp.transpose(Bf, (1, 2, 0))
    spec = pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    # Mosaic cannot lower the i64 grid/index values that global
    # jax_enable_x64 produces; trace the kernel in an x64-disabled
    # scope (all operands are f32)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_matmul_kernel, d=d),
            out_shape=jax.ShapeDtypeStruct((d, d, Bp), A.dtype),
            grid=(Bp // _LANES,),
            in_specs=[spec, spec], out_specs=spec,
            interpret=interpret,
        )(At, Bt)
    X = jnp.transpose(out, (2, 0, 1))[:Bn]
    return X.reshape(batch_shape + (d, d))


@functools.partial(jax.jit, static_argnames=('interpret',))
def block_inv_pallas(A, interpret=False):
    """Batched inverse of A (..., d, d) via the lane-parallel kernel.

    Semantics match ops.smallblock.block_inv; singular inputs produce
    non-finite entries for the caller's regularization logic to catch.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = A.shape[:-2]
    d = A.shape[-1]
    B = 1
    for s in batch_shape:
        B *= s
    Bp = ((B + _LANES - 1) // _LANES) * _LANES

    Af = A.reshape(B, d, d)
    if Bp != B:
        pad = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype),
                               (Bp - B, d, d))
        Af = jnp.concatenate([Af, pad], axis=0)
    # batch-in-lanes layout
    At = jnp.transpose(Af, (1, 2, 0))                    # (d, d, Bp)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_inv_kernel, d=d),
            out_shape=jax.ShapeDtypeStruct((d, d, Bp), A.dtype),
            grid=(Bp // _LANES,),
            in_specs=[pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(At)

    X = jnp.transpose(out, (2, 0, 1))[:B]
    return X.reshape(batch_shape + (d, d))
