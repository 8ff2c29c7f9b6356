"""Lane-major (node-axis-last) batched small-block linear algebra.

The KKT factorizations operate on huge batches of tiny d x d blocks
(d = states + unknown inputs + eoms per node; the batch is N nodes x
vmapped instances).  In the natural ``(N, d, d)`` layout XLA-TPU tiles
the trailing two axes to (8 sublanes, 128 lanes), so a (500, 5, 5)
block array physically occupies (500, 8, 128) — a ~40x memory blow-up
that turns every elementwise pass of the factorization into wasted HBM
traffic (measured: the mixed-precision PCR factorization spent ~99% of
its time on padding, nlp/kkt.py round-2 profile).

Here the node axis lives LAST: a block array is ``(..., d, d, N)``, so
the tiled layout is (d, 8, next_multiple(N, 128)) — near-zero padding
for any N >= 128 — and every elimination/update step is a dense vector
op across the node lanes.  This is the pure-jnp expression of the same
layout the Pallas kernels in ops/pallas_blocks.py use explicitly
(batch-in-lanes); XLA fuses the short static loops over d at least as
well as a hand-written kernel at these block sizes, without a separate
compile path to maintain.

All functions are shape-polymorphic over leading batch axes and work
in any dtype on any backend (pure jnp arithmetic — including TPU's
emulated float64).
"""

import jax.numpy as jnp

__all__ = ['matmul_nl', 'matvec_nl', 'transpose_nl', 'block_inv_nl',
           'to_lanes', 'from_lanes']


def to_lanes(A):
    """(..., N, d, e) -> (..., d, e, N)."""
    return jnp.moveaxis(A, -3, -1)


def from_lanes(A):
    """(..., d, e, N) -> (..., N, d, e)."""
    return jnp.moveaxis(A, -1, -3)


def transpose_nl(A):
    """Per-node matrix transpose in lane-major layout."""
    return jnp.swapaxes(A, -3, -2)


def matmul_nl(A, B):
    """(..., i, j, N) @ (..., j, k, N) -> (..., i, k, N).

    The contraction is unrolled over the tiny static j axis: each term
    is an elementwise (i, k, N) multiply-add across the node lanes, so
    no transpose out of the lane layout is ever generated.
    """
    j = A.shape[-2]
    acc = A[..., :, 0:1, :] * B[..., 0:1, :, :]
    for jj in range(1, j):
        acc = acc + A[..., :, jj:jj + 1, :] * B[..., jj:jj + 1, :, :]
    return acc


def matvec_nl(A, v):
    """(..., i, j, N) @ (..., j, N) -> (..., i, N)."""
    return jnp.sum(A * v[..., None, :, :], axis=-2)


def block_inv_nl(A):
    """Inverse of lane-resident small matrices, shape (..., d, d, N).

    Gaussian elimination with per-lane partial pivoting (one-hot
    select-based row swaps — no gathers, which fault the TPU runtime
    inside vmapped f64-emulated programs) followed by triangular back-
    substitution; the same algorithm as ops/smallblock.block_inv and
    the Pallas kernel in ops/pallas_blocks.py, so the three are
    interchangeable oracles.  Singular inputs produce inf/nan entries
    (callers detect non-finite directions and regularize).
    """
    d = A.shape[-3]
    rows2 = jnp.arange(d)[:, None]          # (d, 1)   vs (..., d, N)
    rows3 = jnp.arange(d)[:, None, None]    # (d, 1, 1) vs (..., d, d, N)
    M = A
    eye = jnp.eye(d, dtype=A.dtype)[:, :, None]
    R = jnp.broadcast_to(eye, A.shape)

    for k in range(d):
        col = jnp.abs(M[..., :, k, :])                      # (..., d, N)
        col = jnp.where(rows2 >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-2)                        # (..., N)
        is_p = (rows2 == p[..., None, :])[..., :, None, :]  # (..., d, 1, N)
        is_k = rows3 == k                                   # (d, 1, 1)

        def swap(X):
            row_p = jnp.sum(X * is_p, axis=-3, keepdims=True)
            row_k = X[..., k:k + 1, :, :]
            return jnp.where(is_k, row_p, jnp.where(is_p, row_k, X))

        M = swap(M)
        R = swap(R)

        below = rows3 > k
        piv = M[..., k:k + 1, k:k + 1, :]                   # (..., 1, 1, N)
        f = jnp.where(below, M[..., :, k:k + 1, :] / piv, 0.0)
        M = M - f * M[..., k:k + 1, :, :]
        R = R - f * R[..., k:k + 1, :, :]

    X = jnp.zeros_like(R)
    for k in reversed(range(d)):
        rhs = R[..., k:k + 1, :, :] - matmul_nl(M[..., k:k + 1, :, :], X)
        xk = rhs / M[..., k:k + 1, k:k + 1, :]
        X = jnp.where(rows3 == k, xk, X)
    return X
