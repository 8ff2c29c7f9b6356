"""Fused Pallas kernels for the PCR block-tridiagonal factorization.

Motivation (round-3 profile, pendulum N=501, d=5, TPU v5e): the
pure-jnp PCR factorization (ops/tridiag.py) costs 1.6 / 4.9 / 25.5 ms
per batched call at 16 / 64 / 128 vmapped instances — super-linear in
batch, because every one of the ~150 elementwise passes per reduction
level round-trips the (B, d, d, N) working set through HBM and XLA's
fusion boundaries re-materialize the level state.

Two structural facts drive the kernel design:

  * the whole per-instance factorization state is tiny (~1.5 MB for
    collocation-sized blocks), so the entire ceil(log2 N)-level
    reduction fits in VMEM at once — one Pallas program runs ALL
    levels with zero HBM round trips;
  * one instance per program is NOT enough work: a (d, d, N) op at
    d = 5, N = 512 touches ~13 vector registers, so a per-instance
    program is issue-bound, not compute-bound (measured: same 25 ms
    as the jnp path).  Each program therefore processes a GROUP of G
    instances (leading block axis), raising per-op occupancy G-fold,
    with G chosen as the largest power of two whose VMEM footprint
    fits.

The batch reaches the kernel through ``jax.custom_batching
.custom_vmap``: the unbatched call runs one G = 1 program, and the
vmap rule re-tiles the batched arrays into (B / G) grid programs of G
instances each — the IPM's ``vmap`` batching composes with the fused
kernel without the host code ever seeing layout details.

Numerics are identical to the jnp path: float32 blocks, same
elimination order, same per-lane partial pivoting (select-based swaps,
the twin of ops/lanes.block_inv_nl) — the IPM's equilibration + f64
iterative refinement contract (nlp/kkt.py) is unchanged.

Gated by :func:`fused_supported`: pallas available, TPU backend, VMEM
footprint within budget.  Problems too large for the single-program
form (gait-scale d ~ 50 at large N) fall back to the jnp path.

Reference context: this replaces the hot loop of the reference's KKT
solve, which lives inside Ipopt's MUMPS LU (opty
direct_collocation.py:242-247); the reference's own generated-kernel
analog is the OpenMP node loop (opty utils.py:716-741).
"""

import functools
import os

import jax
import jax.numpy as jnp

from .pallas_blocks import has_pallas_support

__all__ = ['fused_supported', 'pcr_factor_fused', 'pcr_downsweep_fused']

_LANES = 128
_VMEM_CEILING = 10 * 1024 * 1024   # leave headroom below ~16 MB/core
_INTERPRET = False                 # tests flip this for CPU interpret mode


def _num_levels(n):
    return max(1, (n - 1).bit_length())


def _pad_lanes(n):
    return ((n + _LANES - 1) // _LANES) * _LANES


def _factor_vmem(d, b, n, g):
    """VMEM footprint (bytes) of one G-instance factor program:
    inputs D, Lb, Ub, F + outputs A, B (levels), Dinv, Fp, Z — all
    DOUBLE-buffered by the grid pipeline — plus live temporaries incl.
    the (g, d, d, d, n) matmul broadcast."""
    np_ = _pad_lanes(n)
    lv = _num_levels(np_)
    dd = 2 * (2 * lv + 4 + 4)          # x2: pipeline double buffering
    return 4 * g * np_ * (d * d * dd + d * max(b, 1) * 8 + 2 * d ** 3)


def _sweep_vmem(d, b, n, g):
    np_ = _pad_lanes(n)
    lv = _num_levels(np_)
    return 4 * g * np_ * (d * d * 4 * lv + 8 * d)


def _pick_group(batch, d, b, n, vmem_fn):
    forced = os.environ.get('OPTY_TPU_PCR_GROUP')
    if forced:
        # clamp a forced group to a positive power of two that still
        # fits the VMEM budget — an oversized or non-power-of-two
        # value would silently bypass the fit check and fail at
        # Mosaic lowering with a VMEM overflow
        f = max(1, int(forced))
        g = 1 << (f.bit_length() - 1)   # largest power of two <= f
        while g > 1 and vmem_fn(d, b, n, g) > _VMEM_CEILING:
            g //= 2
        return g
    g = 8
    while g > 1 and (vmem_fn(d, b, n, g) > _VMEM_CEILING or g > batch):
        g //= 2
    return g


def fused_supported(d, b, n, backend=None, dtype=None):
    """True when the fused kernels apply: pallas available, TPU
    backend, float32 data, and the G = 1 program fits in VMEM.  A pure
    function of static shape/dtype info so the factor- and solve-side
    dispatch always agree."""
    if os.environ.get('OPTY_TPU_NO_FUSED_PCR'):
        return False
    if not has_pallas_support():
        return False
    if backend is None:
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover
            return False
    if backend != 'tpu':
        # the kernels use pltpu.roll / pltpu.VMEM: TPU-only (a GPU
        # backend would pass importability but die at Mosaic lowering)
        return False
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        # Mosaic cannot lower f64 (the documented factor_dtype='float64'
        # option runs the jnp path in emulated f64 instead)
        return False
    if n < 2:
        return False
    return _factor_vmem(d, b, n, 1) <= _VMEM_CEILING


# ---------------------------------------------------------------------------
# kernel-side block algebra on (G, d, e, N) arrays
# ---------------------------------------------------------------------------

def _down_k(x, s, n):
    """x[..., k] -> x[..., k-s] with zeros below (kernel-side)."""
    from jax.experimental.pallas import tpu as pltpu
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane = lane.reshape((1,) * (x.ndim - 1) + (n,))
    return jnp.where(lane >= s, pltpu.roll(x, s, axis=x.ndim - 1), 0.0)


def _up_k(x, s, n):
    """x[..., k] -> x[..., k+s] with zeros above (kernel-side)."""
    from jax.experimental.pallas import tpu as pltpu
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane = lane.reshape((1,) * (x.ndim - 1) + (n,))
    return jnp.where(lane < n - s, pltpu.roll(x, n - s, axis=x.ndim - 1),
                     0.0)


def _mm(A, B):
    """(..., i, k, N) x (..., k, j, N) -> (..., i, j, N) as ONE big
    broadcast multiply + one reduction (fewer, larger VPU ops than a
    k-unrolled slice loop — the kernel is issue-bound, not flop-bound
    at these block sizes)."""
    return jnp.sum(A[..., :, :, None, :] * B[..., None, :, :, :],
                   axis=-3)


def _mmT(A, B):
    """(..., k, i, N) x (..., k, j, N) -> A^T B (..., i, j, N)."""
    return jnp.sum(A[..., :, :, None, :] * B[..., :, None, :, :],
                   axis=-4)


def _mv(A, v):
    """(..., i, j, N) x (..., j, N) -> (..., i, N)."""
    return jnp.sum(A * v[..., None, :, :], axis=-2)


def _inv(A, d, n):
    """Per-lane partial-pivoted inverse of (..., d, d, n) blocks — the
    kernel-side twin of ops/lanes.block_inv_nl (same pivoting rule,
    same select-based row swaps, so the two are oracles for each
    other).  Singular lanes produce inf/nan for the caller's
    regularization feedback to catch."""
    lead = A.shape[:-3]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (d, n), 0)
    rows2 = rows2.reshape((1,) * len(lead) + (d, n))          # vs (..., d, n)
    rows3 = rows2[..., :, None, :]                            # vs (..., d, d, n)
    eye2 = (jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (d, d), 1))
    R = jnp.broadcast_to(eye2.astype(A.dtype)[..., None], A.shape)
    M = A
    for k in range(d):
        col = jnp.abs(M[..., :, k, :])                        # (..., d, n)
        col = jnp.where(rows2 >= k, col, -jnp.inf)
        p = jax.lax.argmax(col, col.ndim - 2, jnp.int32)      # (..., n)
        is_p = (rows2 == p[..., None, :])[..., :, None, :]    # (..., d, 1, n)
        is_k = rows3 == k

        def swap(X):
            Xp = jnp.sum(X * is_p, axis=-3, keepdims=True)    # (..., 1, d, n)
            Xk = X[..., k:k + 1, :, :]
            return jnp.where(is_k, Xp, jnp.where(is_p, Xk, X))

        M = swap(M)
        R = swap(R)

        pivot = M[..., k:k + 1, k:k + 1, :]
        f = jnp.where(rows3 > k, M[..., :, k:k + 1, :] / pivot, 0.0)
        M = M - f * M[..., k:k + 1, :, :]
        R = R - f * R[..., k:k + 1, :, :]

    X = jnp.zeros_like(R)
    for k in reversed(range(d)):
        # contrib_j = sum_i M[k, i] X[i, j]
        contrib = jnp.sum(M[..., k, :, :][..., :, None, :] * X,
                          axis=-3, keepdims=True)
        xk = (R[..., k:k + 1, :, :] - contrib) \
            / M[..., k:k + 1, k:k + 1, :]
        X = jnp.where(rows3 == k, xk, X)
    return X


def _factor_kernel(d_ref, lb_ref, ub_ref, f_ref,
                   a_ref, b_ref, dinv_ref, fp_ref, z_ref,
                   *, d, b, n, levels):
    """All PCR levels for a group of instances, VMEM-resident.

    Same recurrence as ops/tridiag.pcr_factor: at level stride s,
    A = Lb Dinv_{-s}, B = Ub Dinv_{+s}; D/F/Lb/Ub updated in place.
    """
    D = d_ref[:]
    Lb = lb_ref[:]
    Ub = ub_ref[:]
    if b:
        F0 = f_ref[:]
        F = F0
    s = 1
    for lvl in range(levels):
        Dinv = _inv(D, d, n)
        A = _mm(Lb, _down_k(Dinv, s, n))
        B = _mm(Ub, _up_k(Dinv, s, n))
        D = D - _mm(A, _down_k(Ub, s, n)) - _mm(B, _up_k(Lb, s, n))
        if b:
            F = F - _mm(A, _down_k(F, s, n)) - _mm(B, _up_k(F, s, n))
        Lb = -_mm(A, _down_k(Lb, s, n))
        Ub = -_mm(B, _up_k(Ub, s, n))
        a_ref[:, lvl] = A
        b_ref[:, lvl] = B
        s *= 2
    Dinv = _inv(D, d, n)
    dinv_ref[:] = Dinv
    if b:
        fp_ref[:] = F
        z_ref[:] = _mmT(Dinv, F0)   # Dinv^T F_original


def _downsweep_kernel(a_ref, b_ref, r_ref, out_ref, *, n, levels):
    """Forward elimination of the rhs through all levels:
    r <- r - A_l r_{-s} - B_l r_{+s}."""
    r = r_ref[:]
    s = 1
    for lvl in range(levels):
        r = (r - _mv(a_ref[:, lvl], _down_k(r, s, n))
             - _mv(b_ref[:, lvl], _up_k(r, s, n)))
        s *= 2
    out_ref[:] = r


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pad_last(x, np_):
    pad = np_ - x.shape[-1]
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, cfg)


def _prep_inputs(D, E, F):
    """Lane-pad and derive the upper coupling.  Works on (B, d, d, N)
    batched arrays.  Padded nodes get identity diagonals and zero
    couplings, so they are exactly decoupled from the real system."""
    d = D.shape[-3]
    N = D.shape[-1]
    np_ = _pad_lanes(N)
    dt = D.dtype
    Dp = _pad_last(D, np_)
    if np_ != N:
        lane = (jnp.arange(np_) >= N).astype(dt)
        Dp = Dp + jnp.eye(d, dtype=dt)[:, :, None] * lane
    Lb = _pad_last(E, np_)
    # Ub_k = E_{k+1}^T (zero beyond the last real node)
    Ub = _pad_last(jnp.swapaxes(
        jnp.concatenate([E[..., 1:], jnp.zeros_like(E[..., :1])], -1),
        -3, -2), np_)
    b = F.shape[-2]
    Fp_in = _pad_last(F, np_) if b else \
        jnp.zeros(F.shape[:-2] + (1, np_), dt)
    return Dp, Lb, Ub, Fp_in, np_


def _factor_call(Dp, Lb, Ub, Fin, *, d, b, np_, levels, g):
    """Grouped pallas_call: inputs (Bp, d, *, np_) with Bp % g == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp = Dp.shape[0]
    bk = max(b, 1)
    dt = Dp.dtype
    grid = (Bp // g,)

    def bs(shape):
        return pl.BlockSpec((g,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_factor_kernel, d=d, b=b, n=np_,
                             levels=levels)
    out_shapes = (
        jax.ShapeDtypeStruct((Bp, levels, d, d, np_), dt),
        jax.ShapeDtypeStruct((Bp, levels, d, d, np_), dt),
        jax.ShapeDtypeStruct((Bp, d, d, np_), dt),
        jax.ShapeDtypeStruct((Bp, d, bk, np_), dt),
        jax.ShapeDtypeStruct((Bp, d, bk, np_), dt),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern, grid=grid,
            out_shape=out_shapes,
            in_specs=[bs((d, d, np_)), bs((d, d, np_)), bs((d, d, np_)),
                      bs((d, bk, np_))],
            out_specs=(bs((levels, d, d, np_)), bs((levels, d, d, np_)),
                       bs((d, d, np_)), bs((d, bk, np_)),
                       bs((d, bk, np_))),
            interpret=_INTERPRET,
        )(Dp, Lb, Ub, Fin)


def _pad_batch(arrs, g, pad_eye_idx=None):
    """Pad the leading batch axis to a multiple of g.  ``pad_eye_idx``
    names the array that must stay invertible (D): its padding is the
    identity instead of zero, keeping every padded program finite."""
    B = arrs[0].shape[0]
    Bp = ((B + g - 1) // g) * g
    if Bp == B:
        return arrs, B
    out = []
    for i, a in enumerate(arrs):
        pad = jnp.zeros((Bp - B,) + a.shape[1:], a.dtype)
        if i == pad_eye_idx:
            d = a.shape[-3]
            pad = pad + jnp.eye(d, dtype=a.dtype)[:, :, None]
        out.append(jnp.concatenate([a, pad], axis=0))
    return tuple(out), B


from jax.custom_batching import custom_vmap  # noqa: E402


@custom_vmap
def pcr_factor_fused(D, E, F):
    """Fused factorization of one lane-major bordered block-tridiagonal
    system: D (d, d, N), E (d, d, N) with E[..., 0] = 0, F (d, b, N).

    Returns ``(A (L, d, d, Np), B (L, d, d, Np), Dinv, Fp, Z)`` with
    the node axis zero-padded to a lane multiple Np; padded nodes are
    exactly decoupled.  The caller assembles the border Schur
    complement from (Z, Fp) as in ops/tridiag.pcr_factor.

    Under ``jax.vmap`` the custom batching rule re-tiles the batch
    into grid programs of G instances each (see module docstring).
    """
    d = D.shape[-3]
    b = F.shape[-2]
    Dp, Lb, Ub, Fin, np_ = _prep_inputs(D[None], E[None], F[None])
    levels = _num_levels(np_)
    A, Bm, Dinv, Fp, Z = _factor_call(
        Dp, Lb, Ub, Fin, d=d, b=b, np_=np_, levels=levels, g=1)
    return _strip_border(A[0], Bm[0], Dinv[0], Fp[0], Z[0], b)


def _strip_border(A, Bm, Dinv, Fp, Z, b):
    if not b:
        Fp = Fp[..., :0, :]
        Z = Z[..., :0, :]
    return A, Bm, Dinv, Fp, Z


@pcr_factor_fused.def_vmap
def _pcr_factor_fused_vmap(axis_size, in_batched, D, E, F):
    db, eb, fb = in_batched
    bc = lambda x, is_b: x if is_b else \
        jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    D = bc(D, db)
    E = bc(E, eb)
    F = bc(F, fb)
    d = D.shape[-3]
    b = F.shape[-2]
    N = D.shape[-1]
    g = _pick_group(axis_size, d, b, N, _factor_vmem)
    Dp, Lb, Ub, Fin, np_ = _prep_inputs(D, E, F)
    (Dp, Lb, Ub, Fin), B0 = _pad_batch((Dp, Lb, Ub, Fin), g,
                                       pad_eye_idx=0)
    levels = _num_levels(np_)
    A, Bm, Dinv, Fp, Z = _factor_call(
        Dp, Lb, Ub, Fin, d=d, b=b, np_=np_, levels=levels, g=g)
    out = _strip_border(A[:B0], Bm[:B0], Dinv[:B0], Fp[:B0], Z[:B0], b)
    return out, (True,) * 5


@custom_vmap
def pcr_downsweep_fused(A, B, r):
    """Eliminate the rhs through all stored levels in one program.
    A, B (L, d, d, Np); r (d, Np) already padded to the factor's Np."""
    np_ = A.shape[-1]
    out = _sweep_call(A[None], B[None], r[None], np_=np_,
                      levels=A.shape[0], g=1)
    return out[0]


@pcr_downsweep_fused.def_vmap
def _pcr_downsweep_fused_vmap(axis_size, in_batched, A, B, r):
    ab, bb, rb = in_batched
    bc = lambda x, is_b: x if is_b else \
        jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    A = bc(A, ab)
    B = bc(B, bb)
    r = bc(r, rb)
    d = A.shape[-3]
    np_ = A.shape[-1]
    g = _pick_group(axis_size, d, 0, np_, _sweep_vmem)
    (A, B, r), B0 = _pad_batch((A, B, r), g)
    out = _sweep_call(A, B, r, np_=np_, levels=A.shape[1], g=g)
    return out[:B0], True


def _sweep_call(A, B, r, *, np_, levels, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp = A.shape[0]
    d = A.shape[-3]

    def bs(shape):
        return pl.BlockSpec((g,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_downsweep_kernel, n=np_, levels=levels)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern, grid=(Bp // g,),
            out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
            in_specs=[bs((levels, d, d, np_)), bs((levels, d, d, np_)),
                      bs((d, np_))],
            out_specs=bs((d, np_)),
            interpret=_INTERPRET,
        )(A, B, r)
