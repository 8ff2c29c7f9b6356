"""Parallel cyclic reduction (PCR) for the bordered block-tridiagonal
KKT system, in lane-major (node-axis-last) layout.

The scan-based factorization (nlp/kkt.py) is sequential in the node
axis: ~N dependent steps of d x d block algebra.  On TPU that is
latency-bound (hundreds of microseconds of serial dispatch per solve).
PCR restructures the same elimination into ceil(log2 N) *levels*: at
level l every equation k simultaneously eliminates its neighbors at
distance s = 2**l, so each level is a handful of batched block
matmuls/inverses that XLA vectorizes over nodes and over vmapped
problem instances.  Total flops grow to O(N log N) block ops (vs O(N)
sequential), but depth drops from O(N) to O(log N) — the right trade
on hardware with idle vector capacity.

Layout is the performance-critical choice: all block arrays are
``(d, d, N)`` with the node axis on the 128-wide TPU lane dimension
(ops/lanes.py).  The natural ``(N, d, d)`` layout tiles the trailing
(d, d) to (8, 128) — a ~40x physical blow-up for collocation-sized
blocks (d ~ 5-20) that made the round-2 factorization ~99% padding
traffic.  Every level here is an elementwise multiply-add across the
node lanes with zero waste.

Crucially for TPU compile times, every level operates on arrays of the
SAME shape with only the static shift distance varying; the program
stays constant-size per level (the round-1 halved-shape variant blew
compiles past 20 minutes).

The border (unknown parameters / free-``h`` dense columns and the
instance-constraint rows — the arrow structure from
opty/direct_collocation.py:2659-2663 and :2243-2251) is carried
through every level: after elimination each node satisfies
``D_k u_k + F'_k beta = r'_k``, and substituting into the border rows
gives a small dense Schur complement solved once.

This is also the single-chip form of the distributed KKT solve: the
level-s neighbor exchanges become ``ppermute`` halos when the node
axis is sharded across a mesh (SURVEY.md P3/P5); see
opty_tpu/parallel/spike.py for the multi-device substructuring
variant.

Numerical character matches the scan path: no inter-block pivoting
(partial pivoting happens inside ``block_inv_nl`` only), so it relies
on the same Jacobi equilibration + mixed-precision iterative
refinement (nlp/kkt.py) that the IPM applies around every solve.
"""

from typing import NamedTuple

import jax.numpy as jnp

from .lanes import block_inv_nl, matmul_nl, matvec_nl, transpose_nl

__all__ = ['PCRFactorization', 'pcr_factor', 'pcr_solve', 'num_levels']


class PCRFactorization(NamedTuple):
    A: jnp.ndarray          # (L, d, d, N) lower elimination multipliers
    B: jnp.ndarray          # (L, d, d, N) upper elimination multipliers
    Dinv: jnp.ndarray       # (d, d, N) inverses of the final diagonal
    Fp: jnp.ndarray         # (d, b, N) fully-eliminated border columns
    Z: jnp.ndarray          # (d, b, N) Dinv^T @ F_original (border rows)
    schur_inv: jnp.ndarray  # (b, b) inverse of the border Schur compl.


def num_levels(n):
    """ceil(log2 n): levels needed so the final stride covers n."""
    return max(1, (n - 1).bit_length())


def _down(x, s):
    """x[..., k] -> value at node k-s (zeros at the low boundary)."""
    return jnp.concatenate([jnp.zeros_like(x[..., :s]), x[..., :-s]],
                           axis=-1)


def _up(x, s):
    """x[..., k] -> value at node k+s (zeros at the high boundary)."""
    return jnp.concatenate([x[..., s:], jnp.zeros_like(x[..., :s])],
                           axis=-1)


def pcr_factor(D, E, F, Kbb):
    """PCR factorization of the bordered block-tridiagonal system.

    Inputs are lane-major: D (d, d, N), E (d, d, N) with E[..., 0] = 0,
    F (d, b, N), Kbb (b, b).  Equation k reads ``E_k u_{k-1} + D_k u_k
    + E_{k+1}^T u_{k+1} + F_k beta = r_k``, plus the border rows
    ``sum_k F_k^T u_k + Kbb beta = rb``.

    On TPU, when the whole level recursion fits in VMEM, the reduction
    runs as ONE fused Pallas program per instance
    (ops/pallas_pcr.py) — same algorithm, same pivoting, but without
    the per-level HBM round trips that made the jnp form super-linear
    in the vmapped batch (round-3 profile: 25.5 ms at 128 lanes vs
    1.6 ms at 16).  The factorization arrays then carry a node axis
    zero-padded to a lane multiple; ``pcr_solve`` detects and handles
    the padding.

    Each level eliminates the distance-s neighbors from every
    equation at once:  with ``A_k = L_k Dinv_{k-s}`` and
    ``B_k = U_k Dinv_{k+s}``,

        D'_k = D_k - A_k U_{k-s} - B_k L_{k+s}
        L'_k = -A_k L_{k-s},   U'_k = -B_k U_{k+s}   (couple at 2s)
        F'_k = F_k - A_k F_{k-s} - B_k F_{k+s}

    Out-of-range neighbors contribute nothing because the shifted
    arrays are zero-padded.  After ceil(log2 N) levels the off-diagonal
    couplings vanish identically.
    """
    N = D.shape[-1]
    b = F.shape[-2]
    F0 = F

    from .pallas_pcr import fused_supported, pcr_factor_fused
    if D.ndim == 3 and fused_supported(D.shape[-3], b, N, dtype=D.dtype):
        A_st, B_st, Dinv, Fp, Z = pcr_factor_fused(D, E, F)
        if b:
            schur = Kbb - jnp.einsum('dbn,den->be', Z, Fp)
            schur_inv = _small_inv(schur)
        else:
            schur_inv = jnp.zeros((0, 0), D.dtype)
        return PCRFactorization(A=A_st, B=B_st, Dinv=Dinv, Fp=Fp, Z=Z,
                                schur_inv=schur_inv)

    Lb = E                                    # couples u_{k-s}
    Ub = transpose_nl(_up(E, 1))              # E_{k+1}^T couples u_{k+s}

    A_levels = []
    B_levels = []
    s = 1
    for _ in range(num_levels(N)):
        Dinv = block_inv_nl(D)
        A = matmul_nl(Lb, _down(Dinv, s))
        B = matmul_nl(Ub, _up(Dinv, s))
        D = D - matmul_nl(A, _down(Ub, s)) - matmul_nl(B, _up(Lb, s))
        F = F - matmul_nl(A, _down(F, s)) - matmul_nl(B, _up(F, s))
        Lb, Ub = -matmul_nl(A, _down(Lb, s)), -matmul_nl(B, _up(Ub, s))
        A_levels.append(A)
        B_levels.append(B)
        s *= 2

    Dinv = block_inv_nl(D)
    Z = matmul_nl(transpose_nl(Dinv), F0)
    if b:
        schur = Kbb - jnp.einsum('...dbn,...den->...be', Z, F)
        schur_inv = _small_inv(schur)
    else:
        schur_inv = jnp.zeros(D.shape[:-3] + (0, 0), D.dtype)
    return PCRFactorization(A=jnp.stack(A_levels), B=jnp.stack(B_levels),
                            Dinv=Dinv, Fp=F, Z=Z, schur_inv=schur_inv)


def _small_inv(A):
    """Inverse of one small dense matrix via the lane-major routine
    (pure jnp — runs in emulated f64 on TPU, no LAPACK custom call)."""
    return block_inv_nl(A[..., None])[..., 0]


def pcr_solve(fac: PCRFactorization, r_nodes, r_border):
    """Solve with a PCR factorization.  r_nodes (d, N), r_border (b,).

    Accepts factorizations whose node axis was lane-padded by the
    fused Pallas factor path (ops/pallas_pcr.py): the rhs is zero-
    padded to match and the solution sliced back — padded nodes are
    exactly decoupled, so the real solution is unchanged."""
    dtype = fac.Dinv.dtype
    r = r_nodes.astype(dtype)
    rb = r_border.astype(dtype)
    b = fac.Fp.shape[-2]
    N = r_nodes.shape[-1]
    Np = fac.Dinv.shape[-1]

    from .pallas_pcr import fused_supported, pcr_downsweep_fused
    use_fused = (fac.Dinv.ndim == 3
                 and fused_supported(fac.Dinv.shape[-3], b, N,
                                     dtype=fac.Dinv.dtype))
    if Np != N:
        r = jnp.concatenate(
            [r, jnp.zeros(r.shape[:-1] + (Np - N,), dtype)], axis=-1)

    if use_fused:
        r = pcr_downsweep_fused(fac.A, fac.B, r)
        return _pcr_backsolve(fac, r, rb, b, N, dtype)

    s = 1
    for l in range(fac.A.shape[0]):
        r = (r - matvec_nl(fac.A[l], _down(r, s))
             - matvec_nl(fac.B[l], _up(r, s)))
        s *= 2
    return _pcr_backsolve(fac, r, rb, b, N, dtype)


def _pcr_backsolve(fac, r, rb, b, N, dtype):
    """Border elimination + diagonal solve shared by both downsweep
    paths; slices a lane-padded solution back to the true N."""

    if b:
        rb_red = rb - jnp.einsum('...dbn,...dn->...b', fac.Z, r)
        beta = jnp.einsum('...be,...e->...b', fac.schur_inv, rb_red)
        rhs = r - jnp.sum(fac.Fp * beta[..., None, :, None], axis=-2)
    else:
        beta = jnp.zeros(r.shape[:-2] + (0,), dtype)
        rhs = r
    u = matvec_nl(fac.Dinv, rhs)
    return u[..., :N], beta
