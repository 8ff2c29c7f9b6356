"""Parallel cyclic reduction (PCR) for the bordered block-tridiagonal
KKT system.

The scan-based factorization (nlp/kkt.py) is sequential in the node
axis: ~N dependent steps of d x d block algebra.  On TPU that is
latency-bound (hundreds of microseconds of serial dispatch per solve).
PCR restructures the same elimination into ceil(log2 N) *levels*: at
level l every equation k simultaneously eliminates its neighbors at
distance s = 2**l, so each level is a handful of batched (N, d, d)
matmuls/inverses that XLA vectorizes over nodes and over vmapped
problem instances.  Total flops grow to O(N log N) block ops (vs O(N)
sequential), but depth drops from O(N) to O(log N) — the right trade
on hardware with idle MXU capacity.

Crucially for TPU compile times, every level operates on arrays of the
SAME shape (N, d, d) with only the static shift distance varying.
The earlier halved-shape cyclic reduction produced log2(N) distinct
program shapes, which blew XLA-TPU compile times past 20 minutes
(round-1 VERDICT); this formulation keeps the per-level program
constant-size and compiles comparably to the scan path.

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
(partial pivoting happens inside ``block_inv`` only), so it relies on
the same Jacobi equilibration + mixed-precision iterative refinement
(nlp/kkt.py) that the IPM applies around every solve.
"""

from typing import NamedTuple

import jax.numpy as jnp

from .smallblock import block_inv

__all__ = ['PCRFactorization', 'pcr_factor', 'pcr_solve', 'num_levels']


class PCRFactorization(NamedTuple):
    A: jnp.ndarray          # (L, N, d, d) lower elimination multipliers
    B: jnp.ndarray          # (L, N, d, d) upper elimination multipliers
    Dinv: jnp.ndarray       # (N, d, d) inverses of the final diagonal
    Fp: jnp.ndarray         # (N, d, b) fully-eliminated border columns
    Z: jnp.ndarray          # (N, d, b) Dinv^T @ F_original (border rows)
    schur_inv: jnp.ndarray  # (b, b) inverse of the border Schur compl.


def num_levels(n):
    """ceil(log2 n): levels needed so the final stride covers n."""
    return max(1, (n - 1).bit_length())


def _down(x, s):
    """x[k] -> value at k-s (zeros flow in at the low boundary)."""
    return jnp.concatenate([jnp.zeros_like(x[:s]), x[:-s]], axis=0)


def _up(x, s):
    """x[k] -> value at k+s (zeros flow in at the high boundary)."""
    return jnp.concatenate([x[s:], jnp.zeros_like(x[:s])], axis=0)


def pcr_factor(D, E, F, Kbb, factor_dtype=None):
    """PCR factorization of the bordered block-tridiagonal system.

    Equation k reads ``E_k u_{k-1} + D_k u_k + E_{k+1}^T u_{k+1}
    + F_k beta = r_k`` (E[0] = 0), plus the border rows
    ``sum_k F_k^T u_k + Kbb beta = rb``.

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
    if factor_dtype is not None:
        D = D.astype(factor_dtype)
        E = E.astype(factor_dtype)
        F = F.astype(factor_dtype)
        Kbb = Kbb.astype(factor_dtype)
    N = D.shape[0]
    b = F.shape[2]
    F0 = F

    Lb = E                                     # couples u_{k-s}
    Ub = jnp.swapaxes(_up(E, 1), -1, -2)       # E_{k+1}^T couples u_{k+s}

    A_levels = []
    B_levels = []
    s = 1
    for _ in range(num_levels(N)):
        Dinv = block_inv(D)
        A = Lb @ _down(Dinv, s)
        B = Ub @ _up(Dinv, s)
        D = D - A @ _down(Ub, s) - B @ _up(Lb, s)
        F = F - A @ _down(F, s) - B @ _up(F, s)
        Lb, Ub = -(A @ _down(Lb, s)), -(B @ _up(Ub, s))
        A_levels.append(A)
        B_levels.append(B)
        s *= 2

    Dinv = block_inv(D)
    Z = jnp.swapaxes(Dinv, -1, -2) @ F0
    if b:
        schur = Kbb - jnp.einsum('kdb,kde->be', Z, F)
        schur_inv = block_inv(schur)
    else:
        schur_inv = jnp.zeros((0, 0), D.dtype)
    return PCRFactorization(A=jnp.stack(A_levels), B=jnp.stack(B_levels),
                            Dinv=Dinv, Fp=F, Z=Z, schur_inv=schur_inv)


def pcr_solve(fac: PCRFactorization, r_nodes, r_border):
    """Solve with a PCR factorization.  r_nodes (N, d), r_border (b,)."""
    dtype = fac.Dinv.dtype
    r = r_nodes.astype(dtype)
    rb = r_border.astype(dtype)
    b = fac.Fp.shape[2]

    s = 1
    for l in range(fac.A.shape[0]):
        r = (r - jnp.einsum('kij,kj->ki', fac.A[l], _down(r, s))
             - jnp.einsum('kij,kj->ki', fac.B[l], _up(r, s)))
        s *= 2

    if b:
        beta = fac.schur_inv @ (rb - jnp.einsum('kdb,kd->b', fac.Z, r))
    else:
        beta = jnp.zeros((0,), dtype)
    u = jnp.einsum('kij,kj->ki', fac.Dinv, r - fac.Fp @ beta)
    return u, beta
