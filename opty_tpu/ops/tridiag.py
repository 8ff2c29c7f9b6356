"""Block cyclic reduction for the bordered block-tridiagonal KKT.

The scan-based factorization (nlp/kkt.py) is sequential in the node
axis: ~N dependent steps of d x d block algebra.  On TPU that is
latency-bound (hundreds of microseconds of serial dispatch per solve).
Cyclic reduction (CR) restructures the same elimination into
ceil(log2 N) levels; each level eliminates all odd-indexed blocks *in
parallel* — every operation is a batched (n_level, d, d) matmul/
inverse, which XLA vectorizes over nodes and over vmapped problem
instances.  Total flops grow ~2x over the sequential factorization;
depth drops from O(N) to O(log N).  This is the single-chip analog of
the distributed cyclic-reduction KKT solve planned for node-sharded
problems (SURVEY.md P3/P5).

The border (unknown parameters / free h columns and instance rows) is
carried through every level exactly like in the sequential algorithm:
eliminated odd blocks contribute Schur updates to the border matrix,
and the final 1-block system is solved dense together with the border.

Numerical character matches the scan path: no inter-block pivoting, so
it relies on the same Jacobi equilibration + mixed-precision iterative
refinement (nlp/kkt.py) that the IPM applies around every solve.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .smallblock import block_inv

__all__ = ['CRFactorization', 'cr_factor', 'cr_solve']


class CRLevel(NamedTuple):
    A: jnp.ndarray          # (n2, d, d)  E_even @ Dinv(lower odd)
    B: jnp.ndarray          # (n2, d, d)  E_hi^T @ Dinv(upper odd)
    G: jnp.ndarray          # (n2, b, d)  F_odd^T @ Dinv_odd
    Dinv: jnp.ndarray       # (n2, d, d)  inverses of odd diagonal blocks
    DinvE_lo: jnp.ndarray   # (n2, d, d)  Dinv_odd @ E_odd
    DinvE_hiT: jnp.ndarray  # (n2, d, d)  Dinv_odd @ E(above)^T
    DinvF: jnp.ndarray      # (n2, d, b)  Dinv_odd @ F_odd


class CRFactorization(NamedTuple):
    levels: tuple           # of CRLevel, top level first
    root_inv: jnp.ndarray   # ((d+b), (d+b)) inverse of the final system
    n_orig: int
    scale_nodes: jnp.ndarray
    scale_border: jnp.ndarray


def _pad_pow2(D, E, F, r=None):
    n, d, _ = D.shape
    L = max(1, (n - 1).bit_length())
    n_pad = 1 << L
    pad = n_pad - n
    if pad:
        eye = jnp.broadcast_to(jnp.eye(d, dtype=D.dtype), (pad, d, d))
        D = jnp.concatenate([D, eye], axis=0)
        E = jnp.concatenate([E, jnp.zeros((pad, d, d), D.dtype)], axis=0)
        F = jnp.concatenate([F, jnp.zeros((pad,) + F.shape[1:], D.dtype)],
                            axis=0)
        if r is not None:
            r = jnp.concatenate([r, jnp.zeros((pad, d), D.dtype)], axis=0)
    return (D, E, F, r, L) if r is not None else (D, E, F, L)


def _shift_down(x):
    """x[j] -> x[j-1] with zeros in slot 0."""
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def _shift_up(x):
    """x[j] -> x[j+1] with zeros in the last slot."""
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)


def cr_factor(D, E, F, Kbb, factor_dtype=None):
    """Cyclic-reduction factorization of the bordered system.

    D (N, d, d) diagonal blocks; E (N, d, d) with E[k] coupling block
    k-1 to k (E[0] = 0); F (N, d, b) border columns; Kbb (b, b).
    """
    if factor_dtype is not None:
        D = D.astype(factor_dtype)
        E = E.astype(factor_dtype)
        F = F.astype(factor_dtype)
        Kbb = Kbb.astype(factor_dtype)
    D, E, F, L = _pad_pow2(D, E, F)
    n = D.shape[0]
    b = F.shape[2]
    d = D.shape[1]

    levels = []
    for _ in range(L):
        D_even, D_odd = D[0::2], D[1::2]
        E_lo, E_hi = E[0::2], E[1::2]     # E[2j], E[2j+1]
        F_even, F_odd = F[0::2], F[1::2]

        Dinv = block_inv(D_odd)
        Dinv_lo = _shift_down(Dinv)       # Dinv of odd 2j-1
        E_odd_lo = _shift_down(E_hi)      # E[2j-1]
        F_odd_lo = _shift_down(F_odd)     # F[2j-1]

        A = E_lo @ Dinv_lo                # E[2j] Dinv[2j-1]
        B = jnp.swapaxes(E_hi, 1, 2) @ Dinv

        D_new = (D_even - A @ jnp.swapaxes(E_lo, 1, 2) - B @ E_hi)
        E_new = -(A @ E_odd_lo)
        F_new = F_even - A @ F_odd_lo - B @ F_odd
        G = jnp.swapaxes(F_odd, 1, 2) @ Dinv
        Kbb = Kbb - jnp.sum(G @ F_odd, axis=0)

        E_up = _shift_up(E_lo)            # E[2j+2]
        levels.append(CRLevel(
            A=A, B=B, G=G, Dinv=Dinv,
            DinvE_lo=Dinv @ E_hi,
            DinvE_hiT=Dinv @ jnp.swapaxes(E_up, 1, 2),
            DinvF=Dinv @ F_odd))

        D, E, F = D_new, E_new, F_new

    # root: one block + border
    root = jnp.zeros((d + b, d + b), D.dtype)
    root = root.at[:d, :d].set(D[0])
    root = root.at[:d, d:].set(F[0])
    root = root.at[d:, :d].set(F[0].T)
    root = root.at[d:, d:].set(Kbb)
    root_inv = block_inv(root)
    return levels, root_inv, L


def cr_solve(levels, root_inv, r_nodes, r_border, n_orig):
    """Solve with a cyclic-reduction factorization."""
    d = r_nodes.shape[1]
    b = r_border.shape[0]
    dtype = root_inv.dtype
    r = r_nodes.astype(dtype)
    rb = r_border.astype(dtype)
    n = 1 << max(1, (n_orig - 1).bit_length())
    if n != n_orig:
        r = jnp.concatenate(
            [r, jnp.zeros((n - n_orig, d), dtype)], axis=0)

    # forward rhs reduction
    r_odds = []
    for lev in levels:
        r_even, r_odd = r[0::2], r[1::2]
        r_odd_lo = _shift_down(r_odd)
        r = (r_even - jnp.einsum('jab,jb->ja', lev.A, r_odd_lo)
             - jnp.einsum('jab,jb->ja', lev.B, r_odd))
        rb = rb - jnp.einsum('jbd,jd->b', lev.G, r_odd)
        r_odds.append(r_odd)

    # root solve
    sol = root_inv @ jnp.concatenate([r[0], rb])
    u = sol[:d][None, :]
    beta = sol[d:]

    # back substitution
    for lev, r_odd in zip(reversed(levels), reversed(r_odds)):
        u_even = u
        u_up = _shift_up(u_even)
        u_odd = (jnp.einsum('jab,jb->ja', lev.Dinv, r_odd)
                 - jnp.einsum('jab,jb->ja', lev.DinvE_lo, u_even)
                 - jnp.einsum('jab,jb->ja', lev.DinvE_hiT, u_up))
        if b:
            u_odd = u_odd - lev.DinvF @ beta
        n2 = u_even.shape[0]
        u = jnp.zeros((2 * n2, d), dtype)
        u = u.at[0::2].set(u_even).at[1::2].set(u_odd)

    return u[:n_orig], beta
