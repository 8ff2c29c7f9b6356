"""Structured KKT solves for collocation NLPs.

The collocation constraint stencil couples only adjacent nodes
(reference discretization: opty/direct_collocation.py:2143-2156), so in
a node-major variable ordering the primal-dual KKT matrix is symmetric
block-tridiagonal with a small dense border ("arrow") formed by the
unknown parameters, the free time interval ``h`` (dense columns,
opty/direct_collocation.py:2659-2663) and the instance-constraint rows
(endpoint couplings, opty/direct_collocation.py:2243-2251).

This module factors that structure directly:

  * block-tridiagonal forward elimination (a Schur-complement recursion
    over nodes, expressed as ``lax.scan`` so it batches under ``vmap``
    and compiles to one fused XLA loop), accumulating the border Schur
    complement on the fly;
  * a small dense border solve;
  * block back-substitution (reverse ``lax.scan``).

Cost is O(N * d^3) with d = (states + unknown inputs + eoms) per node —
the direct analog of what Ipopt's general sparse LU (MUMPS) discovers
numerically, but with zero symbolic-analysis overhead, fully batchable
across problem instances via ``vmap``, and with dense per-node blocks.

Precision: block inversions use a pure-jnp pivoted elimination
(ops/smallblock.py) that runs in emulated float64 on TPU (backend
LAPACK custom calls are f32-only there and numerically weak), so the
default factorization is full precision everywhere.  A float32
``factor_dtype`` remains available as a speed option; symmetric Jacobi
equilibration plus extra float64 iterative-refinement rounds then
recover Ipopt-level tolerances.  Factorizations are computed once and
reused by every refinement solve.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.smallblock import block_inv

__all__ = ['KKTBlocks', 'KKTFactorization', 'factor_kkt', 'solve_factored',
           'solve_structured_kkt', 'kkt_matvec']


class KKTBlocks(NamedTuple):
    """Blocks of the symmetric collocation KKT matrix.

    Node-major layout with N nodes; per node the variable block is
    ``u_k = [dz_k (nz); dy_k (M)]`` where ``z_k`` stacks the states and
    unknown inputs at node k and ``y_k`` are the multipliers of the
    constraint block that couples nodes k-1 and k (the k = 0 block is a
    structural dummy: P[0] = Q[0] = C[0] = 0, Ds[0] = 1).

    Border variables are ``beta = [dw (bw); dy_inst (o)]`` with ``w``
    the unknown parameters plus the free time interval.
    """
    Hd: jnp.ndarray    # (N, nz, nz) diagonal Hessian blocks (incl. Sigma_x)
    Ho: jnp.ndarray    # (N, nz, nz) block (k-1, k); Ho[0] unused
    Hw: jnp.ndarray    # (N, nz, bw) Hessian cross blocks with border w
    Hww: jnp.ndarray   # (bw, bw) border Hessian (incl. Sigma_w)
    P: jnp.ndarray     # (N, M, nz) d c_k / d z_k
    Q: jnp.ndarray     # (N, M, nz) d c_k / d z_{k-1}
    C: jnp.ndarray     # (N, M, bw) d c_k / d w
    Ds: jnp.ndarray    # (N, M) slack diagonal of constraint rows (>= 0)
    Gz: jnp.ndarray    # (o, N, nz) instance-constraint rows wrt z
    Gw: jnp.ndarray    # (o, bw) instance-constraint rows wrt w
    Di: jnp.ndarray    # (o,) slack diagonal of instance rows


class KKTFactorization(NamedTuple):
    S_inv: jnp.ndarray      # (N, d, d) inverses of the Schur pivots
    Melim: jnp.ndarray      # (N, d, d) elimination multipliers E_k S_{k-1}^-1
    Ft: jnp.ndarray         # (N, d, b) eliminated border columns
    E: jnp.ndarray          # (N, d, d) original sub-diagonal blocks
    Kbb_schur_inv: jnp.ndarray  # (b, b) inverse of the border Schur complement
    scale_nodes: jnp.ndarray    # (N, d) Jacobi equilibration scales
    scale_border: jnp.ndarray   # (b,)


def _assemble_node_blocks(blocks: KKTBlocks):
    """Returns (D (N,d,d), E (N,d,d), F (N,d,b)) and the border matrix."""
    N, nz, _ = blocks.Hd.shape
    M = blocks.P.shape[1]
    bw = blocks.Hw.shape[2]
    o = blocks.Gz.shape[0]
    d = nz + M

    D = jnp.zeros((N, d, d), dtype=blocks.Hd.dtype)
    D = D.at[:, :nz, :nz].set(blocks.Hd)
    D = D.at[:, :nz, nz:].set(jnp.swapaxes(blocks.P, 1, 2))
    D = D.at[:, nz:, :nz].set(blocks.P)
    D = D.at[:, nz:, nz:].set(jax.vmap(jnp.diag)(-blocks.Ds))

    E = jnp.zeros((N, d, d), dtype=blocks.Hd.dtype)
    E = E.at[:, :nz, :nz].set(jnp.swapaxes(blocks.Ho, 1, 2))
    E = E.at[:, nz:, :nz].set(blocks.Q)
    E = E.at[0].set(0.0)

    F = jnp.zeros((N, d, bw + o), dtype=blocks.Hd.dtype)
    F = F.at[:, :nz, :bw].set(blocks.Hw)
    if o:
        F = F.at[:, :nz, bw:].set(jnp.moveaxis(blocks.Gz, 0, 2))
    F = F.at[:, nz:, :bw].set(blocks.C)

    Kbb = jnp.zeros((bw + o, bw + o), dtype=blocks.Hd.dtype)
    Kbb = Kbb.at[:bw, :bw].set(blocks.Hww)
    if o:
        Kbb = Kbb.at[:bw, bw:].set(blocks.Gw.T)
        Kbb = Kbb.at[bw:, :bw].set(blocks.Gw)
        Kbb = Kbb.at[bw:, bw:].set(-jnp.diag(blocks.Di))
    return D, E, F, Kbb


def _equilibrate(D, E, F, Kbb):
    """Symmetric Jacobi scaling of the assembled KKT blocks.

    The IPM diagonal spans many orders of magnitude (barrier terms
    Sigma ~ mu/d^2 near active bounds), which destroys a float32
    factorization long before the f64 operator degrades.  Scaling by
    s_i = 1/sqrt(|K_ii|) compresses the dynamic range so the f32
    factorization plus f64 iterative refinement stays accurate at
    Ipopt-level tolerances — the same role dynamic scaling plays
    inside Ipopt's sparse solvers.
    """
    diag_nodes = jnp.abs(jax.vmap(jnp.diag)(D))              # (N, d)
    diag_border = jnp.abs(jnp.diagonal(Kbb))                 # (b,)
    big = jnp.maximum(jnp.max(diag_nodes), 1.0)
    floor = 1e-12 * big

    def inv_sqrt(v):
        return 1.0 / jnp.sqrt(jnp.maximum(v, floor))

    sn = inv_sqrt(diag_nodes)
    sb = inv_sqrt(diag_border) if diag_border.size else diag_border
    D = D * sn[:, :, None] * sn[:, None, :]
    sn_prev = jnp.concatenate([sn[:1], sn[:-1]], axis=0)
    E = E * sn[:, :, None] * sn_prev[:, None, :]
    F = F * sn[:, :, None] * sb[None, None, :]
    Kbb = Kbb * sb[:, None] * sb[None, :]
    return D, E, F, Kbb, sn, sb


def _assemble_node_blocks_nl(blocks: KKTBlocks):
    """Lane-major assembly: returns D (d, d, N), E (d, d, N),
    F (d, b, N) and the border matrix Kbb (b, b).

    The node axis sits on the TPU lane dimension (ops/lanes.py): the
    natural (N, d, d) layout tiles the trailing (d, d) to (8, 128),
    a ~40x physical blow-up for d ~ 5 that made every factorization
    pass ~99% padding traffic.
    """
    from ..ops.lanes import to_lanes, transpose_nl
    N, nz, _ = blocks.Hd.shape
    M = blocks.P.shape[1]
    bw = blocks.Hw.shape[2]
    o = blocks.Gz.shape[0]
    d = nz + M
    dt = blocks.Hd.dtype

    PT = to_lanes(blocks.P)                         # (M, nz, N)
    D = jnp.zeros((d, d, N), dt)
    D = D.at[:nz, :nz, :].set(to_lanes(blocks.Hd))
    D = D.at[:nz, nz:, :].set(transpose_nl(PT))
    D = D.at[nz:, :nz, :].set(PT)
    eyeM = jnp.eye(M, dtype=dt)[:, :, None]
    D = D.at[nz:, nz:, :].set(-eyeM * blocks.Ds.T[:, None, :])

    E = jnp.zeros((d, d, N), dt)
    E = E.at[:nz, :nz, :].set(transpose_nl(to_lanes(blocks.Ho)))
    E = E.at[nz:, :nz, :].set(to_lanes(blocks.Q))
    E = jnp.where(jnp.arange(N) > 0, E, 0.0)

    F = jnp.zeros((d, bw + o, N), dt)
    F = F.at[:nz, :bw, :].set(to_lanes(blocks.Hw))
    if o:
        F = F.at[:nz, bw:, :].set(jnp.transpose(blocks.Gz, (2, 0, 1)))
    F = F.at[nz:, :bw, :].set(to_lanes(blocks.C))

    Kbb = jnp.zeros((bw + o, bw + o), dt)
    Kbb = Kbb.at[:bw, :bw].set(blocks.Hww)
    if o:
        Kbb = Kbb.at[:bw, bw:].set(blocks.Gw.T)
        Kbb = Kbb.at[bw:, :bw].set(blocks.Gw)
        Kbb = Kbb.at[bw:, bw:].set(-jnp.diag(blocks.Di))
    return D, E, F, Kbb


def _equilibrate_nl(D, E, F, Kbb):
    """Symmetric Jacobi scaling, lane-major layout (see _equilibrate).
    Scales are sn (d, N) and sb (b,)."""
    d = D.shape[-3]
    diag_nodes = jnp.abs(jnp.stack([D[..., i, i, :] for i in range(d)],
                                   axis=-2))                   # (d, N)
    diag_border = jnp.abs(jnp.diagonal(Kbb, axis1=-2, axis2=-1))
    big = jnp.maximum(jnp.max(diag_nodes), 1.0)
    floor = 1e-12 * big

    def inv_sqrt(v):
        return 1.0 / jnp.sqrt(jnp.maximum(v, floor))

    sn = inv_sqrt(diag_nodes)
    sb = inv_sqrt(diag_border) if diag_border.size else diag_border
    D = D * sn[..., :, None, :] * sn[..., None, :, :]
    sn_prev = jnp.concatenate([sn[..., :1], sn[..., :-1]], axis=-1)
    E = E * sn[..., :, None, :] * sn_prev[..., None, :, :]
    F = F * sn[..., :, None, :] * sb[..., None, :, None]
    Kbb = Kbb * sb[..., :, None] * sb[..., None, :]
    return D, E, F, Kbb, sn, sb


def _cast_blocks(blocks: KKTBlocks, factor_dtype):
    """Cast the block fields to the factorization dtype BEFORE
    assembly/equilibration: on TPU the working dtype is emulated
    float64 (float-float pairs), so running the O(N d^2) assembly +
    scaling passes emulated doubles their memory traffic for rounding
    the downstream f32 factorization would lose anyway.  Iterative
    refinement against the full-precision operator (the uncast
    ``blocks``) recovers f64 accuracy as before."""
    if factor_dtype is None or blocks.Hd.dtype == jnp.dtype(factor_dtype):
        return blocks
    return jax.tree.map(lambda a: a.astype(factor_dtype), blocks)


def factor_kkt(blocks: KKTBlocks, factor_dtype=None) -> KKTFactorization:
    """Block-tridiagonal forward elimination with border Schur
    accumulation.  RHS-independent; reuse across refinement solves."""
    blocks = _cast_blocks(blocks, factor_dtype)
    D, E, F, Kbb = _assemble_node_blocks(blocks)
    D, E, F, Kbb, sn, sb = _equilibrate(D, E, F, Kbb)
    N, d, _ = D.shape
    b = F.shape[2]
    eye = jnp.eye(d, dtype=D.dtype)

    def fwd(carry, inp):
        S_prev_inv, Ft_prev = carry
        Dk, Ek, Fk = inp
        Mk = Ek @ S_prev_inv
        Sk = Dk - Mk @ jnp.swapaxes(Ek, 0, 1)
        Sk_inv = block_inv(Sk)
        Ftk = Fk - Mk @ Ft_prev
        dKbb = -jnp.swapaxes(Ftk, 0, 1) @ (Sk_inv @ Ftk)
        return (Sk_inv, Ftk), (Sk_inv, Mk, Ftk, dKbb)

    init = (jnp.zeros((d, d), D.dtype), jnp.zeros((d, b), D.dtype))
    _, (S_inv, Melim, Ft, dKbb) = jax.lax.scan(fwd, init, (D, E, F))

    if b:
        Kbb_schur = Kbb + jnp.sum(dKbb, axis=0)
        Kbb_schur_inv = block_inv(Kbb_schur)
    else:
        Kbb_schur_inv = jnp.zeros((0, 0), D.dtype)
    return KKTFactorization(S_inv, Melim, Ft, E, Kbb_schur_inv, sn, sb)


def solve_factored(fac: KKTFactorization, r_nodes, r_border):
    """Solve with a precomputed factorization.  r_nodes (N, d).

    The rhs/solution are transformed through the equilibration scales
    (K = S^-1 K~ S^-1  =>  u = S K~^-1 S r)."""
    N, d, _ = fac.S_inv.shape
    b = fac.Ft.shape[2]
    dtype = fac.S_inv.dtype
    r_nodes = (r_nodes * fac.scale_nodes).astype(dtype)
    r_border = (r_border * fac.scale_border).astype(dtype)

    def fwd(rt_prev, inp):
        Mk, S_inv_k, Ftk, rk = inp
        rtk = rk - Mk @ rt_prev
        drb = -Ftk.T @ (S_inv_k @ rtk)
        return rtk, (rtk, drb)

    _, (rt, drb) = jax.lax.scan(
        fwd, jnp.zeros((d,), dtype),
        (fac.Melim, fac.S_inv, fac.Ft, r_nodes))

    if b:
        beta = fac.Kbb_schur_inv @ (r_border + jnp.sum(drb, axis=0))
    else:
        beta = jnp.zeros((0,), dtype)

    E_next = jnp.concatenate([fac.E[1:], jnp.zeros((1, d, d), dtype)], axis=0)

    def bwd(u_next, inp):
        S_inv_k, Ft_k, rt_k, E_np1 = inp
        rhs = rt_k - jnp.swapaxes(E_np1, 0, 1) @ u_next
        if b:
            rhs = rhs - Ft_k @ beta
        u_k = S_inv_k @ rhs
        return u_k, u_k

    _, u = jax.lax.scan(bwd, jnp.zeros((d,), dtype),
                        (fac.S_inv, fac.Ft, rt, E_next), reverse=True)
    return u * fac.scale_nodes, beta * fac.scale_border


def kkt_matvec(blocks: KKTBlocks, u, beta):
    """Apply the full KKT operator: returns (K @ [u; beta]) split as
    (node part (N, d), border part (b,)).  Used for iterative
    refinement and for verifying solves against the explicit matrix."""
    N, nz, _ = blocks.Hd.shape
    M = blocks.P.shape[1]
    bw = blocks.Hw.shape[2]
    o = blocks.Gz.shape[0]
    z = u[:, :nz]
    y = u[:, nz:]
    w = beta[:bw]
    yi = beta[bw:]

    zero_z = jnp.zeros((1, nz), u.dtype)
    z_prev = jnp.concatenate([zero_z, z[:-1]], axis=0)
    z_next = jnp.concatenate([z[1:], zero_z], axis=0)
    zero_y = jnp.zeros((1, M), u.dtype)
    y_next = jnp.concatenate([y[1:], zero_y], axis=0)

    # z rows: Hd_k z_k + Ho_k^T z_{k-1} + Ho_{k+1} z_{k+1} + Hw_k w
    #         + P_k^T y_k + Q_{k+1}^T y_{k+1} + Gz_k^T yi
    Ho_next = jnp.concatenate([blocks.Ho[1:],
                               jnp.zeros((1, nz, nz), u.dtype)], axis=0)
    Q_next = jnp.concatenate([blocks.Q[1:],
                              jnp.zeros((1, M, nz), u.dtype)], axis=0)
    rz = (jnp.einsum('kij,kj->ki', blocks.Hd, z)
          + jnp.einsum('kji,kj->ki', blocks.Ho, z_prev)
          + jnp.einsum('kij,kj->ki', Ho_next, z_next)
          + jnp.einsum('kij,j->ki', blocks.Hw, w)
          + jnp.einsum('kji,kj->ki', blocks.P, y)
          + jnp.einsum('kji,kj->ki', Q_next, y_next))
    if o:
        rz = rz + jnp.einsum('oki,o->ki', blocks.Gz, yi)

    # y rows: P_k z_k + Q_k z_{k-1} + C_k w - Ds_k y_k
    ry = (jnp.einsum('kij,kj->ki', blocks.P, z)
          + jnp.einsum('kij,kj->ki', blocks.Q, z_prev)
          + jnp.einsum('kij,j->ki', blocks.C, w)
          - blocks.Ds * y)

    # w rows: sum_k Hw_k^T z_k + Hww w + sum_k C_k^T y_k + Gw^T yi
    rw = (jnp.einsum('kij,ki->j', blocks.Hw, z)
          + blocks.Hww @ w
          + jnp.einsum('kij,ki->j', blocks.C, y))
    if o:
        rw = rw + blocks.Gw.T @ yi

    # instance rows: sum_k Gz z_k + Gw w - Di yi
    if o:
        ri = (jnp.einsum('oki,ki->o', blocks.Gz, z) + blocks.Gw @ w
              - blocks.Di * yi)
    else:
        ri = jnp.zeros((0,), u.dtype)

    node = jnp.concatenate([rz, ry], axis=1)
    border = jnp.concatenate([rw, ri])
    return node, border


class CRFactorization(NamedTuple):
    """PCR factorization + equilibration scales + the FULL-PRECISION
    assembled lane-major operator (D, E, F, Kbb), kept so iterative
    refinement applies the exact KKT operator without ever touching
    the padded (N, d, d) layout (the N-major matvec einsums were a
    per-refinement-round padding tax)."""
    fac: Any
    sn: jnp.ndarray
    sb: jnp.ndarray
    D: jnp.ndarray       # (d, d, N) full precision
    E: jnp.ndarray       # (d, d, N), E[..., 0] = 0
    F: jnp.ndarray       # (d, b, N)
    Kbb: jnp.ndarray     # (b, b)


def factor_kkt_cr(blocks: KKTBlocks, factor_dtype=None):
    """Parallel-cyclic-reduction factorization (log-depth;
    TPU-friendly: every level is a fixed-shape lane-major block op, so
    the compiled program stays small and pays no layout padding).

    Assembly happens ONCE in full precision (placement only — exact);
    the factorization input is the cast copy, and the full-precision
    lane-major operator rides in the returned factorization for the
    refinement matvecs.  See ops/tridiag.py for the algorithm and
    ops/lanes.py for the layout.
    """
    from ..ops.tridiag import pcr_factor
    D, E, F, Kbb = _assemble_node_blocks_nl(blocks)
    if factor_dtype is not None and \
            jnp.dtype(factor_dtype) != D.dtype:
        Dc, Ec, Fc, Kbbc = (D.astype(factor_dtype),
                            E.astype(factor_dtype),
                            F.astype(factor_dtype),
                            Kbb.astype(factor_dtype))
    else:
        Dc, Ec, Fc, Kbbc = D, E, F, Kbb
    Dc, Ec, Fc, Kbbc, sn, sb = _equilibrate_nl(Dc, Ec, Fc, Kbbc)
    fac = pcr_factor(Dc, Ec, Fc, Kbbc)
    return CRFactorization(fac, sn, sb, D, E, F, Kbb)


def matvec_assembled_nl(cf: CRFactorization, u, beta):
    """Apply the full-precision KKT operator in lane-major layout:
    u (d, N), beta (b,) -> (K @ [u; beta]) split the same way."""
    from ..ops.lanes import matvec_nl, transpose_nl
    from ..ops.tridiag import _down, _up
    node = (matvec_nl(cf.D, u)
            + matvec_nl(cf.E, _down(u, 1))
            + matvec_nl(transpose_nl(_up(cf.E, 1)), _up(u, 1)))
    b = cf.F.shape[-2]
    if b:
        node = node + jnp.sum(cf.F * beta[..., None, :, None], axis=-2)
        border = (jnp.einsum('...dbn,...dn->...b', cf.F, u)
                  + jnp.einsum('...be,...e->...b', cf.Kbb, beta))
    else:
        border = jnp.zeros(u.shape[:-2] + (0,), u.dtype)
    return node, border


def solve_factored_cr(cf: CRFactorization, r_nodes, r_border):
    """Solve with a PCR factorization.  Interface matches
    ``solve_factored``: r_nodes (N, d) — transposed to the lane-major
    (d, N) layout internally."""
    u, beta = solve_factored_cr_nl(
        cf, jnp.swapaxes(r_nodes, -1, -2), r_border)
    return jnp.swapaxes(u, -1, -2), beta


def solve_factored_cr_nl(cf: CRFactorization, r_nl, r_border):
    """Lane-major solve: r_nl (d, N) -> u (d, N)."""
    from ..ops.tridiag import pcr_solve
    u, beta = pcr_solve(cf.fac, r_nl * cf.sn, r_border * cf.sb)
    return u * cf.sn, beta * cf.sb


def solve_structured_kkt(blocks: KKTBlocks, r_nodes, r_border,
                         factor_dtype=None, refine_steps=1,
                         method='scan'):
    """Solve K [u; beta] = [r_nodes; r_border].

    The factorization runs once in ``factor_dtype`` (float32 on TPU
    where f64 LU does not lower); ``refine_steps`` rounds of iterative
    refinement with the full-precision operator recover accuracy.
    ``method``: 'scan' (sequential block LU, lowest flops) or 'cr'
    (cyclic reduction, log-depth — preferred on TPU).
    """
    work_dtype = blocks.Hd.dtype
    if method == 'cr':
        # fully lane-major: solve AND refinement matvecs (the
        # full-precision operator rides in the factorization)
        cf = factor_kkt_cr(blocks, factor_dtype=factor_dtype)
        r_nl = jnp.swapaxes(r_nodes, -1, -2)
        u, beta = solve_factored_cr_nl(cf, r_nl, r_border)
        u = u.astype(work_dtype)
        beta = beta.astype(work_dtype)
        for _ in range(refine_steps):
            Ku, Kb = matvec_assembled_nl(cf, u, beta)
            du, dbeta = solve_factored_cr_nl(cf, r_nl - Ku,
                                             r_border - Kb)
            u = u + du.astype(work_dtype)
            beta = beta + dbeta.astype(work_dtype)
        return jnp.swapaxes(u, -1, -2), beta

    fac = factor_kkt(blocks, factor_dtype=factor_dtype)
    u, beta = solve_factored(fac, r_nodes, r_border)
    u = u.astype(work_dtype)
    beta = beta.astype(work_dtype)
    for _ in range(refine_steps):
        Ku, Kb = kkt_matvec(blocks, u, beta)
        du, dbeta = solve_factored(fac, r_nodes - Ku, r_border - Kb)
        u = u + du.astype(work_dtype)
        beta = beta + dbeta.astype(work_dtype)
    return u, beta
