"""Node-axis-sharded KKT solve: SPIKE-style substructuring over a mesh.

SURVEY.md P3: for single collocation problems too large for one chip
(N ~ 1e5+ nodes; the reference acknowledges 1M+ node problems,
CHANGELOG.rst:40-41, but can only crawl through them with an O(N) C
loop), the node axis is sharded across devices and the bordered
block-tridiagonal KKT system is solved with the classic
domain-decomposition (SPIKE / substructuring) algorithm:

1. **Local factorization** (perfectly parallel, zero communication):
   each device holds a contiguous slab of L = N/P node blocks and
   factors its local block tridiagonal with the same Schur-recursion
   scan used on a single chip (nlp/kkt.py), solving simultaneously for
   the local right-hand side and for the *coupling spikes* — the
   columns induced by the two inter-slab coupling blocks and by the
   dense border columns.
2. **Reduced interface system**: only the first/last block rows of
   each slab couple across devices.  Their closure is a dense system
   of size (2 P d + b) assembled from per-slab contributions — one
   ``all_gather`` of a few (d, d) blocks per slab plus ``psum`` for
   the border rows — and solved redundantly on every device (P d is
   tiny next to N d).
3. **Local back-substitution** (parallel, zero communication).

Communication volume per solve is O(P d^2 + b d) — independent of N —
riding ICI via one all_gather + one psum; the O(N d^3) factorization
flops are fully distributed.  Iterative refinement wraps the sharded
solve exactly like the single-chip path, with the full-precision
matvec computed under GSPMD (halo exchanges inserted automatically
for the node-shift operations).

Validated against the unsharded solver on an 8-device CPU mesh
(tests/test_spike.py) and exercised by ``dryrun_multichip``
(__graft_entry__.py).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map          # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.smallblock import block_inv

__all__ = ['spike_solve', 'solve_structured_kkt_sharded',
           'SpikeFactorization', 'spike_factor', 'spike_apply']


def _local_factor(D, Eint):
    """Schur-recursion factorization of a local block tridiagonal.

    ``Eint[k]`` couples local nodes k-1 -> k (``Eint[0]`` must be
    zero: the external coupling is handled through the spike columns).
    Returns (S_inv, Melim) as in nlp/kkt.py.
    """
    d = D.shape[1]

    def fwd(S_prev_inv, inp):
        Dk, Ek = inp
        Mk = Ek @ S_prev_inv
        Sk = Dk - Mk @ jnp.swapaxes(Ek, 0, 1)
        Sk_inv = block_inv(Sk)
        return Sk_inv, (Sk_inv, Mk)

    # derive the init from D so it carries the shard_map
    # varying-manual-axes tag (a plain zeros() is 'replicated' and
    # trips scan's carry-type check under shard_map)
    init = D[0] * 0.0
    _, (S_inv, Melim) = jax.lax.scan(fwd, init, (D, Eint))
    return S_inv, Melim


def _local_solve(S_inv, Melim, Eint, R):
    """Solve T X = R for a stack of right-hand sides R (L, d, m)."""
    L, d, _ = S_inv.shape

    def fwd(rt_prev, inp):
        Mk, Rk = inp
        rtk = Rk - Mk @ rt_prev
        return rtk, rtk

    _, rt = jax.lax.scan(fwd, R[0] * 0.0, (Melim, R))

    E_next = jnp.concatenate(
        [Eint[1:], jnp.zeros_like(Eint[:1])], axis=0)

    def bwd(u_next, inp):
        S_inv_k, rt_k, E_np1 = inp
        u_k = S_inv_k @ (rt_k - jnp.swapaxes(E_np1, 0, 1) @ u_next)
        return u_k, u_k

    _, X = jax.lax.scan(bwd, R[0] * 0.0,
                        (S_inv, rt, E_next), reverse=True)
    return X


def _spike_local(D, E, F, Kbb, r, rb, *, axis_name, n_shards):
    """shard_map body: D/E/F/r hold this device's slab."""
    L, d, _ = D.shape
    b = F.shape[2]
    p = jax.lax.axis_index(axis_name)

    # head coupling (to previous slab's last node) and tail coupling
    # (E of the next slab's first node, fetched by ppermute)
    E_head = E[0]
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    E_next0 = jax.lax.ppermute(E[0], axis_name, perm)
    E_next0 = jnp.where(p == n_shards - 1, 0.0, E_next0)
    E_tail_T = jnp.swapaxes(E_next0, 0, 1)

    Eint = E.at[0].set(0.0)
    S_inv, Melim = _local_factor(D, Eint)

    # right-hand sides: [r | e0 (x) E_head | eL (x) E_tail^T | F]
    R = jnp.zeros((L, d, 1 + 2 * d + b), D.dtype)
    R = R.at[:, :, 0].set(r)
    R = R.at[0, :, 1:1 + d].set(E_head)
    R = R.at[L - 1, :, 1 + d:1 + 2 * d].set(E_tail_T)
    if b:
        R = R.at[:, :, 1 + 2 * d:].set(F)
    X = _local_solve(S_inv, Melim, Eint, R)

    Y, V, W, G = (X[:, :, 0], X[:, :, 1:1 + d],
                  X[:, :, 1 + d:1 + 2 * d], X[:, :, 1 + 2 * d:])

    # per-slab reduced contributions
    Ft = jnp.swapaxes(F, 1, 2)                       # (L, b, d)
    FtY = jnp.einsum('kbd,kd->b', Ft, Y)
    FtV = jnp.einsum('kbd,kde->be', Ft, V)
    FtW = jnp.einsum('kbd,kde->be', Ft, W)
    FtG = jnp.einsum('kbd,kde->be', Ft, G)

    # gather boundary rows of the spikes from every slab
    gath = partial(jax.lax.all_gather, axis_name=axis_name)
    Y0g, YLg = gath(Y[0]), gath(Y[L - 1])            # (P, d)
    V0g, VLg = gath(V[0]), gath(V[L - 1])            # (P, d, d)
    W0g, WLg = gath(W[0]), gath(W[L - 1])
    FtVg, FtWg = gath(FtV), gath(FtW)                # (P, b, d)
    FtY_sum = jax.lax.psum(FtY, axis_name)
    FtG_sum = jax.lax.psum(FtG, axis_name)

    # reduced interface system over [u_first_p, u_last_p]_p + beta
    nP = n_shards
    size = 2 * nP * d + b
    A = jnp.eye(size, dtype=D.dtype)
    rhs = jnp.zeros((size,), D.dtype)

    def fi(q):
        return q * 2 * d            # offset of u_first_q

    def li(q):
        return q * 2 * d + d        # offset of u_last_q

    bo = 2 * nP * d
    for q in range(nP):
        rhs = rhs.at[fi(q):fi(q) + d].set(Y0g[q])
        rhs = rhs.at[li(q):li(q) + d].set(YLg[q])
        if q > 0:
            A = A.at[fi(q):fi(q) + d, li(q - 1):li(q - 1) + d].add(
                V0g[q])
            A = A.at[li(q):li(q) + d, li(q - 1):li(q - 1) + d].add(
                VLg[q])
        if q < nP - 1:
            A = A.at[fi(q):fi(q) + d, fi(q + 1):fi(q + 1) + d].add(
                W0g[q])
            A = A.at[li(q):li(q) + d, fi(q + 1):fi(q + 1) + d].add(
                WLg[q])
    if b:
        G0g, GLg = gath(G[0]), gath(G[L - 1])        # (P, d, b)
        for q in range(nP):
            A = A.at[fi(q):fi(q) + d, bo:].add(G0g[q])
            A = A.at[li(q):li(q) + d, bo:].add(GLg[q])
            if q > 0:
                A = A.at[bo:, li(q - 1):li(q - 1) + d].add(-FtVg[q])
            if q < nP - 1:
                A = A.at[bo:, fi(q + 1):fi(q + 1) + d].add(-FtWg[q])
        A = A.at[bo:, bo:].set(Kbb - FtG_sum)
        rhs = rhs.at[bo:].set(rb - FtY_sum)
    sol = block_inv(A) @ rhs
    beta = sol[bo:]

    u_prev_last = jnp.where(
        p > 0,
        jnp.take(sol[:bo].reshape(2 * nP, d),
                 2 * jnp.maximum(p - 1, 0) + 1, axis=0),
        jnp.zeros((d,), D.dtype))
    u_next_first = jnp.where(
        p < nP - 1,
        jnp.take(sol[:bo].reshape(2 * nP, d),
                 2 * jnp.minimum(p + 1, nP - 1), axis=0),
        jnp.zeros((d,), D.dtype))

    u = Y - V @ u_prev_last - W @ u_next_first
    if b:
        u = u - G @ beta
    return u, beta


class SpikeFactorization(NamedTuple):
    """RHS-independent part of the SPIKE solve, reusable across
    iterative-refinement rounds and SOC re-solves (the same contract
    as nlp.kkt.KKTFactorization, distributed over the node axis).

    Node-sharded fields have leading axis N; ``A_inv`` (the inverse of
    the reduced interface system) is replicated."""
    S_inv: jnp.ndarray    # (N, d, d) local Schur pivots
    Melim: jnp.ndarray    # (N, d, d) local elimination multipliers
    Eint: jnp.ndarray     # (N, d, d) intra-slab sub-diagonal blocks
    V: jnp.ndarray        # (N, d, d) spike toward prev slab's last node
    W: jnp.ndarray        # (N, d, d) spike toward next slab's first node
    G: jnp.ndarray        # (N, d, b) border spikes
    F: jnp.ndarray        # (N, d, b) border columns (for F^T Y psum)
    A_inv: jnp.ndarray    # (2 P d + b, ...) replicated interface inverse


def _interface_offsets(nP, d):
    def fi(q):
        return q * 2 * d            # offset of u_first_q

    def li(q):
        return q * 2 * d + d        # offset of u_last_q

    return fi, li, 2 * nP * d


def _spike_factor_local(D, E, F, Kbb, *, axis_name, n_shards):
    """shard_map body: local factorization + spikes + the replicated
    interface inverse.  Zero communication except the boundary-row
    gathers of the spikes."""
    L, d, _ = D.shape
    b = F.shape[2]

    E_head = E[0]
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    E_next0 = jax.lax.ppermute(E[0], axis_name, perm)
    p = jax.lax.axis_index(axis_name)
    E_next0 = jnp.where(p == n_shards - 1, 0.0, E_next0)
    E_tail_T = jnp.swapaxes(E_next0, 0, 1)

    Eint = E.at[0].set(0.0)
    S_inv, Melim = _local_factor(D, Eint)

    R = jnp.zeros((L, d, 2 * d + b), D.dtype)
    R = R.at[0, :, :d].set(E_head)
    R = R.at[L - 1, :, d:2 * d].set(E_tail_T)
    if b:
        R = R.at[:, :, 2 * d:].set(F)
    X = _local_solve(S_inv, Melim, Eint, R)
    V, W, G = X[:, :, :d], X[:, :, d:2 * d], X[:, :, 2 * d:]

    Ft = jnp.swapaxes(F, 1, 2)                       # (L, b, d)
    FtV = jnp.einsum('kbd,kde->be', Ft, V)
    FtW = jnp.einsum('kbd,kde->be', Ft, W)
    FtG = jnp.einsum('kbd,kde->be', Ft, G)

    gath = partial(jax.lax.all_gather, axis_name=axis_name)
    V0g, VLg = gath(V[0]), gath(V[L - 1])            # (P, d, d)
    W0g, WLg = gath(W[0]), gath(W[L - 1])
    FtVg, FtWg = gath(FtV), gath(FtW)                # (P, b, d)
    FtG_sum = jax.lax.psum(FtG, axis_name)

    nP = n_shards
    fi, li, bo = _interface_offsets(nP, d)
    A = jnp.eye(bo + b, dtype=D.dtype)
    for q in range(nP):
        if q > 0:
            A = A.at[fi(q):fi(q) + d, li(q - 1):li(q - 1) + d].add(
                V0g[q])
            A = A.at[li(q):li(q) + d, li(q - 1):li(q - 1) + d].add(
                VLg[q])
        if q < nP - 1:
            A = A.at[fi(q):fi(q) + d, fi(q + 1):fi(q + 1) + d].add(
                W0g[q])
            A = A.at[li(q):li(q) + d, fi(q + 1):fi(q + 1) + d].add(
                WLg[q])
    if b:
        G0g, GLg = gath(G[0]), gath(G[L - 1])        # (P, d, b)
        for q in range(nP):
            A = A.at[fi(q):fi(q) + d, bo:].add(G0g[q])
            A = A.at[li(q):li(q) + d, bo:].add(GLg[q])
            if q > 0:
                A = A.at[bo:, li(q - 1):li(q - 1) + d].add(-FtVg[q])
            if q < nP - 1:
                A = A.at[bo:, fi(q + 1):fi(q + 1) + d].add(-FtWg[q])
        A = A.at[bo:, bo:].set(Kbb - FtG_sum)
    A_inv = block_inv(A)
    return S_inv, Melim, Eint, V, W, G, A_inv


def _spike_apply_local(S_inv, Melim, Eint, V, W, G, F, A_inv, r, rb, *,
                       axis_name, n_shards):
    """shard_map body: solve with a precomputed SPIKE factorization.
    One local triangular solve + one all_gather of the boundary rows
    + the replicated interface apply + local correction."""
    L, d, _ = S_inv.shape
    b = F.shape[2]
    p = jax.lax.axis_index(axis_name)

    Y = _local_solve(S_inv, Melim, Eint, r[:, :, None])[:, :, 0]

    gath = partial(jax.lax.all_gather, axis_name=axis_name)
    Y0g, YLg = gath(Y[0]), gath(Y[L - 1])            # (P, d)

    nP = n_shards
    fi, li, bo = _interface_offsets(nP, d)
    rhs = jnp.zeros((bo + b,), S_inv.dtype)
    for q in range(nP):
        rhs = rhs.at[fi(q):fi(q) + d].set(Y0g[q])
        rhs = rhs.at[li(q):li(q) + d].set(YLg[q])
    if b:
        Ft = jnp.swapaxes(F, 1, 2)
        FtY_sum = jax.lax.psum(jnp.einsum('kbd,kd->b', Ft, Y),
                               axis_name)
        rhs = rhs.at[bo:].set(rb - FtY_sum)
    sol = A_inv @ rhs
    beta = sol[bo:]

    u_prev_last = jnp.where(
        p > 0,
        jnp.take(sol[:bo].reshape(2 * nP, d),
                 2 * jnp.maximum(p - 1, 0) + 1, axis=0),
        jnp.zeros((d,), S_inv.dtype))
    u_next_first = jnp.where(
        p < nP - 1,
        jnp.take(sol[:bo].reshape(2 * nP, d),
                 2 * jnp.minimum(p + 1, nP - 1), axis=0),
        jnp.zeros((d,), S_inv.dtype))

    u = Y - V @ u_prev_last - W @ u_next_first
    if b:
        u = u - G @ beta
    return u, beta


def spike_factor(D, E, F, Kbb, mesh, axis_name='node'):
    """Distributed RHS-independent factorization (see
    :class:`SpikeFactorization`).  Input layout as in
    :func:`spike_solve`."""
    n_shards = mesh.shape[axis_name]
    sh = P(axis_name)
    rep = P()
    fn = shard_map(
        partial(_spike_factor_local, axis_name=axis_name,
                n_shards=n_shards),
        mesh=mesh, in_specs=(sh, sh, sh, rep),
        out_specs=(sh, sh, sh, sh, sh, sh, rep), check_vma=False)
    S_inv, Melim, Eint, V, W, G, A_inv = fn(D, E, F, Kbb)
    return SpikeFactorization(S_inv, Melim, Eint, V, W, G, F, A_inv)


def spike_apply(fac: SpikeFactorization, r, rb, mesh, axis_name='node'):
    """Solve with a :class:`SpikeFactorization`: r (N, d) node-sharded,
    rb (b,) replicated -> (u (N, d) sharded, beta (b,) replicated)."""
    n_shards = mesh.shape[axis_name]
    sh = P(axis_name)
    rep = P()
    fn = shard_map(
        partial(_spike_apply_local, axis_name=axis_name,
                n_shards=n_shards),
        mesh=mesh,
        in_specs=(sh, sh, sh, sh, sh, sh, sh, rep, sh, rep),
        out_specs=(sh, rep), check_vma=False)
    return fn(fac.S_inv, fac.Melim, fac.Eint, fac.V, fac.W, fac.G,
              fac.F, fac.A_inv, r, rb)


def spike_solve(D, E, F, Kbb, r, rb, mesh, axis_name='node'):
    """Distributed solve of the bordered block-tridiagonal system.

    ``D (N,d,d)``, ``E (N,d,d)`` (E[0] = 0) , ``F (N,d,b)``,
    ``Kbb (b,b)``, ``r (N,d)``, ``rb (b,)``; the leading N axis is
    sharded over ``mesh[axis_name]``; Kbb/rb are replicated.  Returns
    (u (N, d) sharded, beta (b,) replicated).
    """
    n_shards = mesh.shape[axis_name]
    sh = P(axis_name)
    rep = P()
    # check_vma=False: beta really is replicated (it is computed from
    # all_gather/psum results only), but the varying-manual-axes
    # checker cannot prove that through block_inv's pivoting ops.
    fn = shard_map(
        partial(_spike_local, axis_name=axis_name, n_shards=n_shards),
        mesh=mesh,
        in_specs=(sh, sh, sh, rep, sh, rep),
        out_specs=(sh, rep), check_vma=False)
    return fn(D, E, F, Kbb, r, rb)


def solve_structured_kkt_sharded(blocks, r_nodes, r_border, mesh,
                                 axis_name='node', factor_dtype=None,
                                 refine_steps=1):
    """Node-sharded analog of nlp.kkt.solve_structured_kkt: same
    equilibration and mixed-precision iterative-refinement contract,
    with the factorization+solve distributed via :func:`spike_solve`
    and the refinement matvec running under GSPMD."""
    from ..nlp.kkt import _assemble_node_blocks, _equilibrate, kkt_matvec

    work_dtype = blocks.Hd.dtype
    D, E, F, Kbb = _assemble_node_blocks(blocks)
    D, E, F, Kbb, sn, sb = _equilibrate(D, E, F, Kbb)
    if factor_dtype is not None:
        D = D.astype(factor_dtype)
        E = E.astype(factor_dtype)
        F = F.astype(factor_dtype)
        Kbb = Kbb.astype(factor_dtype)

    fac = spike_factor(D, E, F, Kbb, mesh, axis_name)

    def one_solve(rn, rbdr):
        u, beta = spike_apply(fac, (rn * sn).astype(D.dtype),
                              (rbdr * sb).astype(D.dtype),
                              mesh, axis_name)
        return (u * sn).astype(work_dtype), \
            (beta * sb).astype(work_dtype)

    u, beta = one_solve(r_nodes, r_border)
    for _ in range(refine_steps):
        Ku, Kb = kkt_matvec(blocks, u, beta)
        du, dbeta = one_solve(r_nodes - Ku, r_border - Kb)
        u = u + du
        beta = beta + dbeta
    return u, beta
