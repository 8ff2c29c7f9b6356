"""Wires a ConstraintCollocator into the interior-point solver.

Builds the ``IPMFunctions`` whose ``kkt_solve`` exploits the
block-tridiagonal-with-border structure of the collocation KKT system
(see nlp/kkt.py).  The Lagrangian Hessian is assembled exactly:

  * equation-of-motion part: per-interval ``jax.hessian`` blocks
    (ConstraintCollocator.hessian_blocks);
  * objective + instance-constraint part: colored Hessian-vector
    products (transcribe/hessian.py).

Both are exact for the problem class the reference supports, giving
quadratic local convergence where the reference's Ipopt-with-L-BFGS
setup (no Hessian callback, opty/direct_collocation.py C22) is
superlinear at best.

Gradient-based NLP scaling (the analog of Ipopt's default
``nlp_scaling_method=gradient-based`` with ``scaling_max_gradient``
100) is essential for collocation problems: the discretized dynamics
rows carry 1/h factors that otherwise distort the barrier, the filter
and the multiplier magnitudes.  Scaling factors are computed from the
Jacobian at the initial point inside the jitted solve, so one compiled
solver serves any initial guess.
"""

import jax
import jax.numpy as jnp

from ..config import default_factor_dtype, default_kkt_method
from ..transcribe.hessian import make_structured_scalar_hessian
from .ipm import IPMFunctions
from .kkt import (KKTBlocks, factor_kkt, factor_kkt_cr, kkt_matvec,
                  solve_factored)

__all__ = ['make_collocation_nlp_functions', 'compute_scaling']

_MAX_GRADIENT = 100.0


def compute_scaling(col, gradient, x0):
    """Ipopt-style gradient-based scaling factors at ``x0``.

    Returns (sf, dsc_nodes (N-1, M), dsc_inst (o,), dsc_full (m,)).
    Each constraint row j gets  min(1, gmax / ||grad c_j(x0)||_inf);
    the objective gets  min(1, gmax / ||grad f(x0)||_inf).
    """
    A0, B0, C0, G0 = col.jacobian_blocks(x0)
    row_norm = jnp.max(jnp.abs(jnp.concatenate([A0, B0, C0], axis=2)),
                       axis=2)                                # (N-1, M)
    dsc_nodes = jnp.where(row_norm > 1e-12,
                          jnp.minimum(1.0, _MAX_GRADIENT / row_norm), 1.0)
    o = col.num_instance_constraints
    if o:
        gnorm = jnp.max(jnp.abs(G0), axis=1)
        dsc_inst = jnp.where(gnorm > 1e-12,
                             jnp.minimum(1.0, _MAX_GRADIENT / gnorm), 1.0)
    else:
        dsc_inst = jnp.zeros((0,), x0.dtype)
    g0 = gradient(x0)
    gmax = jnp.max(jnp.abs(g0))
    sf = jnp.where(gmax > 1e-12,
                   jnp.minimum(1.0, _MAX_GRADIENT / gmax), 1.0)
    dsc_full = jnp.concatenate([dsc_nodes.T.reshape(-1), dsc_inst])
    return sf, dsc_nodes, dsc_inst, dsc_full


def make_collocation_nlp_functions(col, objective, gradient=None,
                                   factor_dtype=None, refine_steps=None,
                                   scale_from=None, kkt_method=None,
                                   mesh=None, node_axis='node'):
    """IPMFunctions for a collocation problem.

    Parameters
    ----------
    col : ConstraintCollocator
    objective : callable free -> scalar (JAX-traceable)
    gradient : optional callable free -> (nfree,); default jax.grad.
    scale_from : optional initial point for gradient-based scaling
        (may be a traced array inside jit).  When given, the returned
        functions define the *scaled* NLP; the second return value
        carries (sf, dsc_full) for unscaling results.
    kkt_method : 'scan' | 'cr' | 'spike'.  'spike' distributes the
        KKT factorization over the node axis of ``mesh`` (SURVEY.md
        P3: single problems too large for one chip) via the SPIKE
        substructuring solver (parallel/spike.py); requires ``mesh``.
    mesh : jax.sharding.Mesh with a ``node_axis`` axis ('spike' only).
    """
    n = col.num_states
    q = col.num_unknown_input_trajectories
    nz = col._nz
    bw = col._bw
    M = col.num_eom
    N = col.num_collocation_nodes
    o = col.num_instance_constraints
    ni = N - 1
    be = col.integration_method == 'backward euler'
    dtype = col._dtype
    if factor_dtype is None:
        factor_dtype = default_factor_dtype()
    if refine_steps is None:
        # Mixed-precision factorization needs more refinement rounds.
        # Measured (round 4, pendulum N=501 hard-tail block, f32 cr):
        # 3 rounds -> direction quality degrades the whole solve
        # (mean 130 iters, 2/32 failures); 6 rounds recovers
        # f64-factorization iteration counts (mean 46.0 vs 43.1,
        # 32/32) — each round is one f64 matvec, far cheaper than the
        # 3x iteration inflation it prevents.
        refine_steps = 1 if jnp.dtype(factor_dtype) == jnp.dtype(dtype) \
            else 6
    if kkt_method is None:
        kkt_method = default_kkt_method()

    struct_hess = make_structured_scalar_hessian(N, n, q, bw, dtype)
    grad_fn = gradient if gradient is not None else jax.grad(objective)

    if scale_from is not None:
        sf, dsc_nodes, dsc_inst, dsc_full = compute_scaling(
            col, grad_fn, scale_from)
    else:
        sf = jnp.asarray(1.0, dtype)
        dsc_nodes = jnp.ones((ni, M), dtype)
        dsc_inst = jnp.ones((o,), dtype)
        dsc_full = jnp.ones((col.num_constraints,), dtype)

    def split_free(vec):
        """free-layout vector -> (node part (N, nz), border part (bw,))."""
        X = vec[:n * N].reshape(n, N)
        U = vec[n * N:nz * N].reshape(q, N)
        nodes = jnp.concatenate([X.T, U.T], axis=1)
        return nodes, vec[nz * N:]

    def join_free(nodes, border):
        parts = [nodes[:, :n].T.reshape(-1)]
        if q:
            parts.append(nodes[:, n:].T.reshape(-1))
        parts.append(border)
        return jnp.concatenate(parts)

    def split_con(vec):
        """constraint-layout vector -> ((ni, M) eom part, (o,) inst)."""
        eom = vec[:M * ni].reshape(M, ni).T
        return eom, vec[M * ni:]

    def join_con(eom_nodes, inst):
        return jnp.concatenate([eom_nodes.T.reshape(-1), inst])

    def objective_s(free):
        return sf * objective(free)

    def gradient_s(free):
        return sf * grad_fn(free)

    def constraints_s(free):
        res, inst = col.constraints_nodewise(free)
        return join_con(res * dsc_nodes, inst * dsc_inst)

    def split_instance_jac(G):
        if o:
            GX = G[:, :n * N].reshape(o, n, N)
            GU = G[:, n * N:nz * N].reshape(o, q, N)
            Gz = jnp.concatenate([jnp.swapaxes(GX, 1, 2),
                                  jnp.swapaxes(GU, 1, 2)], axis=2)
            Gw = G[:, nz * N:]
        else:
            Gz = jnp.zeros((0, N, nz), dtype)
            Gw = jnp.zeros((0, bw), dtype)
        return Gz, Gw

    def kkt_prepare(x, y):
        """Per-iteration block construction: scaled Jacobian blocks
        plus the exact Lagrangian Hessian blocks at (x, y).  Shared by
        the direction trials, SOC re-solves and restoration."""
        y_nodes, y_inst = split_con(y)

        A, B, C, G = col.jacobian_blocks(x)
        A = A * dsc_nodes[:, :, None]
        B = B * dsc_nodes[:, :, None]
        C = C * dsc_nodes[:, :, None]
        if o:
            G = G * dsc_inst[:, None]

        # Lagrangian Hessian of the scaled constraints: pass
        # row-scaled multipliers into the exact per-node Hessian.
        Hd, Ho, Hw, Hww = col.hessian_blocks(x, y_nodes * dsc_nodes)

        def phi(f):
            val = objective_s(f)
            if o:
                val = val + jnp.dot(y_inst * dsc_inst,
                                    col.eval_instance_constraints(f))
            return val

        Hd2, Ho2, Hw2, Hww2 = struct_hess(phi, x)

        # constraint block k couples z_{k-1}, z_k (k = 1..N-1):
        # backward Euler interval i: cur = i+1 (= k), adj = i (= k-1)
        # midpoint interval i: cur = i (= k-1), adj = i+1 (= k)
        P = jnp.zeros((N, M, nz), dtype).at[1:].set(A if be else B)
        Q = jnp.zeros((N, M, nz), dtype).at[1:].set(B if be else A)
        Cn = jnp.zeros((N, M, bw), dtype).at[1:].set(C)
        Gz, Gw = split_instance_jac(G)

        return dict(Hd=Hd + Hd2, Ho=Ho + Ho2, Hw=Hw + Hw2,
                    Hww=Hww + Hww2, P=P, Q=Q, Cn=Cn, Gz=Gz, Gw=Gw)

    def kkt_prepare_gn(x):
        """Jacobian-only prep for the restoration inner solver
        (steps.restoration_solve): the damped Gauss-Newton feasibility
        iteration never uses the Lagrangian Hessian, so skip the
        per-node Hessian assembly (the most expensive part of
        kkt_prepare) and hand back zero H blocks."""
        A, B, C, G = col.jacobian_blocks(x)
        A = A * dsc_nodes[:, :, None]
        B = B * dsc_nodes[:, :, None]
        C = C * dsc_nodes[:, :, None]
        if o:
            G = G * dsc_inst[:, None]
        P = jnp.zeros((N, M, nz), dtype).at[1:].set(A if be else B)
        Q = jnp.zeros((N, M, nz), dtype).at[1:].set(B if be else A)
        Cn = jnp.zeros((N, M, bw), dtype).at[1:].set(C)
        Gz, Gw = split_instance_jac(G)
        z_nn = jnp.zeros((N, nz, nz), dtype)
        return dict(Hd=z_nn, Ho=z_nn, Hw=jnp.zeros((N, nz, bw), dtype),
                    Hww=jnp.zeros((bw, bw), dtype), P=P, Q=Q, Cn=Cn,
                    Gz=Gz, Gw=Gw)

    def _blocks_with(Hd, Ho, Hw, Hww, prep, ds):
        ds_nodes, ds_inst = split_con(ds)
        Ds = jnp.ones((N, M), dtype).at[1:].set(ds_nodes)
        return KKTBlocks(Hd=Hd, Ho=Ho, Hw=Hw, Hww=Hww, P=prep['P'],
                         Q=prep['Q'], C=prep['Cn'], Ds=Ds,
                         Gz=prep['Gz'], Gw=prep['Gw'], Di=ds_inst)

    def _split_rhs(rx, rc):
        rz, rw = split_free(rx)
        rc_nodes, rc_inst = split_con(rc)
        ry = jnp.zeros((N, M), dtype).at[1:].set(rc_nodes)
        return (jnp.concatenate([rz, ry], axis=1),
                jnp.concatenate([rw, rc_inst]))

    def _join_sol(u, beta):
        return (join_free(u[:, :nz], beta[:bw]),
                join_con(u[1:, nz:], beta[bw:]))

    if kkt_method == 'spike':
        if mesh is None:
            raise ValueError("kkt_method='spike' requires a mesh with "
                             "a '%s' axis" % node_axis)
        from ..parallel.spike import spike_apply, spike_factor
        from .kkt import _assemble_node_blocks, _equilibrate

        def _factor_spike(blocks):
            """Node-sharded SPIKE factorization: same equilibration +
            mixed-precision contract as the single-chip paths, with
            the factorization distributed over ``mesh[node_axis]``."""
            D, E, F, Kbb = _assemble_node_blocks(blocks)
            D, E, F, Kbb, sn, sb = _equilibrate(D, E, F, Kbb)
            if jnp.dtype(factor_dtype) != D.dtype:
                D, E, F, Kbb = (D.astype(factor_dtype),
                                E.astype(factor_dtype),
                                F.astype(factor_dtype),
                                Kbb.astype(factor_dtype))
            return spike_factor(D, E, F, Kbb, mesh, node_axis), sn, sb

        def _spike_solve_one(facsc, rn, rb):
            fac, sn, sb = facsc
            fd = fac.S_inv.dtype
            u, beta = spike_apply(fac, (rn * sn).astype(fd),
                                  (rb * sb).astype(fd), mesh, node_axis)
            return u * sn, beta * sb
    else:
        _factor_spike = _spike_solve_one = None

    def kkt_factor(prep, sigma_x, ds, gn_mask=None):
        """Factor the KKT matrix once for a given regularization; the
        (blocks, factorization) pair is reusable by ``kkt_apply`` for
        any rhs (direction, SOC, refinement).

        ``gn_mask`` (traced per-lane bool) zeroes the Lagrangian
        Hessian blocks, turning the matrix into the damped Gauss-
        Newton feasibility system [[sigma, J^T], [J, -ds]]: the IPM
        merges its restoration-lane solves into the shared per-
        iteration factorization this way (both lax.cond branches run
        under vmap, so a separate feasibility factorization would
        double the factor cost)."""
        sz, sw = split_free(sigma_x)
        Hd, Ho, Hw, Hww = (prep['Hd'], prep['Ho'], prep['Hw'],
                           prep['Hww'])
        if gn_mask is not None:
            Hd = jnp.where(gn_mask, 0.0, Hd)
            Ho = jnp.where(gn_mask, 0.0, Ho)
            Hw = jnp.where(gn_mask, 0.0, Hw)
            Hww = jnp.where(gn_mask, 0.0, Hww)
        Hd = Hd + jax.vmap(jnp.diag)(sz)
        Hww = Hww + jnp.diag(sw)
        blocks = _blocks_with(Hd, Ho, Hw, Hww, prep, ds)
        if kkt_method == 'cr':
            fac = factor_kkt_cr(blocks, factor_dtype=factor_dtype)
        elif kkt_method == 'spike':
            fac = _factor_spike(blocks)
        else:
            fac = factor_kkt(blocks, factor_dtype=factor_dtype)
        return blocks, fac

    def _apply_refined_cr(cf, r_nodes, r_border, n_refine,
                          with_resid):
        from .kkt import matvec_assembled_nl, solve_factored_cr_nl
        r_nl = jnp.swapaxes(r_nodes, -1, -2)
        u, beta = solve_factored_cr_nl(cf, r_nl, r_border)
        u = u.astype(dtype)
        beta = beta.astype(dtype)
        resid = None
        for i in range(n_refine):
            Ku, Kb = matvec_assembled_nl(cf, u, beta)
            if with_resid and n_refine >= 2 and i == n_refine - 1:
                # see the scan-path comment: residual measured at (and
                # shared with) the LAST refinement round; only with
                # >= 2 rounds (after one round it is the raw factor
                # residual, which trips the gate at indefinite optima)
                num = jnp.sqrt(jnp.sum((Ku - r_nl) ** 2)
                               + jnp.sum((Kb - r_border) ** 2))
                den = jnp.sqrt(jnp.sum(r_nl ** 2)
                               + jnp.sum(r_border ** 2))
                resid = num / jnp.maximum(den, 1e-300)
            du, dbeta = solve_factored_cr_nl(cf, r_nl - Ku,
                                             r_border - Kb)
            u = u + du.astype(dtype)
            beta = beta + dbeta.astype(dtype)
        out = _join_sol(jnp.swapaxes(u, -1, -2), beta)
        if not with_resid:
            return out
        if resid is None:
            Ku, Kb = matvec_assembled_nl(cf, u, beta)
            num = jnp.sqrt(jnp.sum((Ku - r_nl) ** 2)
                           + jnp.sum((Kb - r_border) ** 2))
            den = jnp.sqrt(jnp.sum(r_nl ** 2) + jnp.sum(r_border ** 2))
            resid = num / jnp.maximum(den, 1e-300)
        return out[0], out[1], resid

    def _apply_with_refinement(blocks_fac, rx, rc, n_refine,
                               with_resid=False):
        blocks, fac = blocks_fac
        r_nodes, r_border = _split_rhs(rx, rc)
        if kkt_method == 'cr':
            # lane-major end to end (solve + refinement matvecs);
            # transposed back only at _join_sol
            return _apply_refined_cr(fac, r_nodes, r_border, n_refine,
                                     with_resid)
        if kkt_method == 'spike':
            solve_one = lambda rn, rb: _spike_solve_one(fac, rn, rb)
        else:
            solve_one = lambda rn, rb: solve_factored(fac, rn, rb)
        u, beta = solve_one(r_nodes, r_border)
        u = u.astype(dtype)
        beta = beta.astype(dtype)
        resid = None
        for i in range(n_refine):
            Ku, Kb = kkt_matvec(blocks, u, beta)
            if with_resid and n_refine >= 2 and i == n_refine - 1:
                # Relative KKT residual measured at the last refinement
                # round and shared with its correction: one f64
                # operator application serves both (a full quarter of
                # the emulated-f64 refinement cost).  The reported
                # value is the residual BEFORE the final correction —
                # a strict upper bound on the post-refinement residual,
                # so the stability gate below stays conservative.
                # Only with >= 2 rounds: after a single round the
                # pre-correction value is the RAW factorization
                # residual, which legitimately exceeds the gate at
                # indefinite optima (observed: warm-started crane
                # certification spun its retry ladder on it).
                num = jnp.sqrt(jnp.sum((Ku - r_nodes) ** 2)
                               + jnp.sum((Kb - r_border) ** 2))
                den = jnp.sqrt(jnp.sum(r_nodes ** 2)
                               + jnp.sum(r_border ** 2))
                resid = num / jnp.maximum(den, 1e-300)
            du, dbeta = solve_one(r_nodes - Ku, r_border - Kb)
            u = u + du.astype(dtype)
            beta = beta + dbeta.astype(dtype)
        if not with_resid:
            return _join_sol(u, beta)
        # Post-refinement relative KKT residual: the only reliable
        # stability signal for the pivoting-free structured
        # factorization.  At a constrained optimum W + Sigma is
        # legitimately indefinite; Ipopt's pivoted MA27 factors that
        # exactly, but the block Schur recursion can silently lose all
        # accuracy (tiny pivots) while every entry stays finite — the
        # IPM uses this norm to decide whether a delta_w = 0 trial
        # actually solved the Newton system.
        if resid is None:       # n_refine == 0: dedicated residual pass
            Ku, Kb = kkt_matvec(blocks, u, beta)
            num = jnp.sqrt(jnp.sum((Ku - r_nodes) ** 2)
                           + jnp.sum((Kb - r_border) ** 2))
            den = jnp.sqrt(jnp.sum(r_nodes ** 2) + jnp.sum(r_border ** 2))
            resid = num / jnp.maximum(den, 1e-300)
        dx, dy = _join_sol(u, beta)
        return dx, dy, resid

    def kkt_apply(blocks_fac, rx, rc):
        """Solve a factored system; returns (dx, dy, rel_resid)."""
        return _apply_with_refinement(blocks_fac, rx, rc, refine_steps,
                                      with_resid=True)

    def kkt_apply_soc(blocks_fac, rx, rc):
        """Light re-solve for the second-order correction: one
        refinement round and no residual.  The SOC is a trial step the
        filter judges on actual constraint evaluations, so Ipopt-level
        solve accuracy buys nothing — and under vmap the SOC branch
        executes for every lane every iteration, so its emulated-f64
        refinement rounds are a per-iteration tax."""
        return _apply_with_refinement(blocks_fac, rx, rc,
                                      min(refine_steps, 1))

    def kkt_solve(prep, sigma_x, ds, rx, rc):
        return kkt_apply(kkt_factor(prep, sigma_x, ds), rx, rc)

    def kkt_solve_feasibility(prep, sigma_x, rc):
        """Damped Gauss-Newton feasibility step: the Hessian is
        replaced by the LM diagonal, the Jacobian blocks are reused
        from ``prep``, and every row gets unit slack diagonal
        ((J^T J + lam) dx = -J^T r in augmented form)."""
        sz, sw = split_free(sigma_x)
        Hd = jax.vmap(jnp.diag)(sz)
        Ho = jnp.zeros_like(prep['Ho'])
        Hw = jnp.zeros_like(prep['Hw'])
        Hww = jnp.diag(sw)
        ds = jnp.ones((col.num_constraints,), dtype)
        rx = jnp.zeros((col.num_free,), dtype)
        blocks = _blocks_with(Hd, Ho, Hw, Hww, prep, ds)
        if kkt_method == 'cr':
            fac = factor_kkt_cr(blocks, factor_dtype=factor_dtype)
        elif kkt_method == 'spike':
            fac = _factor_spike(blocks)
        else:
            fac = factor_kkt(blocks, factor_dtype=factor_dtype)
        # restoration steps don't need Ipopt-accuracy solves: one
        # refinement round suffices for a damped Gauss-Newton descent
        # direction, and this path executes every iteration for every
        # vmap lane (both lax.cond branches run under vmap)
        return _apply_with_refinement((blocks, fac), rx, rc,
                                      min(refine_steps, 1))

    fns = IPMFunctions(objective=objective_s, gradient=gradient_s,
                       constraints=constraints_s, kkt_prepare=kkt_prepare,
                       kkt_factor=kkt_factor, kkt_apply=kkt_apply,
                       kkt_apply_soc=kkt_apply_soc, kkt_solve=kkt_solve,
                       kkt_solve_feasibility=kkt_solve_feasibility,
                       kkt_prepare_gn=kkt_prepare_gn)
    return fns, (sf, dsc_full)
