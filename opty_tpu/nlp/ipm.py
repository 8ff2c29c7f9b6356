"""Batched primal-dual interior-point NLP solver in pure JAX.

Replaces Ipopt + cyipopt in the reference stack
(opty/direct_collocation.py:93 subclasses ``cyipopt.Problem``; the
result-dict contract is documented at :290-311).  The algorithm follows
Ipopt's design (Waechter & Biegler, Math. Prog. 106, 2006):

  * barrier parameter: Mehrotra-style adaptive probing by default (an
    affine predictor solved with the iteration's factorization picks
    mu; Ipopt ``mu_oracle=probing``/Nocedal-Waechter-Waltz 2008), with
    per-lane fallback to the monotone Fiacco-McCormick ladder once a
    line search fails (Ipopt's adaptive globalization); or pure
    monotone mode via ``mu_strategy='monotone'``;
  * general NLP form  min f(x)  s.t.  cl <= c(x) <= cu, xl <= x <= xu;
    equality rows are cl == cu, fixed variables xl == xu, both handled
    by masking; slacks ``s`` on every constraint row;
  * the condensed "augmented system"
    [[H + Sigma_x, J^T], [J, -Sigma_s^{-1}]] is handed to a pluggable
    ``kkt_solve`` callback — dense for generic NLPs, the
    block-tridiagonal-with-border solver (nlp/kkt.py) for collocation;
  * inertia-free regularization: instead of Ipopt's LDL^T inertia
    correction (no batched inertia oracle exists on TPU), the curvature
    d^T (W + Sigma + delta_w I) d along the computed direction is
    tested and delta_w escalated until positive;
  * the two-dimensional (theta, phi) FILTER line search with f-type
    switching, filter augmentation, and a feasibility-restoration mode
    (projected Cauchy steps on ||c - s||^2) entered when the
    backtracking search fails — the same globalization skeleton that
    makes Ipopt robust on nonconvex trajectory optimization;
  * exact Hessians via JAX AD (the reference runs Ipopt in
    limited-memory BFGS mode since opty provides no Hessian callback).

Everything is a pure function of arrays: ``jax.vmap`` turns one solver
into thousands of concurrent solves per chip, and ``jax.jit`` over a
sharded batch scales across a TPU mesh.  Convergence flags ride in the
carried state; vmapped instances run in lockstep until all converge.
"""

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .status import (INFEASIBLE_PROBLEM_DETECTED, INVALID_NUMBER_DETECTED,
                     MAXIMUM_ITERATIONS_EXCEEDED, RESTORATION_FAILED,
                     SOLVE_SUCCEEDED, SOLVED_TO_ACCEPTABLE_LEVEL)

__all__ = ['IPMOptions', 'IPMFunctions', 'IPMResult', 'solve_ipm',
           'make_nlp_functions_dense']

_BIG_SIGMA = 1e30  # must stay inside float32 exponent range: TPU f64
                   # emulation (float-float) overflows beyond ~1e38
_FILTER_SIZE = 64


class IPMOptions(NamedTuple):
    tol: float = 1e-8
    acceptable_tol: float = 1e-6
    acceptable_iter: int = 15
    max_iter: int = 500
    mu_init: float = 0.1
    # barrier update strategy (static config, resolved at trace time):
    # 'monotone' is Ipopt's default Fiacco-McCormick ladder (mu falls
    # only when the barrier problem is solved to kappa_eps * mu);
    # 'adaptive' is Mehrotra-style probing (Ipopt mu_oracle=probing,
    # Nocedal-Waechter-Waltz 2008): every iteration solves an AFFINE
    # (mu = 0) predictor with the already-computed factorization,
    # measures how far the fraction-to-boundary rule lets it travel,
    # and sets  mu = (mu_aff / mu_avg)^3 * mu_avg.  Cold starts spend
    # most of their iterations walking the monotone ladder down
    # (bench round 2: mean 105 iterations vs Ipopt's ~40), which the
    # probe skips; a lane that fails its line search (restoration
    # entry) falls back to the monotone ladder for the rest of its
    # solve — Ipopt's adaptive-mode globalization.
    mu_strategy: str = 'adaptive'
    kappa_eps: float = 10.0
    kappa_mu: float = 0.2
    theta_mu: float = 1.5
    tau_min: float = 0.99
    kappa_sigma: float = 1e10
    bound_push: float = 0.01       # kappa_1
    bound_frac: float = 0.01       # kappa_2
    slack_push: float = 0.01
    # filter line search (Waechter-Biegler defaults)
    gamma_theta: float = 1e-5
    gamma_phi: float = 1e-5
    s_theta: float = 1.1
    s_phi: float = 2.3
    delta_switch: float = 1.0
    eta_phi: float = 1e-8
    gamma_alpha: float = 0.05
    max_ls: int = 20
    # regularization (Waechter-Biegler IC defaults: delta_w_0 =
    # delta_w_init*1e4 = 1e-4, kappa_w- = 1/3, kappa_w+ = 8,
    # kappa_w+bar = 100, delta_w_min = 1e-20)
    delta_w_init: float = 1e-8
    delta_w_min: float = 1e-20
    delta_w_max: float = 1e12
    delta_c_init: float = 1e-10
    kappa_curv: float = 1e-11
    # max post-refinement relative KKT residual for a direction trial
    # to count as solved (stability guard for the pivoting-free
    # structured factorization; see dir_quality)
    eta_kkt_resid: float = 1e-6
    # restoration
    rest_reduction: float = 0.1    # exit when theta <= this * entry theta
    max_rest_iters: int = 80       # cumulative restoration iterations
    s_max: float = 100.0
    # Ipopt's bound_relax_factor: all bounds are relaxed internally by
    # this relative amount.  Essential for the (common) degenerate
    # combination of an equality constraint pinning a variable exactly
    # at its bound (e.g. x(0) = 0 with x >= 0): without relaxation the
    # barrier fights the equality, the distance collapses to ~mu/z and
    # the bound multiplier explodes toward kappa_sigma's d-dependent
    # ceiling.  The final x is projected back onto the original bounds
    # (Ipopt honor_original_bounds).
    bound_relax_factor: float = 1e-8
    debug: bool = False  # python-loop execution with per-iter printout
    trace: bool = False  # jax.debug.print per-iteration trace (jit-safe)


class IPMFunctions(NamedTuple):
    """Problem callbacks.  All must be JAX-traceable.

    ``kkt_prepare(x, y)`` builds the iteration-constant data (Jacobian
    and Lagrangian-Hessian blocks); ``kkt_factor(prep, sigma_x, ds)``
    factors the condensed primal-dual matrix

        [[H(x, y) + diag(sigma_x), J(x)^T], [J(x), -diag(ds)]]

    once per regularization trial, and ``kkt_apply(fac, rx, rc)``
    solves for any rhs with that factorization, returning
    ``(dx, dy, rel_resid)`` where ``rel_resid`` is the
    post-refinement relative KKT residual (the solver's stability
    signal for accepting a regularization trial) — the factorization
    is reused across the second-order-correction re-solve and
    iterative refinement, so an unchanged matrix is never re-factored.
    ``kkt_solve(prep, sigma_x, ds, rx, rc)`` is the fused convenience
    form (= apply(factor(...))) kept for external callers.
    ``kkt_solve_feasibility(prep, sigma_x, rc)`` solves the damped
    Gauss-Newton system for the restoration phase
    ([[diag(sigma_x), J^T], [J, -I]]).
    """
    objective: Callable[[Any], Any]
    gradient: Callable[[Any], Any]
    constraints: Callable[[Any], Any]
    kkt_prepare: Callable[..., Any]
    kkt_solve: Callable[..., Any]
    kkt_solve_feasibility: Callable[..., Any]
    kkt_factor: Any = None
    kkt_apply: Any = None
    # optional cheaper solve for the second-order correction (e.g.
    # fewer refinement rounds, no residual): the SOC is a trial step
    # judged by the filter on actual evaluations, so full solve
    # accuracy buys nothing.  Falls back to kkt_apply.
    kkt_apply_soc: Any = None


class IPMResult(NamedTuple):
    x: jnp.ndarray
    obj_val: jnp.ndarray
    g: jnp.ndarray            # constraint values at solution
    mult_g: jnp.ndarray       # y
    mult_x_L: jnp.ndarray     # zL
    mult_x_U: jnp.ndarray     # zU
    status: jnp.ndarray
    iterations: jnp.ndarray
    obj_history: jnp.ndarray  # (max_iter,) padded with nan
    inf_pr: jnp.ndarray       # final primal infeasibility (inf norm)
    inf_du: jnp.ndarray       # final dual infeasibility (inf norm)
    mu: jnp.ndarray


class _State(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    y: jnp.ndarray
    zL: jnp.ndarray
    zU: jnp.ndarray
    wL: jnp.ndarray
    wU: jnp.ndarray
    mu: jnp.ndarray
    delta_w: jnp.ndarray
    delta_c: jnp.ndarray
    f_theta: jnp.ndarray      # filter entries (theta), +inf = empty
    f_phi: jnp.ndarray        # filter entries (phi)
    f_count: jnp.ndarray
    in_rest: jnp.ndarray      # restoration mode flag
    rest_theta: jnp.ndarray   # theta at restoration entry
    rest_total: jnp.ndarray   # cumulative restoration iterations
    rest_lam: jnp.ndarray     # LM damping of the restoration GN step
    theta_prev: jnp.ndarray   # previous-iteration theta (stall detection)
    stall_count: jnp.ndarray
    theta_min: jnp.ndarray    # init-point filter thresholds (constant;
    theta_max: jnp.ndarray    # carried so solves can resume from state)
    mono: jnp.ndarray         # adaptive-mu lane fell back to monotone
    it: jnp.ndarray
    status: jnp.ndarray
    done: jnp.ndarray
    accept_count: jnp.ndarray
    obj_history: jnp.ndarray
    inf_pr: jnp.ndarray
    inf_du: jnp.ndarray
    alpha_last: jnp.ndarray
    E_last: jnp.ndarray       # optimality error of the last two
    E_prev: jnp.ndarray       # iterations (regularization-decay gate)
    g: jnp.ndarray            # gradient, constraints and J^T y at
    c: jnp.ndarray            # (x, y), carried from the convergence
    Jty: jnp.ndarray          # check so each point is evaluated once
    x_R: jnp.ndarray          # elastic-restoration prox center
    mu_R: jnp.ndarray         # elastic-restoration barrier parameter


def _masked_inv(dist, mask):
    return jnp.where(mask, 1.0 / jnp.where(mask, dist, 1.0), 0.0)


def _push_inside(v, lo, hi, has_lo, has_hi, k1, k2):
    """Ipopt-style initial point push into the strict interior."""
    width = jnp.where(has_lo & has_hi, hi - lo, 1.0)
    pL = jnp.where(has_lo & has_hi,
                   jnp.minimum(k1 * jnp.maximum(1.0, jnp.abs(lo)), k2 * width),
                   k1 * jnp.maximum(1.0, jnp.abs(lo)))
    pU = jnp.where(has_lo & has_hi,
                   jnp.minimum(k1 * jnp.maximum(1.0, jnp.abs(hi)), k2 * width),
                   k1 * jnp.maximum(1.0, jnp.abs(hi)))
    v = jnp.where(has_lo, jnp.maximum(v, lo + pL), v)
    v = jnp.where(has_hi, jnp.minimum(v, hi - pU), v)
    return v


def _ftb_alpha(dist, step, mask, tau):
    """Fraction-to-boundary: max alpha in (0, 1] with
    dist + alpha * step >= (1 - tau) * dist for all masked coords."""
    neg = mask & (step < 0)
    ratio = jnp.where(neg, -tau * dist / jnp.where(neg, step, -1.0), 1.0)
    return jnp.minimum(1.0, jnp.min(ratio) if ratio.ndim else ratio)


def solve_ipm(fns: IPMFunctions, x0, xl, xu, cl, cu,
              options: IPMOptions = IPMOptions(),
              y0=None, zL0=None, zU0=None,
              resume_state=None, iter_budget=None, return_state=False,
              refill=None):
    """Solve the NLP from ``x0``.  Pure function: jit/vmap-friendly.

    ``resume_state``/``iter_budget``/``return_state`` support chunked
    execution: run at most ``iter_budget`` further iterations from a
    previously returned state, and return the carried state alongside
    the result.  Needed where single device executions must stay
    short (the TPU remote-execution path kills long launches); the
    default (None) path is byte-identical to an unchunked solve.

    ``refill`` (traced scalar bool; requires ``resume_state``) selects
    a *fresh* start from ``x0`` instead of resuming: under ``vmap``
    this lets a work queue replace converged lanes with new problem
    instances inside one compiled program, eliminating lockstep
    straggler waste (see Problem.solve_queue)."""
    opt = options
    dtype = jnp.result_type(jnp.asarray(x0).dtype, jnp.float32)
    x0 = jnp.asarray(x0, dtype)
    xl = jnp.asarray(xl, dtype)
    xu = jnp.asarray(xu, dtype)
    cl = jnp.asarray(cl, dtype)
    cu = jnp.asarray(cu, dtype)
    n = x0.shape[0]
    m = cl.shape[0]
    eps_mach = jnp.finfo(dtype).eps

    inf_cut = 1e18
    has_xl = xl > -inf_cut
    has_xu = xu < inf_cut
    fixed = has_xl & has_xu & (xu - xl <= 0.0)
    mL = has_xl & ~fixed
    mU = has_xu & ~fixed
    has_sl = cl > -inf_cut
    has_su = cu < inf_cut
    eq = has_sl & has_su & (cu - cl <= 0.0)
    msL = has_sl & ~eq
    msU = has_su & ~eq

    # keep the user's bounds for the final projection, then relax all
    # working bounds (see IPMOptions.bound_relax_factor)
    xl_orig, xu_orig = xl, xu
    brf = opt.bound_relax_factor
    if brf:
        relax = lambda b: brf * jnp.maximum(1.0, jnp.abs(b))
        xl = jnp.where(mL, xl - relax(xl), xl)
        xu = jnp.where(mU, xu + relax(xu), xu)
        cl = jnp.where(msL, cl - relax(cl), cl)
        cu = jnp.where(msU, cu + relax(cu), cu)
    n_duals = (jnp.sum(mL) + jnp.sum(mU) + jnp.sum(msL) + jnp.sum(msU))
    n_comp = jnp.maximum(n_duals, 1.0)

    # ---- initialization -------------------------------------------------
    x_init = jnp.where(fixed, xl, _push_inside(
        x0, xl, xu, has_xl, has_xu, opt.bound_push, opt.bound_frac))
    c0 = fns.constraints(x_init)
    s_init = jnp.where(eq, cl, _push_inside(
        c0, cl, cu, has_sl, has_su, opt.slack_push, opt.bound_frac))
    # Central-path floor: with w = 1 initial slack multipliers, a
    # slack distance of mu_init puts the pair exactly on w*d = mu.
    # Without it, a tiny slack_push (warm starts) leaves active
    # inequality slacks jammed at the boundary with sigma_s ~ 1/d^2
    # freezing them and the multipliers exploding toward kappa_sigma's
    # d-dependent ceiling.  Perturbation of c0 is at most mu_init, so
    # theta is unaffected at any meaningful scale.
    width = jnp.where(msL & msU, cu - cl, jnp.inf)
    floor_d = jnp.minimum(jnp.asarray(opt.mu_init, dtype), 0.25 * width)
    s_init = jnp.where(msL, jnp.maximum(s_init, cl + floor_d), s_init)
    s_init = jnp.where(msU, jnp.minimum(s_init, cu - floor_d), s_init)
    one = jnp.ones((), dtype)
    zL_init = (jnp.where(mL, one, 0.0) if zL0 is None
               else jnp.where(mL, jnp.asarray(zL0, dtype), 0.0))
    zU_init = (jnp.where(mU, one, 0.0) if zU0 is None
               else jnp.where(mU, jnp.asarray(zU0, dtype), 0.0))
    wL_init = jnp.where(msL, one, 0.0)
    wU_init = jnp.where(msU, one, 0.0)
    if y0 is not None:
        y_init = jnp.asarray(y0, dtype)
    else:
        # Waechter-Biegler eq (36): least-squares initialization of
        # the equality multipliers from the dual-feasibility rows,
        # y_LS = argmin ||g - zL + zU + J^T y||, computed with the
        # same structured factorization ([[I, J^T], [J, -eps]]) and
        # discarded if implausibly large (||y||_inf > 1e3 -> 0, the
        # W-B safeguard).  Cold starts otherwise burn ~10-15
        # iterations recovering multiplier scale from y = 0.
        g0_ls = fns.gradient(x_init)
        prep0 = fns.kkt_prepare(x_init, jnp.zeros((m,), dtype))
        sigma0 = jnp.ones((n,), dtype) + jnp.where(fixed, _BIG_SIGMA, 0.0)
        ds0 = jnp.full((m,), 1e-8, dtype)
        rx0 = jnp.where(fixed, 0.0, -(g0_ls - zL_init + zU_init))
        rc0 = jnp.zeros((m,), dtype)
        # gn_mask=True drops the Lagrangian Hessian -> pure identity
        # (1,1) block, exactly the W-B least-squares system
        fac0_ls = fns.kkt_factor(prep0, sigma0, ds0, True)
        _, y_ls, _ = fns.kkt_apply(fac0_ls, rx0, rc0)
        # LS multipliers approximate the true ones only near
        # stationarity: accept them for near-feasible starts (warm
        # starts without supplied multipliers — e.g. re-solves from a
        # previous solution — burned ~10-15 recovery iterations from
        # y = 0), keep y = 0 for far starts where they are noise
        # (measured: cold random multi-starts got slightly WORSE with
        # ungated LS duals).
        y_ok = ((jnp.max(jnp.abs(y_ls)) <= 1e3)
                & jnp.all(jnp.isfinite(y_ls))
                & (jnp.max(jnp.abs(c0 - s_init)) <= 1e-3))
        y_init = jnp.where(y_ok, y_ls, 0.0)

    theta_init = jnp.sum(jnp.abs(c0 - s_init))
    theta_max_init = 1e4 * jnp.maximum(1.0, theta_init)
    theta_min_init = 1e-4 * jnp.maximum(1.0, theta_init)

    def fresh_filter(theta_max):
        """Empty filter containing only the (theta_max, -inf) cap."""
        f_theta = jnp.full((_FILTER_SIZE,), jnp.inf, dtype)
        f_phi = jnp.full((_FILTER_SIZE,), jnp.inf, dtype)
        f_theta = f_theta.at[0].set(theta_max)
        f_phi = f_phi.at[0].set(-jnp.inf)
        return f_theta, f_phi, jnp.asarray(1, jnp.int32)

    def optimality_error_from(g, c, Jty, x, s, y, zL, zU, wL, wU, mu):
        """Ipopt's scaled KKT error E_mu from precomputed g, c, J^T y."""
        r_dual_x = jnp.where(fixed, 0.0, g + Jty - zL + zU)
        r_dual_s = jnp.where(eq, 0.0, -y - wL + wU)
        inf_du = jnp.maximum(jnp.max(jnp.abs(r_dual_x)),
                             jnp.max(jnp.abs(r_dual_s)))
        r_prim = c - s
        inf_pr = jnp.max(jnp.abs(r_prim))
        dLx = jnp.where(mL, x - xl, 1.0)
        dUx = jnp.where(mU, xu - x, 1.0)
        dLs = jnp.where(msL, s - cl, 1.0)
        dUs = jnp.where(msU, cu - s, 1.0)
        comp = jnp.concatenate([
            jnp.where(mL, zL * dLx - mu, 0.0),
            jnp.where(mU, zU * dUx - mu, 0.0),
            jnp.where(msL, wL * dLs - mu, 0.0),
            jnp.where(msU, wU * dUs - mu, 0.0)])
        inf_comp = jnp.max(jnp.abs(comp))
        dual_l1 = (jnp.sum(jnp.abs(y)) + jnp.sum(jnp.abs(zL))
                   + jnp.sum(jnp.abs(zU)) + jnp.sum(jnp.abs(wL))
                   + jnp.sum(jnp.abs(wU)))
        # Waechter-Biegler denominator m + n with n = primal variable
        # count including slacks (x and s in this formulation).
        sd = jnp.maximum(opt.s_max, dual_l1 / (m + (n + m))) / opt.s_max
        z_l1 = (jnp.sum(jnp.abs(zL)) + jnp.sum(jnp.abs(zU))
                + jnp.sum(jnp.abs(wL)) + jnp.sum(jnp.abs(wU)))
        sc = jnp.maximum(opt.s_max, z_l1 / n_comp) / opt.s_max
        E = jnp.maximum(jnp.maximum(inf_du / sd, inf_pr), inf_comp / sc)
        return E, inf_pr, inf_du

    def eval_point(x, y):
        g = fns.gradient(x)
        c, vjp = jax.vjp(fns.constraints, x)
        Jty = vjp(y)[0]
        return g, c, Jty
    # ---- main loop ------------------------------------------------------
    if iter_budget is None:
        def cond(st: _State):
            return (~st.done) & (st.it < opt.max_iter)
    else:
        def cond(st: _State, _limit=None):
            return (~st.done) & (st.it < opt.max_iter) & \
                (st.it < st0.it + iter_budget)

    def body(st: _State):
        x, s, y = st.x, st.s, st.y
        zL, zU, wL, wU = st.zL, st.zU, st.wL, st.wU
        theta_min = st.theta_min
        theta_max = st.theta_max

        # carried from the previous iteration's convergence check (the
        # same point): one gradient + constraints + vjp per iteration
        g, c, Jty = st.g, st.c, st.Jty

        # -- barrier parameter update (possibly several reductions) ------
        def mu_red(carry, _):
            mu, tau, shrunk = carry
            E_mu, _, _ = optimality_error_from(
                g, c, Jty, x, s, y, zL, zU, wL, wU, mu)
            shrink = (E_mu <= opt.kappa_eps * mu) & (mu > opt.tol / 11.0)
            new_mu = jnp.maximum(opt.tol / 11.0,
                                 jnp.minimum(opt.kappa_mu * mu,
                                             mu ** opt.theta_mu))
            mu = jnp.where(shrink, new_mu, mu)
            tau = jnp.maximum(opt.tau_min, 1.0 - mu)
            return (mu, tau, shrunk | shrink), None

        (mu_mono, tau_mono, mu_shrunk), _ = jax.lax.scan(
            mu_red, (st.mu, jnp.asarray(0.0, dtype), jnp.asarray(False)),
            None, length=4)

        theta_now = jnp.sum(jnp.abs(c - s))

        # iteration-constant KKT data (Jacobian + Hessian blocks),
        # shared by direction retries, SOC and restoration
        prep = fns.kkt_prepare(x, y)

        # -- barrier diagonals and residuals (shared by both branches) ---
        dLx = jnp.where(mL, x - xl, 1.0)
        dUx = jnp.where(mU, xu - x, 1.0)
        dLs = jnp.where(msL, s - cl, 1.0)
        dUs = jnp.where(msU, cu - s, 1.0)
        iLx = _masked_inv(dLx, mL)
        iUx = _masked_inv(dUx, mU)
        iLs = _masked_inv(dLs, msL)
        iUs = _masked_inv(dUs, msU)

        SigL = zL * iLx
        SigU = zU * iUx
        sigma_x = SigL + SigU + jnp.where(fixed, _BIG_SIGMA, 0.0)
        SigsL = wL * iLs
        SigsU = wU * iUs
        sigma_s = SigsL + SigsU
        free_row = ~eq & ~msL & ~msU
        Ds = jnp.where(eq, 0.0,
                       jnp.where(free_row, _BIG_SIGMA,
                                 1.0 / jnp.maximum(sigma_s, 1e-30)))

        # The direction ("ladder") rhs: monotone lanes solve the
        # centered system at mu_mono directly; adaptive free-mode lanes
        # solve the AFFINE (mu = 0) predictor first — the probe that
        # chooses this iteration's mu — and re-solve the centered rhs
        # with the same factorization afterwards (Mehrotra).
        adaptive = opt.mu_strategy == 'adaptive'
        if adaptive:
            free_lane = (~st.mono) & (n_duals > 0)
            mu_lad = jnp.where(free_lane, 0.0, mu_mono)
        else:
            mu_lad = mu_mono
        rx_lad = -(g + Jty - mu_lad * iLx + mu_lad * iUx)
        rx_lad = jnp.where(fixed, 0.0, rx_lad)
        rhs_s_lad = -(-y - mu_lad * iLs + mu_lad * iUs)
        rhs_s_lad = jnp.where(eq, 0.0, rhs_s_lad)
        rc_lad = -(c - s) + Ds * rhs_s_lad

        # -- merged direction system ---------------------------------
        # Under vmap BOTH lax.cond branches execute for every lane, so
        # a restoration lane would otherwise pay the regular-direction
        # factorization AND the restoration one.  The two systems
        # share the Jacobian structure and differ only in diagonal
        # blocks, so the blocks are SELECTED per lane before one
        # shared factorization.
        #
        # Restoration lanes solve the ELASTIC restoration NLP (the
        # in-framework form of Ipopt's restoration phase, W-B A-9):
        #
        #   min  rho (p + n) + zeta/2 |D_R (x - x_R)|^2
        #        - mu_R [sum log(bound distances) + log p + log n]
        #   s.t. c(x) - s - p + n = 0
        #
        # p, n enter linearly, so for a given residual r = c - s the
        # barrier-optimal elastic pair has the CLOSED FORM
        #
        #   n = (mu_R - rho r + sqrt(rho^2 r^2 + mu_R^2)) / (2 rho)
        #   p = n + r            (both always > 0)
        #
        # and re-eliminating (p, n) after every step keeps the elastic
        # constraint satisfied EXACTLY at every iterate: restoration
        # becomes monotone descent on the smooth merit rho(p+n) + prox
        # + barriers (a smoothed L1 feasibility measure), with implied
        # multiplier y_imp = rho - mu_R/p = mu_R/n - rho bounded by
        # rho — the L1 exactness property that lets the elastic phase
        # walk through rank-deficient and complementarity-degenerate
        # Jacobians where a damped Gauss-Newton step stalls.
        # Condensing p, n, s into the constraint row turns the (2,2)
        # block into -(Ds_R + p^2/mu_R + n^2/mu_R): same bordered
        # block-tridiagonal structure, one shared factorization.
        gn = st.in_rest
        rho_R = 1000.0
        mu_R = st.mu_R
        r_rest = c - s
        S_el = jnp.sqrt((rho_R * r_rest) ** 2 + mu_R ** 2)
        n_el = (mu_R - rho_R * r_rest + S_el) / (2.0 * rho_R)
        p_el = n_el + r_rest
        y_imp = rho_R - mu_R / jnp.maximum(p_el, 1e-30)
        Dp_el = p_el ** 2 / mu_R
        Dn_el = n_el ** 2 / mu_R
        sigma_sR = mu_R * (iLs ** 2 + iUs ** 2)
        DsR = jnp.where(eq, 0.0,
                        jnp.where(free_row, _BIG_SIGMA,
                                  1.0 / jnp.maximum(sigma_sR, 1e-30)))
        rhs_sR = jnp.where(eq, 0.0,
                           -(-y_imp - mu_R * iLs + mu_R * iUs))
        dR2 = 1.0 / jnp.maximum(1.0, jnp.abs(st.x_R)) ** 2
        zeta_R = st.rest_lam * jnp.sqrt(mu_R)
        sigma_xR = (mu_R * (iLx ** 2 + iUx ** 2) + zeta_R * dR2
                    + jnp.where(fixed, _BIG_SIGMA, 0.0))
        _, vjp_x = jax.vjp(fns.constraints, x)
        Jty_imp = vjp_x(y_imp)[0]
        rx_rest = jnp.where(fixed, 0.0,
                            -(zeta_R * dR2 * (x - st.x_R) + Jty_imp
                              - mu_R * iLx + mu_R * iUx))
        rc_rest = DsR * rhs_sR   # c - s - p + n = 0 by construction

        sigma_m = jnp.where(gn, sigma_xR, sigma_x)
        ds_m = jnp.where(gn, DsR + Dp_el + Dn_el, Ds)
        rx_m = jnp.where(gn, rx_rest, rx_lad)
        rc_m = jnp.where(gn, rc_rest, rc_lad)

        def rest_merit(xt, st_):
            """Elastic restoration merit at (xt, st_): smoothed-L1
            infeasibility + prox + barrier terms, with (p, n)
            re-eliminated in closed form.  Returns (merit, theta)."""
            rt = fns.constraints(xt) - st_
            St = jnp.sqrt((rho_R * rt) ** 2 + mu_R ** 2)
            nt = (mu_R - rho_R * rt + St) / (2.0 * rho_R)
            pt = nt + rt
            slog = lambda d: jnp.sum(jnp.log(jnp.maximum(d, 1e-30)))
            elas = (jnp.sum(rho_R * (pt + nt))
                    - mu_R * (slog(pt) + slog(nt)))
            dL1 = jnp.where(mL, xt - xl, 1.0)
            dU1 = jnp.where(mU, xu - xt, 1.0)
            dL2 = jnp.where(msL, st_ - cl, 1.0)
            dU2 = jnp.where(msU, cu - st_, 1.0)
            okb = (jnp.all(dL1 > 0) & jnp.all(dU1 > 0)
                   & jnp.all(dL2 > 0) & jnp.all(dU2 > 0))
            bar = -mu_R * (slog(dL1) + slog(dU1) + slog(dL2) + slog(dU2))
            prox = 0.5 * zeta_R * jnp.dot(dR2 * (xt - st.x_R),
                                          xt - st.x_R)
            theta_t = jnp.sum(jnp.abs(rt))
            return jnp.where(okb, elas + bar + prox, jnp.inf), theta_t

        def restoration_step(live):
            """One elastic-restoration iteration from the shared
            merged solve (dx_gn, dy_gn).  ``live`` gates the
            backtracking loops: lanes not in restoration exit their
            while_loops immediately (trip counts are max-over-lanes
            under vmap).  Falls back to steepest descent on the same
            merit when the elastic Newton step fails."""
            dxr = jnp.where(fixed, 0.0, dx_gn)
            dsr = jnp.where(eq, 0.0, DsR * (dy_gn + rhs_sR))
            fin = jnp.all(jnp.isfinite(dxr)) & jnp.all(jnp.isfinite(dsr))
            dxr = jnp.where(fin, dxr, 0.0)
            dsr = jnp.where(fin, dsr, 0.0)

            # merit at the current point, from already-known pieces
            slog = lambda d: jnp.sum(jnp.log(jnp.maximum(d, 1e-30)))
            M0 = (jnp.sum(rho_R * (p_el + n_el))
                  - mu_R * (slog(p_el) + slog(n_el))
                  - mu_R * (slog(dLx) + slog(dUx) + slog(dLs)
                            + slog(dUs))
                  + 0.5 * zeta_R * jnp.dot(dR2 * (x - st.x_R),
                                           x - st.x_R))

            tau_R = jnp.maximum(opt.tau_min, 1.0 - mu_R)

            def ftb(dxx, dss):
                return jnp.minimum(
                    jnp.minimum(_ftb_alpha(dLx, dxx, mL, tau_R),
                                _ftb_alpha(dUx, -dxx, mU, tau_R)),
                    jnp.minimum(_ftb_alpha(dLs, dss, msL, tau_R),
                                _ftb_alpha(dUs, -dss, msU, tau_R)))

            def backtrack(dxx, dss, a0, gate):
                def bt_cond(carry):
                    a, j, ok, Mt, th = carry
                    return (~ok) & (j < 15) & gate

                def bt_body(carry):
                    a, j, _, _, _ = carry
                    Mt, th = rest_merit(x + a * dxx, s + a * dss)
                    ok = Mt <= M0 - 1e-12 * jnp.abs(M0)
                    return (jnp.where(ok, a, a * 0.5), j + 1, ok, Mt,
                            th)

                return jax.lax.while_loop(
                    bt_cond, bt_body,
                    (a0, jnp.asarray(0, jnp.int32), jnp.asarray(False),
                     jnp.asarray(jnp.inf, dtype),
                     jnp.asarray(jnp.inf, dtype)))

            a_el, _, red_el, _, th_el = backtrack(dxr, dsr,
                                                  ftb(dxr, dsr), live)
            use_el = fin & red_el

            # steepest-descent fallback on the same merit (its exact
            # negative gradient is the residual pair below)
            dx_c = rx_rest
            ds_c = jnp.where(eq, 0.0, rhs_sR)
            scale_c = 1.0 / jnp.maximum(
                1.0, jnp.maximum(jnp.max(jnp.abs(dx_c)),
                                 jnp.max(jnp.abs(ds_c))))
            dx_c = dx_c * scale_c
            ds_c = ds_c * scale_c
            # under vmap the trip count is max-over-lanes: only lanes
            # whose elastic Newton step failed to reduce the merit pay
            # for the steepest-descent fallback search
            a_c, _, red_c, _, th_c = backtrack(dx_c, ds_c,
                                               ftb(dx_c, ds_c),
                                               live & ~use_el)

            a_use = jnp.where(use_el, a_el, a_c)
            dx_use = jnp.where(use_el, dxr, dx_c)
            ds_use = jnp.where(use_el, dsr, ds_c)
            reduced = use_el | red_c
            x_n = jnp.where(reduced, x + a_use * dx_use, x)
            s_n = jnp.where(reduced, s + a_use * ds_use, s)
            theta_r = jnp.where(use_el, th_el,
                                jnp.where(red_c, th_c, theta_now))

            # prox-weight adaptation (LM-like) on the elastic step
            lam_n = jnp.where(use_el & (a_el > 0.9),
                              jnp.maximum(st.rest_lam / 3.0, 1.0),
                              jnp.where(use_el, st.rest_lam,
                                        jnp.minimum(st.rest_lam * 10.0,
                                                    1e6)))
            # first-order certificate of the feasibility problem: the
            # gradient of 0.5||c - s||^2 (distinguishes genuine local
            # infeasibility from slow restoration progress)
            gx = jnp.where(fixed, 0.0, vjp_x(r_rest)[0])
            gs = jnp.where(eq, 0.0, -r_rest)
            feas_grad = jnp.sqrt(jnp.dot(gx, gx) + jnp.dot(gs, gs))
            return x_n, s_n, reduced, lam_n, feas_grad, theta_r

        # -- direction with inertia-free curvature correction ---------
        def lag_grad(xx):
            _, vj = jax.vjp(fns.constraints, xx)
            return fns.gradient(xx) + vj(y)[0]

        def compute_dir(delta_w, delta_c):
            """Factor once per regularization trial; the factorization
            rides in the retry-loop carry so the SOC re-solve below
            reuses it instead of re-factoring an unchanged matrix.
            Regularization applies to regular lanes only (restoration
            lanes' LM damping rides in sigma_m already)."""
            fac = fns.kkt_factor(prep,
                                 sigma_m + jnp.where(gn, 0.0, delta_w),
                                 ds_m + jnp.where(gn, 0.0, delta_c),
                                 gn)
            dxx, dyy, rres = fns.kkt_apply(fac, rx_m, rc_m)
            dxx = jnp.where(fixed, 0.0, dxx)
            dss = Ds * (dyy + rhs_s_lad)
            dss = jnp.where(eq, 0.0, dss)
            return dxx, dyy, dss, fac, rres

        def dir_quality(dxx, dyy, dss, delta_w, rres):
            finite = (jnp.all(jnp.isfinite(dxx))
                      & jnp.all(jnp.isfinite(dyy)))
            # A near-singular iteration matrix (degenerate
            # constraint rows: vanishing gradient with an active
            # slack bound, e.g. gated path inequalities outside
            # their region) shows up as an exploding multiplier
            # step long before it turns non-finite.  Treat it like
            # singularity and let the retry loop raise delta_c —
            # the inertia-free analog of Ipopt's delta_c
            # perturbation for rank-deficient Jacobians.
            dy_ok = jnp.max(jnp.abs(dyy)) <= 1e12
            healthy = finite & dy_ok
            # Post-refinement relative KKT residual: W + Sigma is
            # legitimately indefinite at a constrained optimum, and
            # the pivoting-free structured factorization can lose
            # all accuracy on it (tiny pivots) while every entry
            # stays finite and the directional-curvature test
            # passes on the garbage step.  A trial only counts as
            # solved when the Newton system was actually solved.
            solved = rres <= opt.eta_kkt_resid
            Wdx = jax.jvp(lag_grad, (x,), (dxx,))[1]
            curv = (jnp.dot(dxx, Wdx) + jnp.dot(sigma_x * dxx, dxx)
                    + delta_w * jnp.dot(dxx, dxx)
                    + jnp.dot(sigma_s * dss, dss))
            nrm = jnp.dot(dxx, dxx) + jnp.dot(dss, dss)
            if opt.trace:
                jax.debug.print(
                    'TRIAL dw={dw:.1e} rres={rr:.2e} curv={cv:.3e} '
                    'nrm={nm:.3e} healthy={h} dymax={dm:.2e}',
                    dw=delta_w, rr=rres, cv=curv, nm=nrm, h=healthy,
                    dm=jnp.max(jnp.abs(dyy)))
            # restoration lanes always pass: their GN step is judged
            # by the restoration branch, and they must not drive the
            # regular lanes' regularization retry loop
            ok = (healthy & solved & (curv >= opt.kappa_curv * nrm)) | gn
            return ok, healthy

        def dir_cond(carry):
            _, _, _, _, _, _, _, tries, ok = carry
            return (~ok) & (tries < 14)

        def dir_body(carry):
            dxx, dyy, dss, fac, dw, dc, healthy_prev, tries, _ = carry
            # delta_w control, adapted from Waechter-Biegler
            # IC-1..IC-6 for an INERTIA-FREE solver: Ipopt reads
            # the exact inertia off its pivoted LDL^T and sets
            # delta_w to exactly the level the curvature needs.
            # The structured pivoting-free factorization has no
            # inertia signal — a slightly-damped saddle system
            # passes both our trial checks (small KKT residual,
            # nonnegative directional curvature) while giving wild
            # steps — so the cross-ITERATION delta_w policy runs on
            # line-search and optimality-error feedback instead:
            #
            #   * alpha_last ~ 1 and E improving  -> decay /3
            #     (IC-3's kappa_w-; lets dw fall below any fixed
            #     floor so the endgame turns (super)linear -> the
            #     9-link chain stalled at inf_pr 4e-5 with dw
            #     pinned at 1e-4, converges to 1e-9 with decay);
            #   * 0 < alpha_last < 1e-2          -> grow x8
            #     (steps the filter keeps cutting mean too LITTLE
            #     damping: push toward a tamer gradient-like step;
            #     alpha = 0 is a failed search = restoration's
            #     business);
            #   * at acceptable E that has flattened -> freeze
            #     (rounding floor: decay probing there feeds
            #     slightly-sloppy solves back into the iterate —
            #     observed pr degrading x9/iter on quarter-car
            #     until the warm start was destroyed);
            #   * otherwise                       -> hold.
            #
            # WITHIN an iteration the retry ladder is W-B: first
            # ever regularization jumps to delta_w_0 = 1e-4 and
            # escalates x100, later ones escalate x8 from the
            # feedback value; a SINGULAR trial (non-finite factor /
            # blown multiplier step) also escalates x100 since the
            # start can sit decades below the useful range.
            # Singularity and indefiniteness have distinct cures
            # (IC-2 vs IC-5): a singular trial with delta_c still
            # zero first retries with delta_c alone (rank-deficient
            # constraint rows, e.g. a vacuous 0 = 0 row, need no
            # Hessian damping).
            was_zero = st.delta_w == 0.0
            good_step = st.alpha_last >= 0.9
            bad_step = (st.alpha_last > 0.0) & (st.alpha_last < 1e-2)
            improving = st.E_last < 0.99 * st.E_prev
            freeze = (st.accept_count > 0) & ~improving
            first_retry = jnp.where(
                freeze & ~was_zero, st.delta_w,
                jnp.where(
                    bad_step & ~was_zero,
                    jnp.minimum(st.delta_w * 8.0, 1e6),
                    jnp.where(
                        was_zero,
                        jnp.asarray(opt.delta_w_init * 1e4, dtype),
                        jnp.where(
                            good_step,
                            jnp.maximum(opt.delta_w_min,
                                        st.delta_w * 0.33),
                            st.delta_w))))
            growth = jnp.where(was_zero | ~healthy_prev, 100.0, 8.0)
            dw_candidate = jnp.where(
                dw == 0.0, first_retry,
                jnp.minimum(dw * growth, opt.delta_w_max))
            dc_only = (~healthy_prev) & (dc == 0.0)
            dw_new = jnp.where(dc_only, dw, dw_candidate)
            # Ipopt's delta_c is transient: a mu-scaled constraint
            # damping applied while this iteration's factorization
            # sequence keeps coming back singular (delta_c_bar *
            # mu^kappa_c with delta_c_bar = 1e-8, kappa_c = 1/4) —
            # NOT a persistent state that compounds across
            # iterations (a x100 ratchet there poisons every later
            # factorization and stalls warm-started solves).
            # a STILL-singular trial escalates delta_c x100:
            # structurally rank-deficient Jacobians (e.g. final-node
            # path-constraint rows spanned by the instance rows
            # pinning every state there, as in the parallel-park
            # problem — J loses exactly one rank per such row) need
            # far more than Ipopt's mu-scaled seed for the pivoting-
            # free structured factorization to produce a bounded
            # least-squares-like dy.
            dc_new = jnp.where(healthy_prev, dc,
                               jnp.maximum(1e-8 * st.mu ** 0.25,
                                           opt.delta_c_init))
            dxx, dyy, dss, fac, rres = compute_dir(dw_new, dc_new)
            ok, healthy = dir_quality(dxx, dyy, dss, dw_new, rres)
            return (dxx, dyy, dss, fac, dw_new, dc_new, healthy,
                    tries + 1, ok)

        dx, dy, ds, fac0, rres0 = compute_dir(jnp.asarray(0.0, dtype),
                                              jnp.asarray(0.0, dtype))
        # the trial-0 solution of the merged system IS the damped
        # Gauss-Newton step for restoration lanes; capture it before
        # the retry loop perturbs regular lanes
        dx_gn, dy_gn = dx, dy
        ok0, healthy0 = dir_quality(dx, dy, ds,
                                    jnp.asarray(0.0, dtype), rres0)
        (dx, dy, ds, fac_used, delta_w_used, delta_c, _, _,
         dir_ok) = jax.lax.while_loop(
                dir_cond, dir_body,
                (dx, dy, ds, fac0, jnp.asarray(0.0, dtype),
                 jnp.asarray(0.0, dtype), healthy0,
                 jnp.asarray(0, jnp.int32), ok0))
        dir_bad = ~dir_ok
        dx = jnp.where(dir_bad, 0.0, dx)
        dy = jnp.where(dir_bad, 0.0, dy)
        ds = jnp.where(dir_bad, 0.0, ds)

        # -- Mehrotra probing mu + centered corrector re-solve ----------
        if adaptive:
            # affine dual steps (linearized complementarity at mu = 0)
            dzLa = jnp.where(mL, -zL - SigL * dx, 0.0)
            dzUa = jnp.where(mU, -zU + SigU * dx, 0.0)
            dwLa = jnp.where(msL, -wL - SigsL * ds, 0.0)
            dwUa = jnp.where(msU, -wU + SigsU * ds, 0.0)
            tau_p = jnp.maximum(opt.tau_min, 1.0 - st.mu)
            a_pr_a = jnp.minimum(
                jnp.minimum(_ftb_alpha(dLx, dx, mL, tau_p),
                            _ftb_alpha(dUx, -dx, mU, tau_p)),
                jnp.minimum(_ftb_alpha(dLs, ds, msL, tau_p),
                            _ftb_alpha(dUs, -ds, msU, tau_p)))
            a_du_a = jnp.minimum(
                jnp.minimum(_ftb_alpha(zL, dzLa, mL, tau_p),
                            _ftb_alpha(zU, dzUa, mU, tau_p)),
                jnp.minimum(_ftb_alpha(wL, dwLa, msL, tau_p),
                            _ftb_alpha(wU, dwUa, msU, tau_p)))
            a_aff = jnp.minimum(a_pr_a, a_du_a)
            msum = lambda mk, v: jnp.sum(jnp.where(mk, v, 0.0))
            comp0 = (msum(mL, zL * dLx) + msum(mU, zU * dUx)
                     + msum(msL, wL * dLs) + msum(msU, wU * dUs))
            comp_aff = (
                msum(mL, (zL + a_aff * dzLa) * (dLx + a_aff * dx))
                + msum(mU, (zU + a_aff * dzUa) * (dUx - a_aff * dx))
                + msum(msL, (wL + a_aff * dwLa) * (dLs + a_aff * ds))
                + msum(msU, (wU + a_aff * dwUa) * (dUs - a_aff * ds)))
            mu_avg = jnp.maximum(comp0 / n_comp, 1e-300)
            mu_aff = jnp.maximum(comp_aff, 0.0) / n_comp
            sigma_p = jnp.clip((mu_aff / mu_avg) ** 3, 1e-4, 1.0)
            # DOWNWARD-ONLY probe: when the affine step cannot travel
            # (nonconvex far-from-feasible phase) sigma -> 1 and
            # sigma * mu_avg is the CURRENT complementarity average,
            # which can sit far above the carried mu; adopting it
            # creates a mu <-> dual-growth feedback loop (observed:
            # mu ratcheted to 1e2, |y| to 1e8 on the variable-h
            # swing-up).  The probe's value is skipping the monotone
            # ladder's descent, so it may only accelerate mu DOWN;
            # increases stay the business of the restoration kick.
            mu_ad = jnp.minimum(
                jnp.maximum(sigma_p * mu_avg, opt.tol / 11.0), st.mu)
            # a direction the quality gate rejected outright gives a
            # meaningless probe (dx = 0 -> mu_aff = mu_avg): hold mu
            mu_ad = jnp.where(dir_bad, st.mu, mu_ad)
            mu = jnp.where(gn, st.mu,
                           jnp.where(free_lane, mu_ad, mu_mono))
        else:
            mu = mu_mono
        tau = jnp.maximum(opt.tau_min, 1.0 - mu) if adaptive \
            else tau_mono

        # centered residuals at the final mu (for monotone lanes these
        # equal the ladder rhs, so the re-solve below is skipped)
        rx = -(g + Jty - mu * iLx + mu * iUx)
        rx = jnp.where(fixed, 0.0, rx)
        rhs_s = -(-y - mu * iLs + mu * iUs)
        rhs_s = jnp.where(eq, 0.0, rhs_s)
        rc = -(c - s) + Ds * rhs_s

        if adaptive:
            # corrector: centered solve with the SAME factorization
            rx_m2 = jnp.where(gn, rx_rest, rx)
            rc_m2 = jnp.where(gn, rc_rest, rc)
            dx_c, dy_c, _ = fns.kkt_apply(fac_used, rx_m2, rc_m2)
            dx_c = jnp.where(fixed, 0.0, dx_c)
            ds_c = jnp.where(eq, 0.0, Ds * (dy_c + rhs_s))
            fin_c = (jnp.all(jnp.isfinite(dx_c))
                     & jnp.all(jnp.isfinite(dy_c)))
            use_c = free_lane & fin_c & ~gn & ~dir_bad
            dx = jnp.where(use_c, dx_c, dx)
            dy = jnp.where(use_c, dy_c, dy)
            ds = jnp.where(use_c, ds_c, ds)

        # filter reset on barrier change (Waechter-Biegler reset on
        # monotone reduction; adaptive lanes reset on any material mu
        # move since stored phi entries were measured at the old mu)
        if adaptive:
            mu_reset = mu_shrunk | (jnp.abs(mu - st.mu) > 0.05 * st.mu)
        else:
            mu_reset = mu_shrunk
        ft0, fp0, fc0 = fresh_filter(theta_max)
        f_theta = jnp.where(mu_reset, ft0, st.f_theta)
        f_phi = jnp.where(mu_reset, fp0, st.f_phi)
        f_count = jnp.where(mu_reset, fc0, st.f_count)

        # ================================================================
        # branch 1: regular filter-IPM step
        # ================================================================
        def ipm_branch(_):
            # -- fraction to boundary ------------------------------------
            a_pr_max = jnp.minimum(
                jnp.minimum(_ftb_alpha(dLx, dx, mL, tau),
                            _ftb_alpha(dUx, -dx, mU, tau)),
                jnp.minimum(_ftb_alpha(dLs, ds, msL, tau),
                            _ftb_alpha(dUs, -ds, msU, tau)))

            # -- filter line search --------------------------------------
            # phi/theta at the current point from the CARRIED residual
            # c (exact at x): saves one constraints eval per iteration
            # over calling barrier_phi(x, s, mu)
            slog = lambda d: jnp.sum(jnp.log(jnp.maximum(d, 1e-30)))
            bar0 = slog(dLx) + slog(dUx) + slog(dLs) + slog(dUs)
            # dLx/dUx/dLs/dUs are already masked to 1.0 off-mask
            okb0 = (jnp.all(dLx > 0) & jnp.all(dUx > 0)
                    & jnp.all(dLs > 0) & jnp.all(dUs > 0))
            phi0 = jnp.where(okb0, fns.objective(x) - mu * bar0, jnp.inf)
            theta0 = theta_now
            gphi_x = g - mu * iLx + mu * iUx
            gphi_s = -mu * iLs + mu * iUs
            Dphi = jnp.dot(gphi_x, dx) + jnp.dot(gphi_s, ds)

            neg = Dphi < 0
            amin_sw = jnp.minimum(
                opt.gamma_theta,
                jnp.minimum(
                    opt.gamma_phi * theta0 / jnp.maximum(-Dphi, 1e-30),
                    opt.delta_switch * theta0 ** opt.s_theta
                    / jnp.maximum((-Dphi) ** opt.s_phi, 1e-30)))
            amin_ne = jnp.minimum(opt.gamma_theta,
                                  opt.gamma_phi * theta0
                                  / jnp.maximum(-Dphi, 1e-30))
            alpha_min = opt.gamma_alpha * jnp.where(
                neg & (theta0 <= theta_min), amin_sw,
                jnp.where(neg, amin_ne, opt.gamma_theta))

            step_small = jnp.max(
                jnp.abs(jnp.concatenate([dx, ds]))
                / (1.0 + jnp.abs(jnp.concatenate([x, s])))
            ) < 10.0 * eps_mach

            fslots = jnp.arange(_FILTER_SIZE)

            def filter_ok_fn(theta_t, phi_t):
                valid = fslots < f_count
                ok_each = (theta_t < f_theta) | (phi_t < f_phi)
                return jnp.all(ok_each | ~valid)

            def trial_point(alpha, dxx, dss):
                """phi, theta and the raw constraint residual at a
                trial point — ONE constraints evaluation shared by the
                filter tests, the theta comparison and the SOC
                residual (previously three separate evals)."""
                xt = x + alpha * dxx
                st_ = s + alpha * dss
                dL1 = jnp.where(mL, xt - xl, 1.0)
                dU1 = jnp.where(mU, xu - xt, 1.0)
                dL2 = jnp.where(msL, st_ - cl, 1.0)
                dU2 = jnp.where(msU, cu - st_, 1.0)
                okt = (jnp.all(dL1 > 0) & jnp.all(dU1 > 0)
                       & jnp.all(dL2 > 0) & jnp.all(dU2 > 0))
                bar = slog(dL1) + slog(dU1) + slog(dL2) + slog(dU2)
                rt = fns.constraints(xt) - st_
                phi_t = jnp.where(okt, fns.objective(xt) - mu * bar,
                                  jnp.inf)
                return phi_t, jnp.sum(jnp.abs(rt)), rt

            def accept_tests(alpha, dxx, dss, phi_t, theta_t):
                f_ok = filter_ok_fn(theta_t, phi_t)
                Dphi_d = jnp.dot(gphi_x, dxx) + jnp.dot(gphi_s, dss)
                sw = (Dphi_d < 0) & (alpha * (-Dphi_d) ** opt.s_phi
                                     > opt.delta_switch
                                     * theta0 ** opt.s_theta)
                armijo = phi_t <= phi0 + opt.eta_phi * alpha * Dphi_d \
                    + 10.0 * eps_mach * jnp.abs(phi0)
                curr_ok = ((theta_t <= (1.0 - opt.gamma_theta) * theta0)
                           | (phi_t <= phi0 - opt.gamma_phi * theta0))
                ftype = (theta0 <= theta_min) & sw
                return f_ok & jnp.where(ftype, armijo, curr_ok), \
                    ftype & armijo

            def try_dir(alpha, dxx, dss):
                phi_t, theta_t, _ = trial_point(alpha, dxx, dss)
                return accept_tests(alpha, dxx, dss, phi_t, theta_t)

            phi_t1, theta_t1, r_trial1 = trial_point(a_pr_max, dx, ds)
            acc1, ftype1 = accept_tests(a_pr_max, dx, ds, phi_t1,
                                        theta_t1)
            acc1 = (acc1 | step_small) & ~dir_bad

            # -- second-order correction (Ipopt A-5.7) -------------------
            def soc_branch(_):
                # r_trial1 was already evaluated for the filter test
                # of the full step — no extra constraints eval here
                c_soc = a_pr_max * (c - s) + r_trial1
                rc_soc = -c_soc + Ds * rhs_s
                # reuse the accepted direction's factorization: the SOC
                # matrix is identical, only the rhs changed
                if fns.kkt_apply_soc is not None:
                    dxx, dyy = fns.kkt_apply_soc(fac_used, rx, rc_soc)
                else:
                    dxx, dyy, _ = fns.kkt_apply(fac_used, rx, rc_soc)
                dxx = jnp.where(fixed, 0.0, dxx)
                dss = Ds * (dyy + rhs_s)
                dss = jnp.where(eq, 0.0, dss)
                fin = jnp.all(jnp.isfinite(dxx)) \
                    & jnp.all(jnp.isfinite(dyy))
                dxx = jnp.where(fin, dxx, 0.0)
                dyy = jnp.where(fin, dyy, 0.0)
                dss = jnp.where(fin, dss, 0.0)
                return dxx, dyy, dss, fin

            def no_soc(_):
                return (jnp.zeros_like(dx), jnp.zeros_like(dy),
                        jnp.zeros_like(ds), jnp.asarray(False))

            want_soc = (~acc1) & (theta_t1 >= theta0) & ~dir_bad
            dx_soc, dy_soc, ds_soc, soc_fin = jax.lax.cond(
                want_soc, soc_branch, no_soc, operand=None)

            a_soc = jnp.minimum(
                jnp.minimum(_ftb_alpha(dLx, dx_soc, mL, tau),
                            _ftb_alpha(dUx, -dx_soc, mU, tau)),
                jnp.minimum(_ftb_alpha(dLs, ds_soc, msL, tau),
                            _ftb_alpha(dUs, -ds_soc, msU, tau)))
            acc_soc, ftype_soc = try_dir(a_soc, dx_soc, ds_soc)
            acc_soc = acc_soc & soc_fin & want_soc

            # -- backtracking fallback -----------------------------------
            def ls_cond(carry):
                alpha, j, accepted, _ = carry
                return (~accepted) & (j < opt.max_ls) & (alpha >= alpha_min)

            def ls_body(carry):
                alpha, j, _, _ = carry
                acc, is_ftype = try_dir(alpha, dx, ds)
                acc = acc | step_small
                alpha_new = jnp.where(acc, alpha, alpha * 0.5)
                return alpha_new, j + 1, acc, is_ftype

            # the loop starts pre-accepted when the full step or the
            # SOC step already passed: zero trial evaluations then
            # (under vmap the trip count is the max over lanes, so an
            # always-run first trip taxes every converged-lane batch)
            alpha_bt, _, acc_bt, ftype_bt = jax.lax.while_loop(
                ls_cond, ls_body,
                (a_pr_max * 0.5, jnp.asarray(1, jnp.int32),
                 acc1 | acc_soc, jnp.asarray(False)))
            acc_bt = acc_bt & ~(acc1 | acc_soc) & ~dir_bad

            use_soc = (~acc1) & acc_soc
            use_bt = (~acc1) & (~use_soc) & acc_bt
            accepted = acc1 | use_soc | use_bt
            alpha = jnp.where(acc1, a_pr_max,
                              jnp.where(use_soc, a_soc,
                                        jnp.where(use_bt, alpha_bt, 0.0)))
            dx_f = jnp.where(use_soc, dx_soc, dx)
            dy_f = jnp.where(use_soc, dy_soc, dy)
            ds_f = jnp.where(use_soc, ds_soc, ds)
            was_ftype = jnp.where(acc1, ftype1,
                                  jnp.where(use_soc, ftype_soc, ftype_bt))

            # dual directions & step
            dzL = jnp.where(mL, mu * iLx - zL - SigL * dx_f, 0.0)
            dzU = jnp.where(mU, mu * iUx - zU + SigU * dx_f, 0.0)
            dwL = jnp.where(msL, mu * iLs - wL - SigsL * ds_f, 0.0)
            dwU = jnp.where(msU, mu * iUs - wU + SigsU * ds_f, 0.0)
            a_du = jnp.minimum(
                jnp.minimum(_ftb_alpha(zL, dzL, mL, tau),
                            _ftb_alpha(zU, dzU, mU, tau)),
                jnp.minimum(_ftb_alpha(wL, dwL, msL, tau),
                            _ftb_alpha(wU, dwU, msU, tau)))

            x_n = x + alpha * dx_f
            s_n = s + alpha * ds_f
            y_n = y + alpha * dy_f
            zL_n = zL + a_du * dzL
            zU_n = zU + a_du * dzU
            wL_n = wL + a_du * dwL
            wU_n = wU + a_du * dwU

            # filter augmentation for accepted non-f-type steps
            augment = accepted & ~was_ftype & ~step_small
            slot = jnp.minimum(f_count, _FILTER_SIZE - 1)
            fth = jnp.where(augment, f_theta.at[slot].set(
                (1.0 - opt.gamma_theta) * theta0), f_theta)
            fph = jnp.where(augment, f_phi.at[slot].set(
                phi0 - opt.gamma_phi * theta0), f_phi)
            fcn = jnp.where(augment,
                            jnp.minimum(f_count + 1, _FILTER_SIZE - 1),
                            f_count)

            # -- restoration triggers ------------------------------------
            # (a) line search failed; (b) theta stagnates far from
            # feasibility; (c) duals blow up (degenerate subproblem)
            stall = (theta0 > 1e3 * theta_min) & \
                (theta0 > 0.9995 * st.theta_prev)
            stall_count = jnp.where(accepted & stall,
                                    st.stall_count + 1, 0)
            y_blown = jnp.max(jnp.abs(y_n)) > 1e10
            # A failed line search always leaves the regular branch —
            # even near-feasible (theta0 <= theta_min), where Ipopt
            # terminates or restores rather than spin with alpha = 0:
            # the restoration branch then exits immediately, resetting
            # the filter and recentering the multipliers (a soft
            # restart), and rest_total caps how often that can recur.
            enter_rest = (~accepted) | (((stall_count >= 25) | y_blown)
                                        & (theta0 > theta_min))
            # on entry reset the equality multipliers (they are
            # re-estimated after restoration)
            y_n = jnp.where(enter_rest & y_blown, 0.0, y_n)

            return (x_n, s_n, y_n, zL_n, zU_n, wL_n, wU_n,
                    fth, fph, fcn, enter_rest,
                    jnp.where(enter_rest, theta0, st.rest_theta),
                    st.rest_lam, delta_w_used, delta_c, alpha,
                    stall_count, jnp.asarray(False), mu, st.mu_R)

        # ================================================================
        # branch 2: feasibility restoration step
        # ================================================================
        def rest_branch(_):
            x_r, s_r, reduced, lam_n, feas_grad, theta_r = \
                restoration_step(st.in_rest)
            # local-infeasibility certificate: the feasibility problem
            # is first-order stationary at theta > 0
            certified = (feas_grad <= 1e-6 * jnp.maximum(1.0, theta_r)) \
                & (theta_r > theta_min)
            # stalled progress at the current smoothing first SHARPENS
            # the elastic L1 (mu_R x0.2 toward its floor); only a stall
            # at the floor counts toward the stuck exit
            no_prog = theta_r > 0.999 * theta_now
            mu_floor = jnp.maximum(mu, opt.tol)
            sharpen = no_prog & (mu_R > 1.001 * mu_floor)
            mu_R_n = jnp.where(sharpen,
                               jnp.maximum(0.2 * mu_R, mu_floor), mu_R)
            stall_r = jnp.where(no_prog & ~sharpen, st.stall_count + 1,
                                jnp.asarray(0, jnp.int32))
            stuck = ((~reduced) & ~sharpen) | (stall_r >= 10)
            # exit on success, or force exit back to the IPM when
            # restoration stalls without an infeasibility certificate
            exit_now = ((theta_r <= jnp.maximum(
                opt.rest_reduction * st.rest_theta, theta_min))
                | (theta_r <= opt.tol)
                | (stuck & ~certified))
            rest_failed = stuck & certified
            # mu kick: the GN restoration stalled far from feasibility
            # WITHOUT an infeasibility certificate — the regular
            # barrier problem is wedged (observed: tiny filter steps at
            # mu = 0.1 ping-pong with stalled restoration until the
            # budget dies, while the same problem solves cleanly from
            # mu = 1).  Re-center on a stronger barrier before handing
            # control back — the analog of Ipopt's restoration-phase mu
            # re-initialization.  Never fires near feasibility, so
            # warm-started solves keep their tiny mu.
            kick = stuck & ~certified & (theta_r > 1e2 * theta_min)
            mu_out = jnp.where(kick, jnp.minimum(10.0 * mu, 10.0), mu)

            dLx_e = jnp.where(mL, x_r - xl, 1.0)
            dUx_e = jnp.where(mU, xu - x_r, 1.0)
            dLs_e = jnp.where(msL, s_r - cl, 1.0)
            dUs_e = jnp.where(msU, cu - s_r, 1.0)
            # exit: reset equality multipliers, recenter bound duals
            y_n = jnp.where(exit_now, 0.0, y)
            zL_n = jnp.where(exit_now, jnp.where(mL, mu_out / dLx_e, 0.0),
                             zL)
            zU_n = jnp.where(exit_now, jnp.where(mU, mu_out / dUx_e, 0.0),
                             zU)
            wL_n = jnp.where(exit_now, jnp.where(msL, mu_out / dLs_e, 0.0),
                             wL)
            wU_n = jnp.where(exit_now, jnp.where(msU, mu_out / dUs_e, 0.0),
                             wU)

            ftf, fpf, fcf = fresh_filter(theta_max)
            # Cap the re-admitted infeasibility at a multiple of the
            # restored level: a bare (theta_max, -inf) filter lets the
            # next phi-improving steps blow theta right back up
            # (observed: theta 44 -> 3.8e4 in four accepted steps on
            # the 9-link chain), which defeats the restoration.
            cap = jnp.minimum(jnp.maximum(10.0 * theta_r,
                                          1e2 * theta_min), theta_max)
            ftf = ftf.at[1].set(cap)
            fpf = fpf.at[1].set(-jnp.inf)
            fcf = jnp.asarray(2, jnp.int32)
            fth = jnp.where(exit_now, ftf, f_theta)
            fph = jnp.where(exit_now, fpf, f_phi)
            fcn = jnp.where(exit_now, fcf, f_count)

            in_rest_next = ~exit_now
            return (x_r, s_r, y_n, zL_n, zU_n, wL_n, wU_n,
                    fth, fph, fcn, in_rest_next, st.rest_theta,
                    lam_n, st.delta_w, st.delta_c,
                    jnp.asarray(0.0, dtype), stall_r, rest_failed,
                    mu_out, mu_R_n)

        (x_n, s_n, y_n, zL_n, zU_n, wL_n, wU_n, f_theta, f_phi, f_count,
         in_rest, rest_theta, rest_lam, delta_w, delta_c, alpha,
         stall_count, rest_failed, mu, mu_R_next) = jax.lax.cond(
            st.in_rest, rest_branch, ipm_branch, operand=None)

        rest_total = st.rest_total + jnp.asarray(st.in_rest, jnp.int32)

        # -- Ipopt kappa_sigma multiplier safeguard ----------------------
        dLx_n = jnp.where(mL, x_n - xl, 1.0)
        dUx_n = jnp.where(mU, xu - x_n, 1.0)
        dLs_n = jnp.where(msL, s_n - cl, 1.0)
        dUs_n = jnp.where(msU, cu - s_n, 1.0)
        kS = opt.kappa_sigma
        clipz = lambda z, d, mk: jnp.where(
            mk, jnp.clip(z, mu / (kS * jnp.maximum(d, 1e-30)),
                         kS * mu / jnp.maximum(d, 1e-30)), 0.0)
        zL_n = clipz(zL_n, dLx_n, mL)
        zU_n = clipz(zU_n, dUx_n, mU)
        wL_n = clipz(wL_n, dLs_n, msL)
        wU_n = clipz(wU_n, dUs_n, msU)

        # -- convergence tests -------------------------------------------
        g_n, c_n, Jty_n = eval_point(x_n, y_n)
        E0, inf_pr, inf_du = optimality_error_from(
            g_n, c_n, Jty_n, x_n, s_n, y_n, zL_n, zU_n, wL_n, wU_n,
            jnp.asarray(0.0, dtype))
        converged = (E0 <= opt.tol) & ~in_rest
        acceptable = (E0 <= opt.acceptable_tol) & ~in_rest
        # Hysteresis on the acceptable counter: near a rounding-limited
        # optimality floor E0 hovers just around acceptable_tol (solve
        # noise), and Ipopt's strict consecutive count would reset on
        # every small excursion; hold the count (without incrementing)
        # for excursions within 10x and reset only on real divergence.
        excursion = (E0 <= 10.0 * opt.acceptable_tol) & ~in_rest
        accept_count = jnp.where(
            acceptable, st.accept_count + 1,
            jnp.where(excursion, st.accept_count,
                      jnp.asarray(0, jnp.int32)))
        acc_done = accept_count >= opt.acceptable_iter

        bad = ~(jnp.all(jnp.isfinite(x_n)) & jnp.all(jnp.isfinite(y_n))
                & jnp.all(jnp.isfinite(s_n)))
        theta_new = jnp.sum(jnp.abs(c_n - s_n))
        infeasible = rest_failed & (theta_new > theta_min)
        rest_exhausted = rest_total >= opt.max_rest_iters

        status = jnp.where(
            converged, SOLVE_SUCCEEDED,
            jnp.where(acc_done, SOLVED_TO_ACCEPTABLE_LEVEL,
                      jnp.where(bad, INVALID_NUMBER_DETECTED,
                                jnp.where(infeasible,
                                          INFEASIBLE_PROBLEM_DETECTED,
                                          jnp.where(rest_exhausted,
                                                    RESTORATION_FAILED,
                                                    st.status)))))
        done = converged | acc_done | bad | infeasible | rest_exhausted

        keep_old = bad
        sel = lambda new, old: jnp.where(keep_old, old, new)

        obj_history = st.obj_history.at[st.it].set(fns.objective(x_n))

        if opt.trace:
            jax.debug.print(
                'it={it} mu={mu:.2e} pr={pr:.2e} du={du:.2e} dw={dw:.1e} '
                'al={al:.1e} rest={rs} th={th:.2e} |y|={ym:.1e} '
                'E0={e0:.2e}',
                it=st.it, mu=mu, pr=inf_pr, du=inf_du, dw=delta_w,
                al=alpha, rs=in_rest, th=theta_new,
                ym=jnp.max(jnp.abs(y_n)), e0=E0)

        # elastic-restoration init on FRESH entry: prox center is the
        # entering iterate, the restoration barrier starts at the
        # infeasibility scale (W-B: mu_R = max(mu, ||c||_inf)), the
        # prox multiplier resets
        fresh_entry = in_rest & ~st.in_rest
        x_R_n = jnp.where(fresh_entry, x_n, st.x_R)
        mu_R_n = jnp.where(fresh_entry,
                           jnp.minimum(jnp.maximum(mu, inf_pr), 1e2),
                           mu_R_next)
        rest_lam_n = jnp.where(fresh_entry, 1.0, rest_lam)

        return _State(
            x=sel(x_n, x), s=sel(s_n, s), y=sel(y_n, y),
            zL=sel(zL_n, zL), zU=sel(zU_n, zU),
            wL=sel(wL_n, wL), wU=sel(wU_n, wU),
            mu=mu, delta_w=delta_w, delta_c=delta_c,
            f_theta=f_theta, f_phi=f_phi, f_count=f_count,
            in_rest=in_rest, rest_theta=rest_theta, rest_total=rest_total,
            rest_lam=rest_lam_n, theta_prev=theta_now,
            stall_count=stall_count,
            theta_min=theta_min, theta_max=theta_max,
            # adaptive-mode globalization: a lane whose line search
            # failed (restoration entry) walks the monotone ladder for
            # the rest of its solve
            mono=st.mono | fresh_entry,
            it=st.it + 1, status=status, done=done,
            accept_count=accept_count,
            obj_history=obj_history, inf_pr=inf_pr, inf_du=inf_du,
            alpha_last=alpha, E_last=E0, E_prev=st.E_last,
            g=sel(g_n, g), c=sel(c_n, c), Jty=sel(Jty_n, Jty),
            x_R=x_R_n, mu_R=mu_R_n)

    ft_i, fp_i, fc_i = fresh_filter(theta_max_init)
    g_i, c_i, Jty_i = eval_point(x_init, y_init)
    st0 = _State(
        x=x_init, s=s_init, y=y_init, zL=zL_init, zU=zU_init,
        wL=wL_init, wU=wU_init,
        mu=jnp.asarray(opt.mu_init, dtype),
        delta_w=jnp.asarray(0.0, dtype),
        delta_c=jnp.asarray(0.0, dtype),
        f_theta=ft_i, f_phi=fp_i, f_count=fc_i,
        in_rest=jnp.asarray(False),
        rest_theta=jnp.asarray(0.0, dtype),
        rest_total=jnp.asarray(0, jnp.int32),
        rest_lam=jnp.asarray(1.0, dtype),
        theta_prev=jnp.asarray(jnp.inf, dtype),
        stall_count=jnp.asarray(0, jnp.int32),
        it=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(MAXIMUM_ITERATIONS_EXCEEDED, jnp.int32),
        done=jnp.asarray(False),
        accept_count=jnp.asarray(0, jnp.int32),
        obj_history=jnp.full((opt.max_iter,), jnp.nan, dtype),
        inf_pr=jnp.asarray(jnp.inf, dtype),
        inf_du=jnp.asarray(jnp.inf, dtype),
        alpha_last=jnp.asarray(0.0, dtype),
        E_last=jnp.asarray(jnp.inf, dtype),
        E_prev=jnp.asarray(jnp.inf, dtype),
        theta_min=theta_min_init, theta_max=theta_max_init,
        mono=jnp.asarray(False),
        g=g_i, c=c_i, Jty=Jty_i,
        x_R=x_init, mu_R=jnp.asarray(opt.mu_init, dtype))
    if resume_state is not None:
        if refill is None:
            st0 = resume_state
        else:
            # lane refill: keep the freshly initialized state where
            # ``refill`` is set, the carried state elsewhere
            st0 = jax.tree.map(
                lambda fresh, carried: jnp.where(refill, fresh, carried),
                st0, resume_state)

    if opt.debug:
        st = st0
        while bool(cond(st)):
            st = body(st)
            print('it={:4d} mu={:9.2e} inf_pr={:9.2e} inf_du={:9.2e} '
                  'dw={:8.1e} dc={:8.1e} rest={:d}/{:3d} alpha={:8.1e} '
                  'nf={:2d} |y|={:9.2e} obj={:12.5e}'.format(
                      int(st.it), float(st.mu), float(st.inf_pr),
                      float(st.inf_du), float(st.delta_w),
                      float(st.delta_c), int(st.in_rest),
                      int(st.rest_total), float(st.alpha_last),
                      int(st.f_count),
                      float(jnp.max(jnp.abs(st.y))),
                      float(st.obj_history[st.it - 1])))
    else:
        st = jax.lax.while_loop(cond, body, st0)

    # honor_original_bounds: the internally relaxed bounds allow up to
    # brf relative violation; project the reported solution back
    x_out = jnp.clip(st.x, xl_orig, xu_orig)
    result = IPMResult(
        x=x_out, obj_val=fns.objective(x_out), g=fns.constraints(x_out),
        mult_g=st.y, mult_x_L=st.zL, mult_x_U=st.zU,
        status=st.status, iterations=st.it, obj_history=st.obj_history,
        inf_pr=st.inf_pr, inf_du=st.inf_du, mu=st.mu)
    if return_state:
        return result, st
    return result


def make_nlp_functions_dense(objective, constraints,
                             hessian_approximation='exact'):
    """Dense-KKT IPMFunctions for small generic NLPs.

    Builds the Lagrangian Hessian with ``jax.hessian`` and solves the
    condensed system with a dense factorization.  Used for small
    problems and for cross-checking the structured collocation path.
    """
    grad = jax.grad(objective)
    jac = jax.jacrev(constraints)

    def kkt_prepare(x, y):
        def lag(xx):
            return objective(xx) + jnp.dot(y, constraints(xx))

        return jax.hessian(lag)(x), jac(x)

    def _assemble(H, J, sigma_x, ds):
        n = sigma_x.shape[0]
        m = ds.shape[0]
        dtype = sigma_x.dtype
        K = jnp.zeros((n + m, n + m), dtype)
        K = K.at[:n, :n].set(H + jnp.diag(sigma_x))
        K = K.at[:n, n:].set(J.T)
        K = K.at[n:, :n].set(J)
        K = K.at[n:, n:].set(-jnp.diag(ds))
        return K

    def kkt_factor(prep, sigma_x, ds, gn_mask=None):
        H, J = prep
        if gn_mask is not None:
            # Gauss-Newton mode (restoration lanes): drop the Hessian
            H = jnp.where(gn_mask, 0.0, H)
        return _assemble(H, J, sigma_x, ds)

    def kkt_apply(K, rx, rc):
        n = rx.shape[0]
        r = jnp.concatenate([rx, rc])
        sol = jnp.linalg.solve(K, r)
        resid = (jnp.linalg.norm(K @ sol - r)
                 / jnp.maximum(jnp.linalg.norm(r), 1e-300))
        return sol[:n], sol[n:], resid

    def kkt_solve(prep, sigma_x, ds, rx, rc):
        return kkt_apply(kkt_factor(prep, sigma_x, ds), rx, rc)

    def kkt_solve_feasibility(prep, sigma_x, rc):
        _, J = prep
        K = _assemble(jnp.zeros_like(prep[0]), J, sigma_x,
                      jnp.ones_like(rc))
        sol = jnp.linalg.solve(
            K, jnp.concatenate([jnp.zeros_like(sigma_x), rc]))
        n = sigma_x.shape[0]
        return sol[:n], sol[n:]

    return IPMFunctions(objective=objective, gradient=grad,
                        constraints=constraints, kkt_prepare=kkt_prepare,
                        kkt_factor=kkt_factor, kkt_apply=kkt_apply,
                        kkt_solve=kkt_solve,
                        kkt_solve_feasibility=kkt_solve_feasibility)
