"""Batched primal-dual interior-point NLP solver in pure JAX.

Replaces Ipopt + cyipopt in the reference stack
(opty/direct_collocation.py:93 subclasses ``cyipopt.Problem``; the
result-dict contract is documented at :290-311).  The algorithm follows
Ipopt's design (Waechter & Biegler, Math. Prog. 106, 2006):

  * barrier parameter: Mehrotra-style adaptive probing by default (an
    affine predictor solved with the iteration's factorization picks
    mu; Ipopt ``mu_oracle=probing``/Nocedal-Waechter-Waltz 2008), with
    per-lane fallback to the monotone Fiacco-McCormick ladder once a
    line search fails OR progress stalls (see
    IPMOptions.stall_window); or pure monotone mode via
    ``mu_strategy='monotone'``;
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

The per-iteration stages live as pure, unit-tested functions in
nlp/steps.py; this module owns initialization, the iteration loop, and
the result contract.
"""

import jax
import jax.numpy as jnp

from . import steps
from .ipm_types import (IPMFunctions, IPMOptions, IPMResult, IPMState,
                        Spec)
from .status import (INFEASIBLE_PROBLEM_DETECTED, INVALID_NUMBER_DETECTED,
                     MAXIMUM_ITERATIONS_EXCEEDED, RESTORATION_FAILED,
                     SOLVE_SUCCEEDED, SOLVED_TO_ACCEPTABLE_LEVEL)

__all__ = ['IPMOptions', 'IPMFunctions', 'IPMResult', 'solve_ipm',
           'make_nlp_functions_dense']

_State = IPMState  # internal alias (resume_state payloads use this)


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
    free_row = ~eq & ~msL & ~msU

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

    spec = Spec(opt=opt, xl=xl, xu=xu, cl=cl, cu=cu, fixed=fixed,
                mL=mL, mU=mU, eq=eq, msL=msL, msU=msU,
                free_row=free_row, n_comp=n_comp, n_duals=n_duals)
    adaptive = opt.mu_strategy == 'adaptive'

    # ---- initialization -------------------------------------------------
    x_init = jnp.where(fixed, xl, steps.push_inside(
        x0, xl, xu, has_xl, has_xu, opt.bound_push, opt.bound_frac))
    c0 = fns.constraints(x_init)
    s_init = jnp.where(eq, cl, steps.push_inside(
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
        sigma0 = jnp.ones((n,), dtype) + \
            jnp.where(fixed, steps.BIG_SIGMA, 0.0)
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
        mu_mono, tau_mono, mu_shrunk = steps.monotone_barrier_update(
            spec, st.mu, g, c, Jty, x, s, y, zL, zU, wL, wU)

        theta_now = jnp.sum(jnp.abs(c - s))

        # iteration-constant KKT data (Jacobian + Hessian blocks),
        # shared by direction retries and SOC
        prep = fns.kkt_prepare(x, y)

        # -- barrier diagonals and residuals -----------------------------
        diag = steps.barrier_diagonals(spec, x, s, zL, zU, wL, wU)

        # The direction ("ladder") rhs: monotone lanes solve the
        # centered system at mu_mono directly; adaptive free-mode lanes
        # solve the AFFINE (mu = 0) predictor first — the probe that
        # chooses this iteration's mu — and re-solve the centered rhs
        # with the same factorization afterwards (Mehrotra).
        if adaptive:
            free_lane = (~st.mono) & (n_duals > 0)
            mu_lad = jnp.where(free_lane, 0.0, mu_mono)
        else:
            mu_lad = mu_mono
        rx_lad = -(g + Jty - mu_lad * diag.iLx + mu_lad * diag.iUx)
        rx_lad = jnp.where(fixed, 0.0, rx_lad)
        rhs_s_lad = -(-y - mu_lad * diag.iLs + mu_lad * diag.iUs)
        rhs_s_lad = jnp.where(eq, 0.0, rhs_s_lad)
        rc_lad = -(c - s) + diag.Ds * rhs_s_lad

        # -- direction with inertia-free curvature correction ---------
        (dx, dy, ds, fac_used, delta_w_used, delta_c,
         dir_ok) = steps.regularized_direction(
            spec, fns, x, y, prep, rx_lad, rc_lad,
            diag.Ds, rhs_s_lad, diag.sigma_x, diag.sigma_s,
            st.delta_w, st.alpha_last, st.E_last, st.E_prev,
            st.accept_count, st.mu)
        dir_bad = ~dir_ok

        # -- Mehrotra probing mu + centered corrector re-solve ----------
        if adaptive:
            mu_ad = steps.mehrotra_probe(spec, diag, zL, zU, wL, wU,
                                         dx, ds, st.mu, dir_bad)
            mu = jnp.where(free_lane, mu_ad, mu_mono)
        else:
            mu = mu_mono
        tau = jnp.maximum(opt.tau_min, 1.0 - mu) if adaptive \
            else tau_mono

        # centered residuals at the final mu (for monotone lanes these
        # equal the ladder rhs, so the re-solve below is skipped)
        rx = -(g + Jty - mu * diag.iLx + mu * diag.iUx)
        rx = jnp.where(fixed, 0.0, rx)
        rhs_s = -(-y - mu * diag.iLs + mu * diag.iUs)
        rhs_s = jnp.where(eq, 0.0, rhs_s)
        rc = -(c - s) + diag.Ds * rhs_s

        if adaptive:
            # corrector: centered solve with the SAME factorization
            dx_c, dy_c, _ = fns.kkt_apply(fac_used, rx, rc)
            dx_c = jnp.where(fixed, 0.0, dx_c)
            ds_c = jnp.where(eq, 0.0, diag.Ds * (dy_c + rhs_s))
            fin_c = (jnp.all(jnp.isfinite(dx_c))
                     & jnp.all(jnp.isfinite(dy_c)))
            use_c = free_lane & fin_c & ~dir_bad
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
        ft0, fp0, fc0 = steps.fresh_filter(theta_max, dtype)
        f_theta = jnp.where(mu_reset, ft0, st.f_theta)
        f_phi = jnp.where(mu_reset, fp0, st.f_phi)
        f_count = jnp.where(mu_reset, fc0, st.f_count)

        # -- regular filter-IPM step -------------------------------------
        (x_n, s_n, y_n, zL_n, zU_n, wL_n, wU_n, f_theta_n, f_phi_n,
         f_count_n, enter_rest, alpha, stall_count) = \
            steps.filter_line_search(
                spec, fns, x, s, y, zL, zU, wL, wU, diag, g, c,
                theta_now, theta_min, mu, tau, dx, dy, ds, dir_bad,
                fac_used, rx, rhs_s, f_theta, f_phi, f_count,
                st.theta_prev, st.stall_count)

        # -- feasibility restoration (a full inner solve; W-B A-9) -------
        # Entered when the line search fails or the stall/dual-blowup
        # triggers fire; runs its own inner solver to a filter-
        # acceptable near-feasible point within this outer iteration.
        # Progressive visit deepening: the first visit uses Ipopt's
        # kappa_resto (rest_reduction, 0.9), but a visit entered soon
        # after the previous one exited means the regular phase
        # rejected the restored point's neighborhood — halve the
        # reduction goal each such re-entry (floor 0.05) so ping-pong
        # sequences dig progressively closer to feasibility.  Measured
        # (round-5 sweep): a FIXED deep goal of 0.5 solves
        # light_diffraction and quarter_car into better-than-reference
        # basins but wedges car_in_garage, while a fixed 0.9 does the
        # reverse; the adaptive schedule serves both.
        rapid = (st.it - st.last_rest_it) < 10
        kappa_eff = jnp.where(
            enter_rest & rapid,
            jnp.maximum(0.05, st.rest_depth * 0.5),
            jnp.asarray(opt.rest_reduction, dtype))
        rest_depth = jnp.where(enter_rest, kappa_eff, st.rest_depth)
        last_rest_it = jnp.where(enter_rest, st.it, st.last_rest_it)

        def rest_branch(_):
            # restoration starts from the CURRENT iterate (x, s) with
            # its carried constraint value — the point whose search
            # failed (Ipopt enters restoration exactly there); passing
            # the carried c means visit entry costs no evaluations
            ro = steps.restoration_solve(
                spec, fns, x, s, c, mu, enter_rest,
                f_theta_n, f_phi_n, f_count_n, theta_min,
                kappa=kappa_eff)
            # exit state: reset equality multipliers, recenter bound
            # duals on the (possibly kicked) barrier, fresh filter
            # with a cap on re-admitted infeasibility.  The kick is
            # capped at mu_init: uncapped (round-4's min(10 mu, 10))
            # it ratcheted 0.1 -> 1 -> 10 across failed visits on
            # light_diffraction, and a mu = 10 barrier pushed the
            # slacks so far interior that the restored feasibility was
            # destroyed (theta 140 -> 1500 in the next few steps).
            mu_o = jnp.where(
                ro.kick,
                jnp.maximum(mu, jnp.minimum(10.0 * mu, opt.mu_init)),
                mu)
            dLx_e = jnp.where(mL, ro.x - xl, 1.0)
            dUx_e = jnp.where(mU, xu - ro.x, 1.0)
            dLs_e = jnp.where(msL, ro.s - cl, 1.0)
            dUs_e = jnp.where(msU, cu - ro.s, 1.0)
            zL_r = jnp.where(mL, mu_o / dLx_e, 0.0)
            zU_r = jnp.where(mU, mu_o / dUx_e, 0.0)
            wL_r = jnp.where(msL, mu_o / dLs_e, 0.0)
            wU_r = jnp.where(msU, mu_o / dUs_e, 0.0)
            ftf, fpf, fcf = steps.fresh_filter(theta_max, dtype)
            # Cap the re-admitted infeasibility at a multiple of the
            # restored level: a bare (theta_max, -inf) filter lets the
            # next phi-improving steps blow theta right back up
            # (observed: theta 44 -> 3.8e4 in four accepted steps on
            # the 9-link chain), which defeats the restoration.
            cap = jnp.minimum(
                jnp.maximum(10.0 * ro.theta, 1e2 * theta_min),
                theta_max)
            ftf = ftf.at[1].set(cap)
            fpf = fpf.at[1].set(-jnp.inf)
            fcf = jnp.asarray(2, jnp.int32)
            return (ro.x, ro.s, jnp.zeros_like(y), zL_r, zU_r, wL_r,
                    wU_r, ftf, fpf, fcf, ro.iters, ro.certified,
                    mu_o, jnp.asarray(0.0, dtype))

        def no_rest(_):
            return (x_n, s_n, y_n, zL_n, zU_n, wL_n, wU_n,
                    f_theta_n, f_phi_n, f_count_n,
                    jnp.asarray(0, jnp.int32), jnp.asarray(False),
                    mu, delta_w_used)

        # max_rest_visit == 0 statically removes the restoration
        # program (it is by far the largest single contributor to the
        # lowered MLIR: GN factorization path + several constraint-
        # kernel copies in the merit backtracks).  Warm-started
        # benchmark configs that never restore (gait-scale wall-time
        # metric) use this to fit the remote TPU compile.
        if opt.max_rest_visit == 0:
            (x_n, s_n, y_n, zL_n, zU_n, wL_n, wU_n, f_theta_n,
             f_phi_n, f_count_n, rest_iters, rest_failed, mu,
             delta_w) = no_rest(None)
        else:
            (x_n, s_n, y_n, zL_n, zU_n, wL_n, wU_n, f_theta_n,
             f_phi_n, f_count_n, rest_iters, rest_failed, mu,
             delta_w) = jax.lax.cond(enter_rest, rest_branch, no_rest,
                                     operand=None)
        # the regular-phase theta-stall counter restarts after a
        # restoration visit, and alpha_last = 0 keeps the delta_w
        # feedback policy neutral on the fresh basin
        stall_count = jnp.where(enter_rest, 0, stall_count)
        alpha = jnp.where(enter_rest, 0.0, alpha)

        rest_total = st.rest_total + rest_iters

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
        E0, inf_pr, inf_du = steps.optimality_error(
            spec, g_n, c_n, Jty_n, x_n, s_n, y_n, zL_n, zU_n, wL_n,
            wU_n, jnp.asarray(0.0, dtype))
        converged = E0 <= opt.tol
        acceptable = E0 <= opt.acceptable_tol
        # Hysteresis on the acceptable counter: near a rounding-limited
        # optimality floor E0 hovers just around acceptable_tol (solve
        # noise), and Ipopt's strict consecutive count would reset on
        # every small excursion; hold the count (without incrementing)
        # for excursions within 10x and reset only on real divergence.
        excursion = E0 <= 10.0 * opt.acceptable_tol
        accept_count = jnp.where(
            acceptable, st.accept_count + 1,
            jnp.where(excursion, st.accept_count,
                      jnp.asarray(0, jnp.int32)))
        acc_done = accept_count >= opt.acceptable_iter

        # -- adaptive-mode stall fallback (round-3 hard-tail fix) --------
        # A probing lane that keeps getting *accepted* but moves
        # nowhere never fails its line search, so the restoration-entry
        # fallback can't fire; detect the grind directly and drop the
        # lane onto the monotone ladder, re-centering mu on its actual
        # complementarity average (the probe may have driven mu far
        # below where the duals are).
        if adaptive:
            free_stall, fall_now, E_best = steps.stall_fallback(
                spec, st.mono, enter_rest, alpha, E0, st.E_best,
                st.free_stall)
            comp_avg = steps.complementarity_average(
                spec, x_n, s_n, zL_n, zU_n, wL_n, wU_n)
            mu_fb = jnp.clip(comp_avg, opt.tol / 11.0, opt.mu_init)
            mu = jnp.where(fall_now, mu_fb, mu)
            # stored filter entries were measured at the old mu
            ftf, fpf, fcf = steps.fresh_filter(theta_max, dtype)
            f_theta_n = jnp.where(fall_now, ftf, f_theta_n)
            f_phi_n = jnp.where(fall_now, fpf, f_phi_n)
            f_count_n = jnp.where(fall_now, fcf, f_count_n)
            mono_next = st.mono | enter_rest | fall_now
        else:
            free_stall = st.free_stall
            E_best = st.E_best
            mono_next = st.mono | enter_rest

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
                al=alpha, rs=rest_iters, th=theta_new,
                ym=jnp.max(jnp.abs(y_n)), e0=E0)

        return _State(
            x=sel(x_n, x), s=sel(s_n, s), y=sel(y_n, y),
            zL=sel(zL_n, zL), zU=sel(zU_n, zU),
            wL=sel(wL_n, wL), wU=sel(wU_n, wU),
            mu=mu, delta_w=delta_w, delta_c=delta_c,
            f_theta=f_theta_n, f_phi=f_phi_n, f_count=f_count_n,
            rest_total=rest_total, rest_depth=rest_depth,
            last_rest_it=last_rest_it, theta_prev=theta_now,
            stall_count=stall_count,
            theta_min=theta_min, theta_max=theta_max,
            # adaptive-mode globalization: a lane whose line search
            # failed (restoration entry) or whose progress stalled
            # walks the monotone ladder for the rest of its solve
            mono=mono_next, free_stall=free_stall, E_best=E_best,
            it=st.it + 1, status=status, done=done,
            accept_count=accept_count,
            obj_history=obj_history, inf_pr=inf_pr, inf_du=inf_du,
            alpha_last=alpha, E_last=E0, E_prev=st.E_last,
            g=sel(g_n, g), c=sel(c_n, c), Jty=sel(Jty_n, Jty))

    ft_i, fp_i, fc_i = steps.fresh_filter(theta_max_init, dtype)
    g_i, c_i, Jty_i = eval_point(x_init, y_init)
    st0 = _State(
        x=x_init, s=s_init, y=y_init, zL=zL_init, zU=zU_init,
        wL=wL_init, wU=wU_init,
        mu=jnp.asarray(opt.mu_init, dtype),
        delta_w=jnp.asarray(0.0, dtype),
        delta_c=jnp.asarray(0.0, dtype),
        f_theta=ft_i, f_phi=fp_i, f_count=fc_i,
        rest_total=jnp.asarray(0, jnp.int32),
        rest_depth=jnp.asarray(opt.rest_reduction, dtype),
        last_rest_it=jnp.asarray(-1000, jnp.int32),
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
        free_stall=jnp.asarray(0, jnp.int32),
        E_best=jnp.asarray(jnp.inf, dtype),
        g=g_i, c=c_i, Jty=Jty_i)
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
                  'dw={:8.1e} dc={:8.1e} rest={:3d} alpha={:8.1e} '
                  'nf={:2d} mono={:d} |y|={:9.2e} obj={:12.5e}'.format(
                      int(st.it), float(st.mu), float(st.inf_pr),
                      float(st.inf_du), float(st.delta_w),
                      float(st.delta_c),
                      int(st.rest_total), float(st.alpha_last),
                      int(st.f_count), int(st.mono),
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
        inf_pr=st.inf_pr, inf_du=st.inf_du, mu=st.mu,
        rest_total=st.rest_total, mono=st.mono, delta_w=st.delta_w)
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

    def kkt_prepare_gn(x):
        J = jac(x)
        return jnp.zeros((x.shape[0], x.shape[0]), J.dtype), J

    return IPMFunctions(objective=objective, gradient=grad,
                        constraints=constraints, kkt_prepare=kkt_prepare,
                        kkt_factor=kkt_factor, kkt_apply=kkt_apply,
                        kkt_solve=kkt_solve,
                        kkt_solve_feasibility=kkt_solve_feasibility,
                        kkt_prepare_gn=kkt_prepare_gn)
