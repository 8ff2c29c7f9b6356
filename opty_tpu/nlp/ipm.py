"""Batched primal-dual interior-point NLP solver in pure JAX.

Replaces Ipopt + cyipopt in the reference stack
(opty/direct_collocation.py:93 subclasses ``cyipopt.Problem``; the
result-dict contract is documented at :290-311).  The algorithm is the
standard monotone Fiacco-McCormick barrier method with a primal-dual
Newton step, fraction-to-boundary rule, an l1-penalty merit line
search, and Ipopt-style barrier/multiplier safeguards:

  * general NLP form  min f(x)  s.t.  cl <= c(x) <= cu, xl <= x <= xu,
    equality rows expressed as cl == cu and fixed variables as
    xl == xu (both handled by masking, no row/column elimination);
  * slacks ``s`` on every constraint row; the condensed "augmented
    system"  [[H + Sigma_x, J^T], [J, -Sigma_s^{-1}]]  is handed to a
    pluggable ``kkt_solve`` callback — dense for generic NLPs, the
    block-tridiagonal-with-border solver (nlp/kkt.py) for collocation;
  * inertia-free regularization: the primal regularization delta_w is
    escalated when the merit line search fails and decayed on success
    (replacing Ipopt's inertia-correction loop, which needs an LDL^T
    inertia oracle that does not map well to batched TPU execution);
  * exact Hessians via JAX AD (the reference runs Ipopt in
    limited-memory BFGS mode because opty provides no Hessian callback;
    exact curvature is a large iteration-count win).

Everything is a pure function of arrays, so ``jax.vmap`` turns one
solver into thousands of concurrent solves per chip and ``jax.jit``
over a sharded batch scales across a TPU mesh.  Convergence flags ride
in the carried state; vmapped instances run in lockstep until all
converge (the batch analog of per-instance early exit).
"""

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .status import (INVALID_NUMBER_DETECTED, MAXIMUM_ITERATIONS_EXCEEDED,
                     RESTORATION_FAILED, SOLVE_SUCCEEDED,
                     SOLVED_TO_ACCEPTABLE_LEVEL)

__all__ = ['IPMOptions', 'IPMFunctions', 'IPMResult', 'solve_ipm',
           'make_nlp_functions_dense']

_BIG_SIGMA = 1e40


class IPMOptions(NamedTuple):
    tol: float = 1e-8
    acceptable_tol: float = 1e-6
    acceptable_iter: int = 15
    max_iter: int = 500
    mu_init: float = 0.1
    kappa_eps: float = 10.0
    kappa_mu: float = 0.2
    theta_mu: float = 1.5
    tau_min: float = 0.99
    kappa_sigma: float = 1e10
    bound_push: float = 0.01       # kappa_1
    bound_frac: float = 0.01       # kappa_2
    slack_push: float = 0.01
    armijo_eta: float = 1e-4
    max_ls: int = 25
    delta_w_init: float = 1e-8
    delta_w_max: float = 1e12
    delta_c_init: float = 1e-10
    s_max: float = 100.0


class IPMFunctions(NamedTuple):
    """Problem callbacks.  All must be JAX-traceable.

    kkt_solve(x, y, sigma_x, ds, rx, rc) solves the condensed
    primal-dual system

        [[H(x, y) + diag(sigma_x), J(x)^T], [J(x), -diag(ds)]]
            [dx; dy] = [rx; rc]

    where H is (an approximation of) the Lagrangian Hessian.
    """
    objective: Callable[[Any], Any]
    gradient: Callable[[Any], Any]
    constraints: Callable[[Any], Any]
    kkt_solve: Callable[..., Any]


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
    nu: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray
    done: jnp.ndarray
    ls_fails: jnp.ndarray
    accept_count: jnp.ndarray
    obj_history: jnp.ndarray
    inf_pr: jnp.ndarray
    inf_du: jnp.ndarray


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
              y0=None, zL0=None, zU0=None):
    """Solve the NLP from ``x0``.  Pure function: jit/vmap-friendly."""
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
    n_duals = (jnp.sum(mL) + jnp.sum(mU) + jnp.sum(msL) + jnp.sum(msU))
    n_comp = jnp.maximum(n_duals, 1.0)

    # ---- initialization -------------------------------------------------
    x_init = jnp.where(fixed, xl, _push_inside(
        x0, xl, xu, has_xl, has_xu, opt.bound_push, opt.bound_frac))
    c0 = fns.constraints(x_init)
    s_init = jnp.where(eq, cl, _push_inside(
        c0, cl, cu, has_sl, has_su, opt.slack_push, opt.bound_frac))
    y_init = jnp.zeros((m,), dtype) if y0 is None else jnp.asarray(y0, dtype)
    one = jnp.ones((), dtype)
    zL_init = (jnp.where(mL, one, 0.0) if zL0 is None
               else jnp.where(mL, jnp.asarray(zL0, dtype), 0.0))
    zU_init = (jnp.where(mU, one, 0.0) if zU0 is None
               else jnp.where(mU, jnp.asarray(zU0, dtype), 0.0))
    wL_init = jnp.where(msL, one, 0.0)
    wU_init = jnp.where(msU, one, 0.0)

    def barrier_phi(x, s, mu, nu):
        dLx = jnp.where(mL, x - xl, 1.0)
        dUx = jnp.where(mU, xu - x, 1.0)
        dLs = jnp.where(msL, s - cl, 1.0)
        dUs = jnp.where(msU, cu - s, 1.0)
        ok = (jnp.all(dLx > 0) & jnp.all(dUx > 0) & jnp.all(dLs > 0)
              & jnp.all(dUs > 0))
        safe_log = lambda d: jnp.sum(jnp.log(jnp.maximum(d, 1e-300)))
        bar = safe_log(dLx) + safe_log(dUx) + safe_log(dLs) + safe_log(dUs)
        theta = jnp.sum(jnp.abs(fns.constraints(x) - s))
        phi = fns.objective(x) - mu * bar + nu * theta
        return jnp.where(ok, phi, jnp.inf), theta

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
        sd = jnp.maximum(opt.s_max, dual_l1 / (m + n_comp)) / opt.s_max
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
    def cond(st: _State):
        return (~st.done) & (st.it < opt.max_iter)

    def body(st: _State):
        x, s, y = st.x, st.s, st.y
        zL, zU, wL, wU = st.zL, st.zU, st.wL, st.wU

        g, c, Jty = eval_point(x, y)

        # -- barrier parameter update (possibly several reductions) ------
        def mu_red(carry, _):
            mu, tau = carry
            E_mu, _, _ = optimality_error_from(
                g, c, Jty, x, s, y, zL, zU, wL, wU, mu)
            shrink = (E_mu <= opt.kappa_eps * mu) & (mu > opt.tol / 11.0)
            new_mu = jnp.maximum(opt.tol / 11.0,
                                 jnp.minimum(opt.kappa_mu * mu,
                                             mu ** opt.theta_mu))
            mu = jnp.where(shrink, new_mu, mu)
            tau = jnp.maximum(opt.tau_min, 1.0 - mu)
            return (mu, tau), None

        (mu, tau), _ = jax.lax.scan(mu_red, (st.mu, jnp.asarray(0.0, dtype)),
                                    None, length=4)

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
        # Ds = Sigma_s^{-1}; equality rows (no slack freedom) -> 0,
        # completely free rows (no finite bound at all) -> huge.
        free_row = ~eq & ~msL & ~msU
        Ds = jnp.where(eq, 0.0,
                       jnp.where(free_row, _BIG_SIGMA,
                                 1.0 / jnp.maximum(sigma_s, 1e-300)))

        rx = -(g + Jty - mu * iLx + mu * iUx)
        rx = jnp.where(fixed, 0.0, rx)
        rhs_s = -(-y - mu * iLs + mu * iUs)
        rhs_s = jnp.where(eq, 0.0, rhs_s)
        rc = -(c - s) + Ds * rhs_s

        dx, dy = fns.kkt_solve(x, y, sigma_x + st.delta_w,
                               Ds + st.delta_c, rx, rc)
        # A non-finite direction means the (possibly unregularized) KKT
        # matrix was singular: zero the step, mark the iteration as a
        # line-search failure so the delta escalation kicks in, retry.
        dir_bad = ~(jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(dy)))
        dx = jnp.where(dir_bad, 0.0, dx)
        dy = jnp.where(dir_bad, 0.0, dy)
        dx = jnp.where(fixed, 0.0, dx)
        ds = Ds * (dy + rhs_s)
        ds = jnp.where(eq, 0.0, ds)

        dzL = jnp.where(mL, mu * iLx - zL - SigL * dx, 0.0)
        dzU = jnp.where(mU, mu * iUx - zU + SigU * dx, 0.0)
        dwL = jnp.where(msL, mu * iLs - wL - SigsL * ds, 0.0)
        dwU = jnp.where(msU, mu * iUs - wU + SigsU * ds, 0.0)

        # -- fraction to boundary ----------------------------------------
        a_pr = jnp.minimum(
            jnp.minimum(_ftb_alpha(dLx, dx, mL, tau),
                        _ftb_alpha(dUx, -dx, mU, tau)),
            jnp.minimum(_ftb_alpha(dLs, ds, msL, tau),
                        _ftb_alpha(dUs, -ds, msU, tau)))
        a_du = jnp.minimum(
            jnp.minimum(_ftb_alpha(zL, dzL, mL, tau),
                        _ftb_alpha(zU, dzU, mU, tau)),
            jnp.minimum(_ftb_alpha(wL, dwL, msL, tau),
                        _ftb_alpha(wU, dwU, msU, tau)))

        # -- l1 merit line search ----------------------------------------
        nu = jnp.maximum(10.0, 2.0 * jnp.max(jnp.abs(y + dy)))
        phi0, theta0 = barrier_phi(x, s, mu, nu)
        gphi_x = g - mu * iLx + mu * iUx
        gphi_s = -mu * iLs + mu * iUs
        Dphi = (jnp.dot(gphi_x, dx) + jnp.dot(gphi_s, ds) - nu * theta0)

        # Ipopt's "tiny search direction" exit: when the primal step is
        # at machine precision, the merit comparison is pure roundoff —
        # accept the full (fraction-to-boundary) step so dual-only steps
        # can proceed.
        eps_mach = jnp.finfo(dtype).eps
        step_small = jnp.max(jnp.abs(jnp.concatenate([dx, ds]))
                             / (1.0 + jnp.abs(jnp.concatenate([x, s])))
                             ) < 10.0 * eps_mach

        def ls_cond(carry):
            alpha, j, accepted = carry
            return (~accepted) & (j < opt.max_ls)

        def ls_body(carry):
            alpha, j, _ = carry
            phi_a, _ = barrier_phi(x + alpha * dx, s + alpha * ds, mu, nu)
            ok = (phi_a <= phi0 + opt.armijo_eta * alpha * Dphi
                  + 10.0 * eps_mach * jnp.abs(phi0)) | step_small
            alpha = jnp.where(ok, alpha, alpha * 0.5)
            return alpha, j + 1, ok

        alpha, _, accepted = jax.lax.while_loop(
            ls_cond, ls_body, (a_pr, jnp.asarray(0, jnp.int32),
                               jnp.asarray(False)))
        accepted = accepted & ~dir_bad
        alpha = jnp.where(dir_bad, 0.0, alpha)

        # On failure take the tiny step anyway but escalate the
        # regularizations for the next direction (the inertia-free
        # analog of Ipopt's inertia-correction loop).
        delta_w = jnp.where(
            accepted,
            jnp.maximum(st.delta_w * 0.33, 0.0)
            * (st.delta_w > opt.delta_w_init),
            jnp.clip(jnp.maximum(st.delta_w * 10.0, 10 * opt.delta_w_init),
                     0.0, opt.delta_w_max))
        delta_c_dec = st.delta_c * 0.1
        delta_c = jnp.where(
            accepted,
            jnp.where(delta_c_dec < 1e-300, 0.0, delta_c_dec),
            jnp.clip(jnp.maximum(st.delta_c * 10.0, opt.delta_c_init),
                     0.0, 1.0))
        ls_fails = jnp.where(accepted, 0, st.ls_fails + 1)

        x_n = x + alpha * dx
        s_n = s + alpha * ds
        y_n = y + alpha * dy
        zL_n = zL + a_du * dzL
        zU_n = zU + a_du * dzU
        wL_n = wL + a_du * dwL
        wU_n = wU + a_du * dwU

        # -- Ipopt kappa_sigma multiplier safeguard ----------------------
        dLx_n = jnp.where(mL, x_n - xl, 1.0)
        dUx_n = jnp.where(mU, xu - x_n, 1.0)
        dLs_n = jnp.where(msL, s_n - cl, 1.0)
        dUs_n = jnp.where(msU, cu - s_n, 1.0)
        kS = opt.kappa_sigma
        clipz = lambda z, d, mk: jnp.where(
            mk, jnp.clip(z, mu / (kS * jnp.maximum(d, 1e-300)),
                         kS * mu / jnp.maximum(d, 1e-300)), 0.0)
        zL_n = clipz(zL_n, dLx_n, mL)
        zU_n = clipz(zU_n, dUx_n, mU)
        wL_n = clipz(wL_n, dLs_n, msL)
        wU_n = clipz(wU_n, dUs_n, msU)

        # -- convergence tests -------------------------------------------
        g_n, c_n, Jty_n = eval_point(x_n, y_n)
        E0, inf_pr, inf_du = optimality_error_from(
            g_n, c_n, Jty_n, x_n, s_n, y_n, zL_n, zU_n, wL_n, wU_n,
            jnp.asarray(0.0, dtype))
        converged = E0 <= opt.tol
        acceptable = E0 <= opt.acceptable_tol
        accept_count = jnp.where(acceptable, st.accept_count + 1, 0)
        acc_done = accept_count >= opt.acceptable_iter

        bad = ~(jnp.all(jnp.isfinite(x_n)) & jnp.all(jnp.isfinite(y_n))
                & jnp.all(jnp.isfinite(s_n)))
        stuck = ls_fails >= 10

        status = jnp.where(
            converged, SOLVE_SUCCEEDED,
            jnp.where(acc_done, SOLVED_TO_ACCEPTABLE_LEVEL,
                      jnp.where(bad, INVALID_NUMBER_DETECTED,
                                jnp.where(stuck, RESTORATION_FAILED,
                                          st.status))))
        done = converged | acc_done | bad | stuck

        # On a NaN blowup keep the previous iterate.
        keep_old = bad
        sel = lambda new, old: jnp.where(keep_old, old, new)

        obj_history = st.obj_history.at[st.it].set(fns.objective(x_n))

        return _State(
            x=sel(x_n, x), s=sel(s_n, s), y=sel(y_n, y),
            zL=sel(zL_n, zL), zU=sel(zU_n, zU),
            wL=sel(wL_n, wL), wU=sel(wU_n, wU),
            mu=mu, delta_w=delta_w, delta_c=delta_c, nu=nu,
            it=st.it + 1, status=status, done=done,
            ls_fails=ls_fails, accept_count=accept_count,
            obj_history=obj_history, inf_pr=inf_pr, inf_du=inf_du)

    st0 = _State(
        x=x_init, s=s_init, y=y_init, zL=zL_init, zU=zU_init,
        wL=wL_init, wU=wU_init,
        mu=jnp.asarray(opt.mu_init, dtype),
        delta_w=jnp.asarray(0.0, dtype),
        delta_c=jnp.asarray(0.0, dtype),
        nu=jnp.asarray(10.0, dtype),
        it=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(MAXIMUM_ITERATIONS_EXCEEDED, jnp.int32),
        done=jnp.asarray(False),
        ls_fails=jnp.asarray(0, jnp.int32),
        accept_count=jnp.asarray(0, jnp.int32),
        obj_history=jnp.full((opt.max_iter,), jnp.nan, dtype),
        inf_pr=jnp.asarray(jnp.inf, dtype),
        inf_du=jnp.asarray(jnp.inf, dtype))

    st = jax.lax.while_loop(cond, body, st0)

    return IPMResult(
        x=st.x, obj_val=fns.objective(st.x), g=fns.constraints(st.x),
        mult_g=st.y, mult_x_L=st.zL, mult_x_U=st.zU,
        status=st.status, iterations=st.it, obj_history=st.obj_history,
        inf_pr=st.inf_pr, inf_du=st.inf_du, mu=st.mu)


def make_nlp_functions_dense(objective, constraints,
                             hessian_approximation='exact'):
    """Dense-KKT IPMFunctions for small generic NLPs.

    Builds the Lagrangian Hessian with ``jax.hessian`` and solves the
    condensed system with a dense factorization.  Used for small
    problems and for cross-checking the structured collocation path.
    """
    grad = jax.grad(objective)
    jac = jax.jacrev(constraints)

    def kkt_solve(x, y, sigma_x, ds, rx, rc):
        n = x.shape[0]
        m = rc.shape[0]
        dtype = x.dtype

        def lag(xx):
            return objective(xx) + jnp.dot(y, constraints(xx))

        H = jax.hessian(lag)(x)
        J = jac(x)
        K = jnp.zeros((n + m, n + m), dtype)
        K = K.at[:n, :n].set(H + jnp.diag(sigma_x))
        K = K.at[:n, n:].set(J.T)
        K = K.at[n:, :n].set(J)
        K = K.at[n:, n:].set(-jnp.diag(ds))
        sol = jnp.linalg.solve(K, jnp.concatenate([rx, rc]))
        return sol[:n], sol[n:]

    return IPMFunctions(objective=objective, gradient=grad,
                        constraints=constraints, kkt_solve=kkt_solve)
