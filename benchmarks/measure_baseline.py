#!/usr/bin/env python
"""Measure the reference (opty + Ipopt, CPU) baseline components.

cyipopt/Ipopt cannot be installed in this image (no network, no conda),
and the reference's Cython backend needs the ``cython`` package (also
absent), so a full reference solve cannot run here.  This script
measures every component that CAN be measured on this machine and
assembles a defensible per-solve baseline from them:

1. the reference's own transcription + numpy-backend constraint and
   Jacobian kernels (its real code, imported from /root/reference with
   a stubbed ``cyipopt`` module — only the class its ``Problem``
   subclasses, never used in the timing path);
2. a sparse LU factor+solve of the actual collocation KKT system at
   the reference's sparsity (scipy SuperLU — the same technology class
   as Ipopt's default MUMPS solver) with a representative IPM
   diagonal;
3. Ipopt iteration counts for this problem class, taken from our
   certified-equivalent solver on the same configs (40 iterations to
   1e-8 on pendulum N=501; Ipopt's filter line search is the same
   algorithm family, so counts are comparable).

Baseline figures (solves/s, single stream):
  optimistic  = 1 / (iters * (t_kkt + t_obj_grad))      [evals free:
                the C backend at its theoretical best]
  measured    = 1 / (iters * (t_kkt + t_con + t_jac))   [numpy backend
                as actually runnable here]

Run:  python benchmarks/measure_baseline.py
"""

import json
import sys
import time
import types

import numpy as np


def stub_cyipopt():
    stub = types.ModuleType('cyipopt')

    class Problem:
        def __init__(self, *args, **kwargs):
            pass

        def add_option(self, *args, **kwargs):
            pass

    stub.Problem = Problem
    sys.modules.setdefault('cyipopt', stub)


def build_reference_pendulum(num_nodes=501):
    """The reference benchmark config
    (examples-gallery/beginner/plot_pendulum_swing_up_fixed_duration
    .py:38-97) built with the reference's own Problem class."""
    import sympy as sm
    sys.path.insert(0, '/root/reference')
    import opty

    duration = 10.0
    interval = duration / (num_nodes - 1)
    I, m, g, d, t = sm.symbols('I, m, g, d, t')
    theta, omega, T = sm.symbols('theta, omega, T', cls=sm.Function)
    state_symbols = (theta(t), omega(t))
    eom = sm.Matrix([theta(t).diff() - omega(t),
                     I * omega(t).diff() + m * g * d * sm.sin(theta(t))
                     - T(t)])
    obj, obj_grad = opty.utils.create_objective_function(
        sm.Integral(T(t) ** 2, t), state_symbols, (T(t),), tuple(),
        num_nodes, interval, time_symbol=t)
    prob = opty.Problem(
        obj, obj_grad, eom, state_symbols, num_nodes, interval,
        known_parameter_map={I: 1.0, m: 1.0, g: 9.81, d: 1.0},
        instance_constraints=(theta(0.0), theta(duration) - np.pi,
                              omega(0.0), omega(duration)),
        bounds={T(t): (-2.0, 2.0)}, time_symbol=t, backend='numpy')
    return prob


def time_call(fn, *args, repeats=20):
    fn(*args)  # warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        fn(*args)
    return (time.perf_counter() - t0) / repeats


def time_kkt_sparse(prob, free):
    """SuperLU factor+solve of the primal-dual KKT at the reference's
    Jacobian sparsity with a representative barrier diagonal."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    rows, cols = prob.jacobianstructure()
    vals = prob.jacobian(free)
    n = prob.num_free
    m_con = len(prob.constraints(free))
    J = sp.coo_matrix((vals, (rows, cols)), shape=(m_con, n)).tocsc()
    rng = np.random.default_rng(0)
    sigma = sp.diags(10.0 ** rng.uniform(-6, 4, size=n))
    ds = sp.diags(np.full(m_con, 1e-8))
    K = sp.bmat([[sigma, J.T], [J, -ds]], format='csc')
    rhs = rng.standard_normal(n + m_con)

    def factor_solve():
        lu = spla.splu(K)
        return lu.solve(rhs)

    return time_call(factor_solve, repeats=10)


def main():
    stub_cyipopt()
    num_nodes = 501
    t0 = time.time()
    prob = build_reference_pendulum(num_nodes)
    t_build = time.time() - t0
    rng = np.random.default_rng(7)
    free = rng.standard_normal(prob.num_free)

    t_con = time_call(prob.constraints, free)
    t_jac = time_call(prob.jacobian, free)
    t_obj = time_call(prob.objective, free)
    t_grad = time_call(prob.gradient, free)
    t_kkt = time_kkt_sparse(prob, free)

    # iteration count: our certified-equivalent filter IPM needs 40
    # iterations to tol=1e-8 on this config (tests/test_problem.py);
    # Ipopt's own filter algorithm is the comparable count.  Each
    # iteration costs >= 1 constraint + 1 Jacobian + 1 gradient + 1
    # KKT factor+solve (line-search extras ignored -> optimistic).
    iters = 40
    per_iter_meas = t_con + t_jac + t_grad + t_kkt
    per_iter_opt = t_grad + t_kkt     # C-backend best case: evals free
    out = {
        'config': 'pendulum_swing_up_fixed_duration_N501',
        'build_s': round(t_build, 2),
        'eval_constraints_s': t_con,
        'eval_jacobian_s': t_jac,
        'eval_objective_s': t_obj,
        'eval_gradient_s': t_grad,
        'kkt_superlu_factor_solve_s': t_kkt,
        'assumed_iters': iters,
        'solve_s_measured_numpy_backend': iters * per_iter_meas,
        'solve_s_optimistic_c_backend': iters * per_iter_opt,
        'solves_per_s_measured': 1.0 / (iters * per_iter_meas),
        'solves_per_s_optimistic': 1.0 / (iters * per_iter_opt),
    }
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
