"""Brachistochrone via direct collocation — analytic cycloid oracle.

Minimum-time descent validated against the closed-form cycloid optimum
(the reference validates its version against a stored CSV; the cycloid
is the stronger oracle).  Also covers: variable duration with a plain
minimum-time objective and a control appearing nonlinearly.

Formulation (own derivation): particle slides frictionlessly along a
curve whose tangent makes angle beta(t) below the horizontal; gravity
g acts in -y; v is the speed along the curve:

    x' = v cos(beta)
    y' = -v sin(beta)
    v' = g sin(beta)

Minimize the duration h*(N-1) from (0, 0) at rest to (b1, -b2).
"""

import numpy as np
import sympy as sm
from scipy.optimize import brentq

from opty_tpu import Problem


def cycloid_time(b1, b2, g=9.81):
    """Analytic optimal time to reach (b1, -b2)."""
    # cycloid: x = a(phi - sin phi), y = -a(1 - cos phi)
    def ratio(phi):
        return (phi - np.sin(phi)) / (1.0 - np.cos(phi)) - b1 / b2

    phi_f = brentq(ratio, 1e-6, 2 * np.pi - 1e-6)
    a = b2 / (1.0 - np.cos(phi_f))
    return phi_f * np.sqrt(a / g)


def build(N, method):
    gval, b1, b2 = 9.81, 2.0, 2.0
    t, h, g = sm.symbols('t, h, g', real=True)
    x, y, v, beta = [sm.Function(s)(t) for s in ['x', 'y', 'v', 'beta']]
    eom = sm.Matrix([
        x.diff(t) - v * sm.cos(beta),
        y.diff(t) + v * sm.sin(beta),
        v.diff(t) - g * sm.sin(beta),
    ])

    def obj(prob, free):
        return (N - 1) * free[-1]

    instance_constraints = (
        x.subs(t, 0 * h), y.subs(t, 0 * h), v.subs(t, 0 * h),
        x.subs(t, (N - 1) * h) - b1,
        y.subs(t, (N - 1) * h) + b2,
    )
    prob = Problem(obj, None, eom, (x, y, v), N, h,
                   known_parameter_map={g: gval},
                   instance_constraints=instance_constraints,
                   bounds={h: (1e-4, 0.1), v: (0.0, 30.0),
                           beta: (0.0, np.pi / 2)},
                   time_symbol=t, integration_method=method)
    prob.set_solver_options(max_iter=1000)

    guess = np.zeros(prob.num_free)
    guess[:N] = np.linspace(0.0, b1, N)
    guess[N:2 * N] = np.linspace(0.0, -b2, N)
    T0 = 1.5
    guess[2 * N:3 * N] = np.linspace(0.0, 2 * np.hypot(b1, b2) / T0, N)
    guess[3 * N:4 * N] = np.pi / 4
    guess[-1] = T0 / (N - 1)
    return prob, guess


def test_brachistochrone_matches_cycloid():
    """The rest start (v(0) = 0) makes this problem dual-degenerate:
    LICQ fails at the singular first node, so the multipliers are
    unbounded and no solver can certify dual feasibility (Ipopt
    reports the same blowup).  The primal trajectory is still well
    determined: assert primal feasibility and the optimal time."""
    T_true = cycloid_time(2.0, 2.0)
    prob, guess = build(N=201, method='midpoint')
    prob.set_solver_options(max_iter=600)
    sol, info = prob.solve(guess)
    assert info['inf_pr'] < 1e-8
    T_opt = 200 * sol[-1]
    np.testing.assert_allclose(T_opt, T_true, rtol=6e-2)
    # the trajectory endpoint is exact
    np.testing.assert_allclose(sol[200], 2.0, atol=1e-7)
    np.testing.assert_allclose(sol[401], -2.0, atol=1e-7)
