"""Reference-style implicit known trajectories (C17 parity):
``f(x(t))`` and ``Derivative(f(x(t)), x(t))`` supplied as data
(callables of the free vector or (N,) arrays), mirroring the
reference's test_implicit_known_traj
(opty/tests/test_direct_collocation.py:18-278) and
plot_hilly_race.py:160-184.

Oracle: the same physics expressed through our native *pointwise*
callable (differentiated exactly by JAX AD) must produce identical
constraints and Jacobians when the data path is fed the analytically
exact values and slopes.
"""

import numpy as np
import sympy as sm
import sympy.physics.mechanics as me
import jax.numpy as jnp
import pytest

from opty_tpu.transcribe.collocator import ConstraintCollocator

t = me.dynamicsymbols._t
m, g, r, h = sm.symbols('m, g, r, h', real=True)
x, v, f, s = me.dynamicsymbols('x, v, f, s', real=True)
theta_of_x = sm.Function('theta', real=True)(x)

N = 5

EOM = sm.Matrix([
    x.diff() - v - s,
    m * v.diff() - f + m * g * sm.sin(theta_of_x),
])


def theta_fn(xv):
    return 0.3 * xv ** 2 + 0.1 * xv


def dtheta_fn(xv):
    return 0.6 * xv + 0.1


def make_collocator(known_traj):
    return ConstraintCollocator(
        EOM, (x, v), N, 0.1,
        known_parameter_map={m: 3.3, g: 10.2},
        known_trajectory_map=known_traj,
        time_symbol=t)


@pytest.fixture(scope='module')
def svals():
    return np.linspace(121.0, 124.0, N)


def test_data_path_matches_pointwise_ad(svals):
    col_pw = make_collocator({s: svals, theta_of_x: theta_fn})

    def calc_theta(free):
        return theta_fn(free[:N])

    def calc_dtheta(free):
        return dtheta_fn(free[:N])

    col_data = make_collocator({
        s: svals,
        theta_of_x: calc_theta,
        theta_of_x.diff(x): calc_dtheta,
    })

    rng = np.random.default_rng(0)
    free = jnp.asarray(rng.normal(size=col_pw.num_free))

    c_pw = np.asarray(col_pw.constraints(free))
    c_data = np.asarray(col_data.constraints(free))
    np.testing.assert_allclose(c_data, c_pw, rtol=1e-12, atol=1e-12)

    J_pw = [np.asarray(a) for a in col_pw.jacobian_blocks(free)[:3]]
    J_data = [np.asarray(a) for a in col_data.jacobian_blocks(free)[:3]]
    for a, b in zip(J_data, J_pw):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_array_valued_implicit_accepted(svals):
    """(N,) arrays for both f(x) and its derivative — the exact input
    kind the round-1 implementation rejected."""
    rng = np.random.default_rng(1)
    free = rng.normal(size=2 * N + N)  # n*N + q*N (f unknown)
    fvals = theta_fn(free[:N])
    dvals = dtheta_fn(free[:N])
    col = make_collocator({
        s: svals,
        theta_of_x: fvals,
        theta_of_x.diff(x): dvals,
    })
    col_pw = make_collocator({s: svals, theta_of_x: theta_fn})
    freej = jnp.asarray(free)
    np.testing.assert_allclose(np.asarray(col.constraints(freej)),
                               np.asarray(col_pw.constraints(freej)),
                               rtol=1e-12)
    # ordering parity with the reference: map keys in user dict order
    assert col.known_input_trajectories == (
        s, theta_of_x, theta_of_x.diff(x))


def test_missing_derivative_entry_raises(svals):
    with pytest.raises(ValueError, match='Derivative'):
        make_collocator({s: svals,
                         theta_of_x: np.zeros(N)})


def test_midpoint_data_path(svals):
    def calc_theta(free):
        return theta_fn(free[:N])

    def calc_dtheta(free):
        return dtheta_fn(free[:N])

    col_pw = ConstraintCollocator(
        EOM, (x, v), N, 0.1,
        known_parameter_map={m: 3.3, g: 10.2},
        known_trajectory_map={s: svals, theta_of_x: theta_fn},
        time_symbol=t, integration_method='midpoint')
    col_data = ConstraintCollocator(
        EOM, (x, v), N, 0.1,
        known_parameter_map={m: 3.3, g: 10.2},
        known_trajectory_map={s: svals, theta_of_x: calc_theta,
                              theta_of_x.diff(x): calc_dtheta},
        time_symbol=t, integration_method='midpoint')
    rng = np.random.default_rng(2)
    free = jnp.asarray(rng.normal(size=col_pw.num_free))
    np.testing.assert_allclose(np.asarray(col_data.constraints(free)),
                               np.asarray(col_pw.constraints(free)),
                               rtol=1e-12)
    J_pw = [np.asarray(a) for a in col_pw.jacobian_blocks(free)[:3]]
    J_data = [np.asarray(a) for a in col_data.jacobian_blocks(free)[:3]]
    for a, b in zip(J_data, J_pw):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)
