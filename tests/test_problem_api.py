"""Problem API parity tests: bounds conflicts, extraction utilities,
linear initial guess, known-trajectory callables, add_option."""

import numpy as np
import sympy as sm
import jax.numpy as jnp
import pytest

from opty_tpu import Problem, create_objective_function

t = sm.Symbol('t')
x, v, F = [sm.Function(s)(t) for s in 'xvF']
m, c, k = sm.symbols('m, c, k')
EOM = sm.Matrix([x.diff(t) - v,
                 m * v.diff(t) + c * v + k * x - F])
N = 11
H = 0.1
DUR = H * (N - 1)


def make_problem(**kwargs):
    obj, obj_grad = create_objective_function(
        sm.Integral(F ** 2, t), (x, v), (F,), tuple(), N, H,
        time_symbol=t)
    defaults = dict(known_parameter_map={m: 1.0, c: 0.5, k: 2.0},
                    time_symbol=t)
    defaults.update(kwargs)
    return Problem(obj, obj_grad, EOM, (x, v), N, H, **defaults)


class TestBounds:
    def test_check_bounds_conflict(self):
        prob = make_problem(bounds={F: (-1.0, 1.0)})
        good = np.zeros(prob.num_free)
        prob.check_bounds_conflict(good)  # no raise
        bad = np.zeros(prob.num_free)
        bad[2 * N] = 5.0  # F_0 out of bounds
        with pytest.raises(ValueError, match='violates'):
            prob.check_bounds_conflict(bad)

    def test_solve_respect_bounds(self):
        prob = make_problem(bounds={F: (-1.0, 1.0)})
        bad = np.zeros(prob.num_free)
        bad[2 * N] = 5.0
        with pytest.raises(ValueError):
            prob.solve(bad, respect_bounds=True)

    def test_reversed_bounds(self):
        prob = make_problem(bounds={F: (1.0, -1.0)})
        with pytest.raises(ValueError, match='greater'):
            prob.check_bounds_conflict(np.zeros(prob.num_free))

    def test_per_node_array_bounds(self):
        arr = np.linspace(-1.0, -2.0, N)
        prob = make_problem(bounds={F: (arr, 3.0)})
        np.testing.assert_allclose(prob.lower_bound[2 * N:3 * N], arr)
        np.testing.assert_allclose(prob.upper_bound[2 * N:3 * N], 3.0)

    def test_unknown_bound_symbol_rejected(self):
        q = sm.Function('q')(t)
        with pytest.raises(ValueError):
            make_problem(bounds={q: (0.0, 1.0)})

    def test_bad_eom_bounds_key(self):
        with pytest.raises(ValueError, match='eom_bounds'):
            make_problem(eom_bounds={7: (0.0, 1.0)})

    def test_reversed_eom_bounds(self):
        """Reversed eom_bounds are caught by check_bounds_conflict
        (parity: opty/direct_collocation.py:343-346)."""
        prob = make_problem(eom_bounds={1: (2.0, -2.0)})
        with pytest.raises(ValueError, match='greater'):
            prob.check_bounds_conflict(np.zeros(prob.num_free))


class TestExtraction:
    def test_extract_and_fill(self):
        prob = make_problem()
        free = np.arange(prob.num_free, dtype=float)
        xv = prob.extract_values(free, x)
        np.testing.assert_allclose(xv, free[:N])
        Fv = prob.extract_values(free, F)
        np.testing.assert_allclose(Fv, free[2 * N:3 * N])
        prob.fill_free(free, np.zeros(N), F)
        np.testing.assert_allclose(free[2 * N:3 * N], 0.0)
        with pytest.raises(ValueError):
            prob.extract_values(free, sm.Symbol('zz'))

    def test_parse_free(self):
        prob = make_problem()
        free = np.arange(prob.num_free, dtype=float)
        states, specified, constants = prob.parse_free(free)
        assert states.shape == (2, N)
        assert specified.shape == (N,)
        assert constants.shape == (0,)

    def test_time_vector(self):
        prob = make_problem()
        tv = prob.time_vector()
        np.testing.assert_allclose(tv, np.linspace(0.0, DUR, N))


class TestLinearInitialGuess:
    def test_interpolates_instances(self):
        prob = make_problem(instance_constraints=(
            x.subs(t, 0.0) - 1.0, x.subs(t, DUR) - 3.0, v.subs(t, 0.0)))
        guess = prob.create_linear_initial_guess()
        np.testing.assert_allclose(guess[0], 1.0)
        np.testing.assert_allclose(guess[N - 1], 3.0)
        np.testing.assert_allclose(guess[:N],
                                   np.linspace(1.0, 3.0, N))
        np.testing.assert_allclose(guess[N:2 * N], 0.0)  # v single pt

    def test_bound_midpoints(self):
        prob = make_problem(bounds={F: (-2.0, 6.0)})
        guess = prob.create_linear_initial_guess()
        np.testing.assert_allclose(guess[2 * N:3 * N], 2.0)

    def test_one_sided_bound(self):
        prob = make_problem(bounds={F: (1.0, np.inf)})
        guess = prob.create_linear_initial_guess()
        np.testing.assert_allclose(guess[2 * N:3 * N], 1.0)


class TestKnownTrajectoryCallable:
    def test_callable_of_free(self):
        """known_trajectory_map value as a traceable callable of the
        free vector (reference feature, opty/direct_collocation.py:
        2891-2926)."""
        Fvals = np.linspace(0.0, 1.0, N)

        def calc_F(free):
            return jnp.asarray(Fvals) + 0.0 * free[0]

        obj, obj_grad = create_objective_function(
            sm.Integral(x ** 2, t), (x, v), (), tuple(), N, H,
            time_symbol=t)
        prob = Problem(obj, obj_grad, EOM, (x, v), N, H,
                       known_parameter_map={m: 1.0, c: 0.5, k: 2.0},
                       known_trajectory_map={F: calc_F},
                       time_symbol=t)
        free = np.random.default_rng(0).normal(size=prob.num_free)
        got = prob.con(free)
        # cross-check against array-valued map
        prob2 = Problem(obj, obj_grad, EOM, (x, v), N, H,
                        known_parameter_map={m: 1.0, c: 0.5, k: 2.0},
                        known_trajectory_map={F: Fvals},
                        time_symbol=t)
        np.testing.assert_allclose(got, prob2.con(free), rtol=1e-12)


class TestAddOption:
    def test_ipopt_style_options(self):
        prob = make_problem()
        prob.add_option('max_iter', 123)
        assert prob._ipm_options.max_iter == 123
        prob.add_option('tol', 1e-6)
        assert prob._ipm_options.tol == 1e-6
        with pytest.warns(UserWarning, match='no JAX-IPM mapping'):
            prob.add_option('output_file', 'foo.txt')  # accepted, ignored

    def test_objective_argument_validation(self):
        with pytest.raises(ValueError, match='one or two'):
            Problem(lambda a, b, c: 0.0, lambda f: f, EOM, (x, v), N, H,
                    known_parameter_map={m: 1.0, c: 0.5, k: 2.0},
                    known_trajectory_map={F: np.zeros(N)},
                    time_symbol=t)


def test_non_integer_instance_time_rejected():
    """theta(0.5*h) must raise, not silently truncate to node 0
    (stricter than the reference, which int()-truncates sympy Floats;
    opty/direct_collocation.py:2190-2204)."""
    h = sm.Symbol('h')
    obj, obj_grad = create_objective_function(
        sm.Integral(F ** 2, t), (x, v), (F,), tuple(), N, h,
        time_symbol=t)
    for bad_time in (0.5 * h, sm.Rational(3, 2) * h):
        with pytest.raises(TypeError, match='integer multiple'):
            Problem(obj, obj_grad, EOM, (x, v), N, h,
                    known_parameter_map={m: 1.0, c: 0.5, k: 2.0},
                    instance_constraints=(x.subs(t, bad_time) - 1.0,),
                    time_symbol=t)
    # integer multiples still accepted
    Problem(obj, obj_grad, EOM, (x, v), N, h,
            known_parameter_map={m: 1.0, c: 0.5, k: 2.0},
            instance_constraints=(x.subs(t, 3 * h) - 1.0,),
            time_symbol=t)


def test_resample_outside_measured_range_raises():
    from opty_tpu.parameter_identification import _resample
    tm = np.linspace(0.0, 1.0, 11)
    ym = np.zeros((11, 2))
    _resample(tm, ym, np.linspace(0.0, 1.0, 5))  # inside: ok
    with pytest.raises(ValueError, match='outside the measured'):
        _resample(tm, ym, np.linspace(0.0, 1.5, 5))


def test_missing_derivative_rejected():
    eom = sm.Matrix([x + v])
    with pytest.raises(ValueError, match='time derivatives'):
        Problem(lambda f: 0.0, lambda f: f, eom, (x, v), N, H,
                time_symbol=t)
