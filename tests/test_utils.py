"""Tests for opty_tpu.utils (parity targets:
opty/tests/test_utils.py:67-219 objective-builder closed forms)."""

import numpy as np
import sympy as sm
import jax
import jax.numpy as jnp
import pytest

from opty_tpu import (create_objective_function, parse_free, sort_sympy,
                      controllable, substitute_matrix, sum_of_sines,
                      state_derivatives, f_minus_ma)

t = sm.Symbol('t')
x, v, F = [sm.Function(s)(t) for s in 'xvF']
p = sm.Symbol('p')


class TestCreateObjective:
    N = 5
    h = 0.1

    def free(self):
        rng = np.random.default_rng(1)
        return rng.normal(size=2 * self.N + self.N + 1)  # x, v, F, p

    def test_backward_euler_integral(self):
        obj, obj_grad = create_objective_function(
            sm.Integral(F ** 2, t), (x, v), (F,), (p,), self.N, self.h,
            time_symbol=t)
        free = self.free()
        Fv = free[2 * self.N:3 * self.N]
        expected = self.h * np.sum(Fv[1:] ** 2)   # BE weights [0,1,..,1]
        np.testing.assert_allclose(float(obj(free)), expected, rtol=1e-12)
        # exact AD gradient
        g = np.asarray(obj_grad(free))
        ge = np.zeros_like(free)
        ge[2 * self.N + 1:3 * self.N] = 2 * self.h * Fv[1:]
        np.testing.assert_allclose(g, ge, atol=1e-12)

    def test_midpoint_integral(self):
        obj, _ = create_objective_function(
            sm.Integral(F ** 2, t), (x, v), (F,), (p,), self.N, self.h,
            integration_method='midpoint', time_symbol=t)
        free = self.free()
        Fv = free[2 * self.N:3 * self.N]
        mid = 0.5 * (Fv[:-1] + Fv[1:])
        expected = self.h * np.sum(mid ** 2)
        np.testing.assert_allclose(float(obj(free)), expected, rtol=1e-12)

    def test_mixed_terms(self):
        # parameter term outside the integral plus state integral
        expr = p ** 2 + sm.Integral(x ** 2 + F ** 2, t)
        obj, obj_grad = create_objective_function(
            expr, (x, v), (F,), (p,), self.N, self.h, time_symbol=t)
        free = self.free()
        X = free[:self.N]
        Fv = free[2 * self.N:3 * self.N]
        pv = free[-1]
        expected = pv ** 2 + self.h * np.sum(X[1:] ** 2 + Fv[1:] ** 2)
        np.testing.assert_allclose(float(obj(free)), expected, rtol=1e-12)
        g = np.asarray(obj_grad(free))
        np.testing.assert_allclose(g[-1], 2 * pv, rtol=1e-12)

    def test_nested_integral_rejected(self):
        with pytest.raises(NotImplementedError):
            create_objective_function(
                sm.Integral(sm.Integral(F ** 2, t), t), (x, v), (F,),
                (p,), self.N, self.h, time_symbol=t)

    def test_bad_method_rejected(self):
        with pytest.raises(NotImplementedError):
            create_objective_function(
                sm.Integral(F ** 2, t), (x, v), (F,), (p,), self.N,
                self.h, integration_method='rk4', time_symbol=t)


class TestParseFree:
    def test_roundtrip(self):
        n, q, N, r = 2, 1, 7, 3
        free = np.arange(n * N + q * N + r, dtype=float)
        states, specified, constants = parse_free(free, n, q, N)
        assert states.shape == (n, N)
        assert specified.shape == (N,)
        np.testing.assert_allclose(constants, free[-r:])

    def test_variable_duration(self):
        n, q, N, r = 2, 2, 5, 1
        free = np.arange(n * N + q * N + r + 1, dtype=float)
        states, specified, constants, h = parse_free(
            free, n, q, N, variable_duration=True)
        assert specified.shape == (q, N)
        assert h == free[-1]
        np.testing.assert_allclose(constants, free[-2:-1])


def test_sort_sympy():
    a, c, b = sm.symbols('a, c, b')
    assert sort_sympy([c, a, b]) == [a, b, c]
    fa, fc, fb = [sm.Function(s)(t) for s in ['fa', 'fc', 'fb']]
    assert sort_sympy([fc, fa, fb]) == [fa, fb, fc]


def test_state_derivatives_and_f_minus_ma():
    xd = state_derivatives((x, v))
    assert xd == [x.diff(t), v.diff(t)]
    mm = sm.Matrix([[1, 0], [0, 2]])
    fo = sm.Matrix([v, F])
    res = f_minus_ma(mm, fo, (x, v))
    assert sm.simplify(res[0] - (x.diff(t) - v)) == 0
    assert sm.simplify(res[1] - (2 * v.diff(t) - F)) == 0


def test_controllable():
    a = np.array([[0.0, 1.0], [-2.0, -3.0]])
    b = np.array([0.0, 1.0])
    assert controllable(a, b)
    assert not controllable(np.eye(2), np.array([1.0, 0.0]))


def test_substitute_matrix():
    m = np.zeros((3, 3))
    sub = np.array([[1.0, 2.0], [3.0, 4.0]])
    out = substitute_matrix(m, [0, 2], [1, 2], sub)
    np.testing.assert_allclose(out[0, 1], 1.0)
    np.testing.assert_allclose(out[2, 2], 4.0)
    with pytest.raises(ValueError):
        substitute_matrix(np.zeros((2, 2)), [0], [0], sub)


def test_sum_of_sines():
    time = np.linspace(0.0, 10.0, 1000)
    sig, sig_p, sig_pp = sum_of_sines(2.0, [1.0, 3.0, 7.0], time)
    assert sig.shape == time.shape
    # derivative consistency by finite differences
    fd = np.gradient(sig, time)
    assert np.corrcoef(fd[50:-50], sig_p[50:-50])[0, 1] > 0.999
