"""Parameter-identification helper tests (parity target:
opty/tests/test_parameter_identification.py:30-54 gradient vs
finite differences)."""

import numpy as np

from opty_tpu.parameter_identification import (
    make_tracking_objective, objective_function,
    objective_function_gradient, output_equations, wrap_objective)


def test_output_equations():
    x = np.arange(12.0).reshape(3, 4)
    y = output_equations(x)
    np.testing.assert_allclose(y, x[:, :2])


def test_gradient_matches_finite_differences():
    rng = np.random.default_rng(3)
    N, n = 20, 2
    h = 0.05
    tm = np.linspace(0.0, (N - 1) * h, N)
    y_meas = rng.normal(size=(N, 1))
    free = rng.normal(size=n * N + 1)

    obj = wrap_objective(objective_function, N, n, h, tm, y_meas)
    grad = objective_function_gradient(free, N, n, h, tm, y_meas)

    fd = np.zeros_like(free)
    eps = 1e-7
    for i in range(len(free)):
        ei = np.zeros_like(free)
        ei[i] = eps
        fd[i] = (obj(free + ei) - obj(free - ei)) / (2 * eps)
    np.testing.assert_allclose(grad, fd, atol=1e-6)


def test_make_tracking_objective_consistency():
    rng = np.random.default_rng(4)
    N, n = 15, 2
    h = 0.1
    tm = np.linspace(0.0, (N - 1) * h, N)
    y_meas = rng.normal(size=(N, 1))
    free = rng.normal(size=n * N + 1)

    obj_jax, grad_jax = make_tracking_objective(N, n, h, tm, y_meas)
    ref = objective_function(free, N, n, h, tm, y_meas)
    np.testing.assert_allclose(float(obj_jax(free)), ref, rtol=1e-10)
    ref_grad = objective_function_gradient(free, N, n, h, tm, y_meas)
    np.testing.assert_allclose(np.asarray(grad_jax(free)), ref_grad,
                               atol=1e-10)
