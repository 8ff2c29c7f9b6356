"""Parameter-identification helpers.

Behavioral parity with opty/parameter_identification.py: a
least-squares tracking objective between measured and model outputs,
with the measured data resampled onto the collocation grid, plus its
analytic gradient.  The JAX implementations are traceable functions of
the free vector, so they compose with the solver's AD/Hessian pipeline
and with ``vmap`` over measurement sets (batched identification runs).
"""

import numpy as np

import jax.numpy as jnp

from .config import default_dtype
from .utils import parse_free

__all__ = ['output_equations', 'objective_function',
           'objective_function_gradient', 'wrap_objective',
           'make_tracking_objective']


def output_equations(x):
    """Returns the outputs of the system: the generalized coordinates,
    assumed to be the first half of the state vector (parity:
    opty/parameter_identification.py:14-41)."""
    return x[:, :x.shape[1] // 2]


def _resample(time_measured, y_measured, model_time):
    """Linear interpolation of measurements onto the model grid.

    The model grid must lie inside the measured time range: np.interp
    clamps silently outside it, which would make an over-long model
    horizon quietly track edge-held values (the reference's
    scipy.interp1d raises in that case)."""
    time_measured = np.asarray(time_measured)
    model_time = np.asarray(model_time)
    if (model_time[0] < time_measured[0]
            or model_time[-1] > time_measured[-1]):
        raise ValueError(
            'Model time grid [{}, {}] extends outside the measured time '
            'range [{}, {}].'.format(model_time[0], model_time[-1],
                                     time_measured[0], time_measured[-1]))
    y_measured = np.asarray(y_measured)
    cols = [np.interp(model_time, time_measured,
                      y_measured[:, i]) for i in range(y_measured.shape[1])]
    return np.stack(cols, axis=1)


def objective_function(free, num_dis_points, num_states, dis_period,
                       time_measured, y_measured):
    """Norm of the difference between measured and simulated outputs
    (parity: opty/parameter_identification.py:43-98)."""
    N, n = num_dis_points, num_states
    duration = (N - 1) * dis_period
    model_time = np.linspace(0.0, duration, num=N)
    free = np.asarray(free)
    states = free[:n * N].reshape((n, N))
    model_outputs = np.asarray(output_equations(states.T))
    resampled = _resample(time_measured, y_measured, model_time)
    return dis_period * float(
        np.sum((resampled.flatten() - model_outputs.flatten()) ** 2))


def objective_function_gradient(free, num_dis_points, num_states,
                                dis_period, time_measured, y_measured):
    """Analytic gradient of :func:`objective_function` (valid when the
    outputs are exactly the coordinates; parity:
    opty/parameter_identification.py:100-159)."""
    N, n = num_dis_points, num_states
    duration = (N - 1) * dis_period
    model_time = np.linspace(0.0, duration, num=N)
    free = np.asarray(free)
    states = free[:n * N].reshape((n, N))
    model_outputs = np.asarray(output_equations(states.T))  # (N, o)
    resampled = _resample(time_measured, y_measured, model_time)
    o = resampled.shape[1]
    grad = np.zeros_like(free)
    grad[:N * o] = 2.0 * dis_period * (model_outputs
                                       - resampled).T.flatten()
    return grad


def wrap_objective(obj_func, *args):
    def wrapped_func(free):
        return obj_func(free, *args)
    return wrapped_func


def make_tracking_objective(num_dis_points, num_states, dis_period,
                            time_measured, y_measured, dtype=None):
    """JAX-native tracking objective factory.

    Returns ``(obj, obj_grad)`` as traceable functions of the free
    vector — the solver-ready analog of pairing ``objective_function``
    with ``objective_function_gradient`` through ``wrap_objective``.
    The measurement resampling happens once at build time.
    """
    dtype = dtype or default_dtype()
    N, n = num_dis_points, num_states
    duration = (N - 1) * dis_period
    model_time = np.linspace(0.0, duration, num=N)
    resampled = jnp.asarray(
        _resample(time_measured, y_measured, model_time), dtype)
    o = resampled.shape[1]

    def obj(free):
        states = free[:n * N].reshape((n, N))
        outputs = states[:o].T
        return dis_period * jnp.sum((outputs - resampled) ** 2)

    import jax
    return obj, jax.grad(obj)
