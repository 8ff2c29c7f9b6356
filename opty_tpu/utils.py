"""User-facing utilities.

API parity with opty/utils.py: ``parse_free`` (:277-326),
``create_objective_function`` (:329-470), ``state_derivatives``
(:263-266), ``f_minus_ma`` (:269-274), ``sort_sympy`` (:473-480),
``sum_of_sines`` (:1002-1039), ``controllable`` (:931-954),
``substitute_matrix`` (:957-999).  Objective/gradient callables
returned here are JAX-traceable functions of the free vector (the
reference returns NumPy callables); the gradient is exact AD of the
discrete objective, which for midpoint integration is *more* accurate
than the reference's endpoint-half-weight approximation
(opty/utils.py:442-447).
"""

from functools import partial

import numpy as np
import sympy as sm
import sympy.physics.mechanics as me

import jax
import jax.numpy as jnp

from .config import default_dtype
from .symbolics.classify import sort_sympy  # noqa: F401 (re-export)

__all__ = ['state_derivatives', 'f_minus_ma', 'parse_free', 'MathJaxRepr', 'building_docs', 'lambdify_matrix',
           'create_objective_function', 'sort_sympy', 'sum_of_sines',
           'controllable', 'substitute_matrix']


def state_derivatives(states):
    """Returns functions of time which represent the time derivatives
    of the states."""
    return [state.diff() for state in states]


def f_minus_ma(mass_matrix, forcing_vector, states):
    """Returns Fr + Fr* from the mass_matrix and forcing vector."""
    xdot = sm.Matrix(state_derivatives(states))
    return mass_matrix * xdot - forcing_vector


def parse_free(free, n, q, N, variable_duration=False):
    """Parses the free parameters vector and returns its components.

    Parameters
    ----------
    free : ndarray, shape(n*N + q*N + r + s)
    n : number of states
    q : number of free specified inputs
    N : number of time steps
    variable_duration : if True the last value is the node interval.

    Returns
    -------
    states : ndarray, shape(n, N)
    specified_values : ndarray shape(q, N) or shape(N,) or None
    constant_values : ndarray, shape(r,)
    time_interval : float (only if variable_duration)
    """
    # Segment layout: [states (n*N) | inputs (q*N) | params (r) | h?].
    # Works on NumPy and JAX arrays alike (plain slicing/reshape).
    state_cut, input_cut = n * N, (n + q) * N
    states = free[:state_cut].reshape((n, N))
    # Reference quirk kept for parity (opty/utils.py:277-326): a single
    # unknown input comes back 1-D, several come back (q, N).
    if q == 0:
        specified = None
    elif q == 1:
        specified = free[state_cut:input_cut]
    else:
        specified = free[state_cut:input_cut].reshape((q, N))
    tail = free[input_cut:]
    if variable_duration:
        return states, specified, tail[:-1], tail[-1]
    return states, specified, tail


def create_objective_function(objective, state_symbols,
                              unknown_input_trajectories,
                              unknown_parameters,
                              num_collocation_nodes, node_time_interval,
                              integration_method='backward euler',
                              time_symbol=None):
    """Creates JAX functions to evaluate the objective and its gradient.

    Parameters mirror the reference (opty/utils.py:329-364): a SymPy
    objective expression in the states, unknown inputs and unknown
    parameters, possibly containing non-nested indefinite time
    integrals ``Integral(expr, t)``; discretization follows the chosen
    integration method (backward Euler weights [0, 1, ..., 1] * h;
    midpoint evaluates the integrand at interval midpoints).

    Returns ``(obj, obj_grad)`` where both take the free vector; the
    gradient is exact reverse-mode AD of the discrete objective.
    """
    if time_symbol is None:
        time_symbol = me.dynamicsymbols._t
    if integration_method not in ('backward euler', 'midpoint'):
        raise NotImplementedError(
            "Integration method '{}' is not implemented.".format(
                integration_method))

    states = list(state_symbols)
    inputs = sort_sympy(unknown_input_trajectories)
    params = sort_sympy(unknown_parameters)
    n, nq = len(states), len(inputs)
    N = num_collocation_nodes
    h = node_time_interval
    i_idx = n * N
    r_idx = (n + nq) * N
    dtype = default_dtype()

    int_placeholder = sm.Function('_IntegralFunction')

    def parse_expr(expr, in_integral=False):
        if not expr.args:
            return expr
        if isinstance(expr, sm.Integral):
            if in_integral:
                raise NotImplementedError('Nested integrals are not '
                                          'supported.')
            if expr.limits != ((time_symbol,),):
                raise NotImplementedError(
                    'Only indefinite integrals of time are supported.')
            return int_placeholder(parse_expr(expr.function, True))
        return expr.func(*(parse_expr(arg) for arg in expr.args))

    parsed = parse_expr(sm.sympify(objective))

    atoms = states + inputs + params
    dummies = [sm.Dummy('o{}'.format(i)) for i in range(len(atoms))]
    parsed = parsed.xreplace(dict(zip(atoms, dummies)))

    if integration_method == 'backward euler':
        # backward Euler quadrature: weights [0, 1, ..., 1] * h
        # (parity: opty/utils.py:419-428)
        weights = jnp.asarray(np.hstack([0.0, np.ones(N - 1)]), dtype)

        def integrate(vals):
            return h * jnp.sum(vals * weights)
    else:
        # midpoint: the integrand is evaluated at interval midpoints
        # (the obj() wrapper passes midpoint-averaged trajectories), so
        # the quadrature weights are simply h per interval
        # (parity: opty/utils.py:442-447)
        def integrate(vals):
            return h * jnp.sum(vals)

    raw = sm.lambdify(dummies, parsed, modules=[
        {'_IntegralFunction': integrate}, 'jax'], docstring_limit=0)

    midpoint = integration_method == 'midpoint'

    def obj(free):
        free = jnp.asarray(free, dtype)
        X = free[:i_idx].reshape(n, N)
        U = free[i_idx:r_idx].reshape(nq, N)
        P = free[r_idx:]
        if midpoint:
            X = 0.5 * (X[:, :-1] + X[:, 1:])
            U = 0.5 * (U[:, :-1] + U[:, 1:])
        args = [X[i] for i in range(n)] + [U[i] for i in range(nq)] + \
            [P[i] for i in range(len(params))]
        return jnp.asarray(raw(*args), dtype)

    obj_grad = jax.grad(obj)
    return obj, obj_grad


def sum_of_sines(sigma, frequencies, time):
    """Returns a sum of sines centered at zero along with its first and
    second derivatives (parity: opty/utils.py:1002-1039).

    Parameters
    ----------
    sigma : float
        The desired standard deviation of the series.
    frequencies : iterable of floats
        The frequencies of the sin curves to be included in the sum.
    time : array_like, shape(n,)
        The montonically increasing time vector.

    Returns
    -------
    sines, sines_prime, sines_double_prime : ndarrays shape(n,)
    """
    w = np.atleast_1d(np.asarray(frequencies, dtype=float))
    t = np.asarray(time, dtype=float)
    phase = 2.0 * np.pi * np.random.ranf(w.shape)
    amplitude = sigma / 2.0
    # One (n_freq, n_time) phase grid; the three series are its sine,
    # frequency-weighted cosine, and frequency^2-weighted negative sine,
    # summed over the frequency axis.
    arg = np.outer(w, t) + phase[:, None]
    sin_a, cos_a = np.sin(arg), np.cos(arg)
    return (amplitude * sin_a.sum(axis=0),
            amplitude * (w[:, None] * cos_a).sum(axis=0),
            -amplitude * (w[:, None] ** 2 * sin_a).sum(axis=0))


def controllable(a, b):
    """Returns True if the system is controllable, where ``a`` is the
    state matrix and ``b`` the input matrix (Kalman rank condition;
    parity: opty/utils.py:931-954)."""
    a = np.asarray(a)
    b = np.asarray(b)
    n = a.shape[0]
    if b.ndim == 1:
        b = b[:, None]
    cols = [b]
    for _ in range(n - 1):
        cols.append(a @ cols[-1])
    controllability = np.hstack(cols)
    return np.linalg.matrix_rank(controllability) == n


def substitute_matrix(matrix, row_idxs, col_idxs, sub_matrix):
    """Returns the matrix with the values given by row/column indices
    replaced by the sub matrix (parity: opty/utils.py:957-999)."""
    if sub_matrix.shape != (len(row_idxs), len(col_idxs)):
        raise ValueError('The sub matrix is not compatible with the '
                         'provided indices.')
    for i, ri in enumerate(row_idxs):
        for j, cj in enumerate(col_idxs):
            matrix[ri, cj] = sub_matrix[i, j]
    return matrix


class MathJaxRepr:
    """Display object for SymPy expressions in notebook/doc contexts
    (parity: opty/utils.py:47-58)."""

    def __init__(self, expr):
        self.expr = expr

    def _repr_latex_(self):
        return '$${}$$'.format(sm.latex(self.expr))

    def __repr__(self):
        return sm.srepr(self.expr)


def building_docs():
    """True when running inside a documentation build (parity:
    opty/utils.py:231-237)."""
    import os
    return 'READTHEDOCS' in os.environ or 'SPHINX_BUILD' in os.environ


def lambdify_matrix(args, expr):
    """Lower a SymPy matrix to a JAX-traceable function of scalar
    arguments (the JAX analog of the reference's NumPy fallback
    backend, opty/utils.py:598-636; the primary path is
    opty_tpu.symbolics.lower)."""
    from .symbolics.lower import lambdify_jax
    return lambdify_jax(args, list(expr))
