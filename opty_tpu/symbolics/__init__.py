from .lower import lambdify_jax, lower_matrix_function
from .classify import classify_parameters, classify_trajectories, sort_sympy

__all__ = ['lambdify_jax', 'lower_matrix_function', 'classify_parameters',
           'classify_trajectories', 'sort_sympy']
