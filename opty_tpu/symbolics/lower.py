"""SymPy -> JAX lowering.

This replaces the reference's C code generation pipeline
(opty/utils.py:483-928, ``ufuncify_matrix``: SymPy cse -> C source ->
Cython loop -> compiled module).  The TPU-native equivalent lowers the
*continuous* equations of motion once into a single JAX-traceable scalar
kernel; discretization, the node loop (``vmap``), differentiation
(``jacfwd``/``jacrev``/``hessian``) and compilation (XLA) are all
numeric transforms applied downstream, so no symbolic differentiation
(opty/utils.py:82-228 ``_forward_jacobian``) and no per-problem C
compilation is needed at all.

Determinism: ``sympy.cse`` with ``numbered_symbols`` plus lambdify's
deterministic printer means the same expressions lower to the same
Python source, which traces to the same jaxpr, so XLA's persistent
compilation cache gets stable keys (the analog of the reference's
``opty_code_hash`` binary cache, opty/utils.py:759-770).
"""

from functools import partial

import jax.numpy as jnp
import sympy as sm

__all__ = ['lambdify_jax', 'lower_matrix_function']


def _cse(exprs, **kwargs):
    return sm.cse(exprs, symbols=sm.numbered_symbols('_z'), order='none',
                  **kwargs)


def _safe_tanh(x):
    # On TPU, float64 is emulated through exp-based expansions that
    # overflow for |x| >~ 300 (jnp.tanh(600.) -> nan there, 1.0 on
    # CPU).  tanh saturates to +-1 within one f64 ulp for |x| > 40, so
    # clamping first is exact and removes the overflow.  Gallery
    # models use tanh(20*v) as a smooth sign() (e.g. reference
    # plot_mississippi_steamboat.py drag forces), which hits this
    # range routinely.
    return jnp.tanh(jnp.clip(x, -40.0, 40.0))


_JAX_OVERRIDES = {'tanh': _safe_tanh}


def lambdify_jax(args, exprs, use_cse=True):
    """Lower SymPy expressions to a JAX-traceable scalar function.

    Parameters
    ----------
    args : sequence of Symbol/Function/Derivative
        The inputs, each treated as a scalar.
    exprs : sequence of Expr
        Expressions to evaluate.

    Returns
    -------
    fn : callable
        ``fn(*values) -> jnp.ndarray shape (len(exprs),)`` where each
        value is a scalar (or traced scalar).  Safe under ``jax.vmap``,
        ``jax.jit`` and all JAX AD transforms.
    """
    exprs = list(exprs)
    cse_fn = _cse if use_cse else None
    raw = sm.lambdify(tuple(args), exprs, modules=[_JAX_OVERRIDES, 'jax'],
                      cse=cse_fn, docstring_limit=0)

    def fn(*values):
        out = raw(*values)
        return jnp.stack([jnp.asarray(v) for v in out])

    fn._sympy_source = raw
    return fn


def lower_matrix_function(args, matrix, use_cse=True):
    """Lower a SymPy column Matrix into a JAX function returning (M,)."""
    if hasattr(matrix, 'shape') and not isinstance(matrix, (list, tuple)):
        exprs = list(matrix)
    else:
        exprs = list(matrix)
    return lambdify_jax(args, exprs, use_cse=use_cse)
