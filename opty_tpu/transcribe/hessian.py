"""Structured Hessian recovery via colored Hessian-vector products.

The Lagrangian Hessian of a collocation NLP is block-tridiagonal in the
node axis plus a dense border (unknown parameters / free h): constraint
blocks couple only adjacent nodes and typical objectives are node-local
sums.  The equation-of-motion part is computed exactly per node (see
ConstraintCollocator.hessian_blocks); this module recovers the
*objective + instance-constraint* part of the Hessian with
3*(n+q) + bw Hessian-vector products using a 3-coloring of the node
axis: a block-tridiagonal matrix restricted to columns of nodes
i = c (mod 3) has disjoint row support per seed, so every entry is read
off exactly (the AD analog of curvature probing/graph coloring in
sparse finite-difference Jacobian estimation).

Exactness requires the target function's Hessian sparsity to be within
block-tridiagonal + border, which holds for objectives built by
``create_objective_function`` (node-local for backward Euler, adjacent
coupling for midpoint) and for the overwhelmingly common linear
instance constraints.  Longer-range couplings (e.g. a nonlinear product
of x(0) and x(T) in an instance constraint) alias into nearby blocks;
the solver then behaves like an inexact-Newton method — still globally
convergent through the line search, with a possibly reduced local rate.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['make_structured_scalar_hessian', 'structured_scalar_hessian']


def make_hvp_seeds(N, n, q, bw, dtype):
    """Static (3*(n+q)+bw, nfree) seed matrix in free-vector layout."""
    nz = n + q
    nfree = nz * N + bw
    ncol = 3 * nz + bw
    seeds = np.zeros((ncol, nfree))
    nodes = np.arange(N)
    for c in range(3):
        sel = nodes[nodes % 3 == c]
        for loc in range(nz):
            if loc < n:
                idx = loc * N + sel
            else:
                idx = n * N + (loc - n) * N + sel
            seeds[c * nz + loc, idx] = 1.0
    for j in range(bw):
        seeds[3 * nz + j, nz * N + j] = 1.0
    return jnp.asarray(seeds, dtype)


def structured_scalar_hessian(fun, free, N, n, q, bw, seeds=None):
    """Recover the block-tridiagonal + border Hessian of scalar ``fun``.

    Returns (Hd (N,nz,nz), Ho (N,nz,nz) with Ho[k] the (k-1,k) block,
    Hw (N,nz,bw), Hww (bw,bw)).
    """
    nz = n + q
    if seeds is None:
        seeds = make_hvp_seeds(N, n, q, bw, free.dtype)

    grad = jax.grad(fun)

    def hvp(v):
        return jax.jvp(grad, (free,), (v,))[1]

    R = jax.vmap(hvp)(seeds)                      # (ncol, nfree)

    # free layout -> node layout per row
    ncol = R.shape[0]
    X = R[:, :n * N].reshape(ncol, n, N)
    U = R[:, n * N:nz * N].reshape(ncol, q, N)
    Rn = jnp.concatenate([jnp.swapaxes(X, 1, 2),
                          jnp.swapaxes(U, 1, 2)], axis=2)  # (ncol, N, nz)
    Rw = R[:, nz * N:]                                     # (ncol, bw)

    colsel = jnp.asarray(np.arange(N) % 3)
    idx_mat = colsel[:, None] * nz + jnp.arange(nz)[None, :]  # (N, nz)

    # Hd[i][:, l] = Rn[colsel[i]*nz + l, i, :]
    gathered = Rn[idx_mat, jnp.arange(N)[:, None], :]       # (N, nz, nz)
    Hd = jnp.swapaxes(gathered, 1, 2)

    # Ho[i] (block (i-1, i)): Ho[i][:, l] = Rn[colsel[i]*nz + l, i-1, :]
    prev_rows = jnp.maximum(jnp.arange(N) - 1, 0)
    gathered_prev = Rn[idx_mat, prev_rows[:, None], :]
    Ho = jnp.swapaxes(gathered_prev, 1, 2)
    Ho = Ho.at[0].set(0.0)

    if bw:
        Hw = jnp.moveaxis(Rn[3 * nz:], 0, 2)                # (N, nz, bw)
        Hww = Rw[3 * nz:].T                                 # (bw, bw)
    else:
        Hw = jnp.zeros((N, nz, 0), free.dtype)
        Hww = jnp.zeros((0, 0), free.dtype)
    return Hd, Ho, Hw, Hww


def make_structured_scalar_hessian(N, n, q, bw, dtype):
    """Close over precomputed seeds."""
    seeds = make_hvp_seeds(N, n, q, bw, dtype)

    def run(fun, free):
        return structured_scalar_hessian(fun, free, N, n, q, bw, seeds=seeds)
    return run
