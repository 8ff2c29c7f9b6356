"""Wires a ConstraintCollocator into the interior-point solver.

Builds the ``IPMFunctions`` whose ``kkt_solve`` exploits the
block-tridiagonal-with-border structure of the collocation KKT system
(see nlp/kkt.py).  The Lagrangian Hessian is assembled exactly:

  * equation-of-motion part: per-interval ``jax.hessian`` blocks
    (ConstraintCollocator.hessian_blocks);
  * objective + instance-constraint part: colored Hessian-vector
    products (transcribe/hessian.py).

Both are exact for the problem class the reference supports, giving
quadratic local convergence where the reference's Ipopt-with-L-BFGS
setup (no Hessian callback, opty/direct_collocation.py C22) is
superlinear at best.
"""

import jax
import jax.numpy as jnp

from ..config import default_factor_dtype
from ..transcribe.hessian import make_structured_scalar_hessian
from .ipm import IPMFunctions
from .kkt import KKTBlocks, solve_structured_kkt

__all__ = ['make_collocation_nlp_functions']


def make_collocation_nlp_functions(col, objective, gradient=None,
                                   factor_dtype=None, refine_steps=1):
    """IPMFunctions for a collocation problem.

    Parameters
    ----------
    col : ConstraintCollocator
    objective : callable free -> scalar (JAX-traceable)
    gradient : optional callable free -> (nfree,); default jax.grad.
    """
    n = col.num_states
    q = col.num_unknown_input_trajectories
    nz = col._nz
    bw = col._bw
    M = col.num_eom
    N = col.num_collocation_nodes
    o = col.num_instance_constraints
    ni = N - 1
    be = col.integration_method == 'backward euler'
    dtype = col._dtype
    if factor_dtype is None:
        factor_dtype = default_factor_dtype()

    struct_hess = make_structured_scalar_hessian(N, n, q, bw, dtype)
    grad_fn = gradient if gradient is not None else jax.grad(objective)

    def split_free(vec):
        """free-layout vector -> (node part (N, nz), border part (bw,))."""
        X = vec[:n * N].reshape(n, N)
        U = vec[n * N:nz * N].reshape(q, N)
        nodes = jnp.concatenate([X.T, U.T], axis=1)
        return nodes, vec[nz * N:]

    def join_free(nodes, border):
        parts = [nodes[:, :n].T.reshape(-1)]
        if q:
            parts.append(nodes[:, n:].T.reshape(-1))
        parts.append(border)
        return jnp.concatenate(parts)

    def split_con(vec):
        """constraint-layout vector -> ((ni, M) eom part, (o,) inst)."""
        eom = vec[:M * ni].reshape(M, ni).T
        return eom, vec[M * ni:]

    def join_con(eom_nodes, inst):
        return jnp.concatenate([eom_nodes.T.reshape(-1), inst])

    def kkt_solve(x, y, sigma_x, ds, rx, rc):
        y_nodes, y_inst = split_con(y)

        A, B, C, G = col.jacobian_blocks(x)
        Hd, Ho, Hw, Hww = col.hessian_blocks(x, y_nodes)

        def phi(f):
            val = objective(f)
            if o:
                val = val + jnp.dot(y_inst, col.eval_instance_constraints(f))
            return val

        Hd2, Ho2, Hw2, Hww2 = struct_hess(phi, x)
        Hd = Hd + Hd2
        Ho = Ho + Ho2
        Hw = Hw + Hw2
        Hww = Hww + Hww2

        sz, sw = split_free(sigma_x)
        Hd = Hd + jax.vmap(jnp.diag)(sz)
        Hww = Hww + jnp.diag(sw)

        # constraint block k couples z_{k-1}, z_k (k = 1..N-1):
        # backward Euler interval i: cur = i+1 (= k), adj = i (= k-1)
        # midpoint interval i: cur = i (= k-1), adj = i+1 (= k)
        P = jnp.zeros((N, M, nz), dtype).at[1:].set(A if be else B)
        Q = jnp.zeros((N, M, nz), dtype).at[1:].set(B if be else A)
        Cn = jnp.zeros((N, M, bw), dtype).at[1:].set(C)

        ds_nodes, ds_inst = split_con(ds)
        Ds = jnp.ones((N, M), dtype).at[1:].set(ds_nodes)

        Gz, Gw = split_instance_jac(G)

        blocks = KKTBlocks(Hd=Hd, Ho=Ho, Hw=Hw, Hww=Hww, P=P, Q=Q, C=Cn,
                           Ds=Ds, Gz=Gz, Gw=Gw, Di=ds_inst)

        rz, rw = split_free(rx)
        rc_nodes, rc_inst = split_con(rc)
        ry = jnp.zeros((N, M), dtype).at[1:].set(rc_nodes)
        r_nodes = jnp.concatenate([rz, ry], axis=1)
        r_border = jnp.concatenate([rw, rc_inst])

        u, beta = solve_structured_kkt(blocks, r_nodes, r_border,
                                       factor_dtype=factor_dtype,
                                       refine_steps=refine_steps)
        dx = join_free(u[:, :nz], beta[:bw])
        dy = join_con(u[1:, nz:], beta[bw:])
        return dx, dy

    def split_instance_jac(G):
        if o:
            GX = G[:, :n * N].reshape(o, n, N)
            GU = G[:, n * N:nz * N].reshape(o, q, N)
            Gz = jnp.concatenate([jnp.swapaxes(GX, 1, 2),
                                  jnp.swapaxes(GU, 1, 2)], axis=2)
            Gw = G[:, nz * N:]
        else:
            Gz = jnp.zeros((0, N, nz), dtype)
            Gw = jnp.zeros((0, bw), dtype)
        return Gz, Gw

    return IPMFunctions(objective=objective, gradient=grad_fn,
                        constraints=col.constraints, kkt_solve=kkt_solve)
