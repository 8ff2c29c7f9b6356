"""Gait2d-scale model tests: the n-link chain on a cart
(opty_tpu/models/nlink.py — the self-contained analog of the
reference's pygait2d-based advanced problems, plot_sit_to_stand.py).

Covers the two risks the model exists to retire:

* the SymPy->JAX lowering at large op count (the 9-link EoMs expand to
  ~477k SymPy operations; reference gait2d ~100k) — checked by finite
  differences against the lowered constraint function;
* an end-to-end variable-duration solve with the full instance-
  constraint complement (small chain for CPU test speed).
"""

import numpy as np
import sympy as sm
import pytest

from opty_tpu.models.nlink import (n_link_cart_eom, n_link_cart_problem,
                                   n_link_initial_guess)


class TestLoweringAtScale:
    """The 477k-op EoMs must lower, evaluate, and differentiate."""

    @pytest.fixture(scope='class')
    def prob9(self):
        prob, q_start = n_link_cart_problem(num_links=9, num_nodes=12)
        return prob, q_start

    def test_op_count_is_gait_scale(self, prob9):
        prob, _ = prob9
        assert prob.collocator.num_states == 20
        assert sm.count_ops(prob.collocator.eom) > 100_000

    def test_constraints_finite(self, prob9):
        prob, q_start = prob9
        free = n_link_initial_guess(prob, q_start)
        res = np.asarray(prob.con(free))
        assert res.shape == (prob.num_constraints,)
        assert np.all(np.isfinite(res))

    def test_scan_hessian_matches_unrolled_autodiff(self, prob9):
        """The 9-link model crosses the width > 24 threshold, so its
        per-node Lagrangian Hessian runs as a lax.scan over tangent
        directions (program-size control for the remote TPU compile);
        the result must equal the fully-unrolled jax.hessian."""
        import jax
        import jax.numpy as jnp
        prob, q_start = prob9
        col = prob.collocator
        nz = col._nz
        rng = np.random.default_rng(5)
        z_cur = jnp.asarray(rng.standard_normal(nz))
        z_adj = jnp.asarray(rng.standard_normal(nz))
        w = jnp.asarray(np.abs(rng.standard_normal(col._bw)) + 0.1)
        y_row = jnp.asarray(rng.standard_normal(col.num_eom))
        ktc = jnp.zeros((max(len(col._known_input_trajectories), 1),))
        idx = 3

        def scal(v):
            res = col.node_kernel(v[:nz], v[nz:2 * nz], v[2 * nz:],
                                  idx, ktc, ktc)
            return jnp.dot(y_row, res)

        v0 = jnp.concatenate([z_cur, z_adj, w])
        H_scan = np.asarray(col._node_hessian(
            z_cur, z_adj, w, idx, ktc, ktc, y_row))
        H_ref = np.asarray(jax.hessian(scal)(v0))
        np.testing.assert_allclose(H_scan, H_ref, rtol=1e-9, atol=1e-9)

    def test_jacobian_matches_finite_differences(self, prob9):
        prob, q_start = prob9
        rng = np.random.default_rng(3)
        free = n_link_initial_guess(prob, q_start)
        free += 0.01 * rng.standard_normal(free.shape)
        rows, cols = prob.jacobianstructure()
        vals = np.asarray(prob.jacobian(free))
        dense = np.zeros((prob.num_constraints, prob.num_free))
        dense[rows, cols] = vals
        # probe a handful of random directions
        eps = 1e-6
        for _ in range(3):
            v = rng.standard_normal(free.shape)
            v /= np.linalg.norm(v)
            fd = (np.asarray(prob.con(free + eps * v))
                  - np.asarray(prob.con(free - eps * v))) / (2 * eps)
            np.testing.assert_allclose(dense @ v, fd, rtol=1e-4,
                                       atol=1e-5)


class TestEndToEnd:
    def test_two_link_reach_solves(self):
        prob, q_start = n_link_cart_problem(num_links=2, num_nodes=31)
        guess = n_link_initial_guess(prob, q_start)
        sol, info = prob.solve(guess)
        assert info['status'] in (0, 1)
        assert info['inf_pr'] < 1e-6
        N = 31
        # final configuration reached: all coordinates at zero
        for i in range(3):
            np.testing.assert_allclose(sol[i * N + N - 1], 0.0,
                                       atol=1e-5)
        # duration stays inside its bounds (default h_bounds ub = 0.2)
        assert 0.0 < sol[-1] <= 0.2 + 1e-12

    def test_underactuated_variant_builds(self):
        eom, states, inputs, par_map = n_link_cart_eom(
            2, joint_torques=False)
        assert len(inputs) == 1
        assert len(states) == 6
        assert eom.shape[0] == 6
