"""Oracle tests for the collocation transcription.

Pattern follows the reference test strategy (SURVEY.md section 4 /
opty/tests/test_direct_collocation.py:658-1017): a tiny spring-damper
problem, N = 4 nodes, with the constraint vector and densified COO
Jacobian asserted against hand-derived NumPy arrays.  All expected
values below are derived from the discretization math, not copied.

System:  0 = x' - v ;  0 = m*v' + c*v + k*x - F(t)
"""

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sm
import pytest

from opty_tpu.transcribe import ConstraintCollocator

t = sm.Symbol('t')
x, v, F = [sm.Function(s)(t) for s in 'xvF']
m, c, k = sm.symbols('m, c, k')

EOM = sm.Matrix([x.diff(t) - v,
                 m * v.diff(t) + c * v + k * x - F])

H = 0.01
N = 4

rng = np.random.default_rng(42)


def dense_from_coo(vals, rows, cols, shape):
    J = np.zeros(shape)
    for val, r, co in zip(vals, rows, cols):
        J[r, co] += val
    return J


class TestKnownEverything:
    """All parameters and the input trajectory known: free = [x, v]."""

    def setup_method(self):
        self.F_vals = rng.normal(size=N)
        self.col = ConstraintCollocator(
            EOM, (x, v), N, H,
            known_parameter_map={m: 1.5, c: 0.3, k: 2.0},
            known_trajectory_map={F: self.F_vals},
            time_symbol=t)
        self.X = rng.normal(size=N)
        self.V = rng.normal(size=N)
        self.free = np.hstack([self.X, self.V])

    def expected_be(self):
        X, V, Fv = self.X, self.V, self.F_vals
        r1 = [(X[i] - X[i - 1]) / H - V[i] for i in range(1, N)]
        r2 = [1.5 * (V[i] - V[i - 1]) / H + 0.3 * V[i] + 2.0 * X[i] - Fv[i]
              for i in range(1, N)]
        return np.hstack([r1, r2])

    def test_sizes(self):
        col = self.col
        assert col.num_states == 2
        assert col.num_eom == 2
        assert col.num_free == 8
        assert col.num_constraints == 6
        assert col.num_unknown_parameters == 0
        assert col.num_unknown_input_trajectories == 0
        assert col.known_parameters == (m, c, k)
        assert col.known_input_trajectories == (F,)

    def test_constraints_backward_euler(self):
        got = self.col.generate_constraint_function()(self.free)
        np.testing.assert_allclose(got, self.expected_be(), rtol=1e-12)

    def test_jacobian_backward_euler(self):
        col = self.col
        vals = col.generate_jacobian_function()(self.free)
        rows, cols = col.jacobian_indices()
        J = dense_from_coo(vals, rows, cols, (6, 8))
        expected = np.zeros((6, 8))
        for i in range(1, N):
            ic = i - 1  # constraint interval index
            # r1 rows at ic; r2 rows at 3 + ic
            expected[ic, i] = 1 / H          # d r1 / d x_i
            expected[ic, i - 1] = -1 / H     # d r1 / d x_{i-1}
            expected[ic, N + i] = -1.0       # d r1 / d v_i
            expected[3 + ic, i] = 2.0        # k
            expected[3 + ic, N + i] = 1.5 / H + 0.3
            expected[3 + ic, N + i - 1] = -1.5 / H
        np.testing.assert_allclose(J, expected, rtol=1e-12)

    def test_jacobian_matches_autodiff(self):
        col = self.col
        vals = col.generate_jacobian_function()(self.free)
        rows, cols = col.jacobian_indices()
        J = dense_from_coo(vals, rows, cols, (6, 8))
        J_ad = np.asarray(jax.jacrev(col.constraints)(
            jnp.asarray(self.free)))
        np.testing.assert_allclose(J, J_ad, rtol=1e-12)


class TestMidpoint:
    def setup_method(self):
        self.F_vals = rng.normal(size=N)
        self.col = ConstraintCollocator(
            EOM, (x, v), N, H,
            known_parameter_map={m: 1.5, c: 0.3, k: 2.0},
            known_trajectory_map={F: self.F_vals},
            time_symbol=t, integration_method='midpoint')
        self.X = rng.normal(size=N)
        self.V = rng.normal(size=N)
        self.free = np.hstack([self.X, self.V])

    def test_constraints_midpoint(self):
        X, V, Fv = self.X, self.V, self.F_vals
        r1 = [(X[i + 1] - X[i]) / H - (V[i] + V[i + 1]) / 2
              for i in range(N - 1)]
        r2 = [1.5 * (V[i + 1] - V[i]) / H + 0.3 * (V[i] + V[i + 1]) / 2
              + 2.0 * (X[i] + X[i + 1]) / 2 - (Fv[i] + Fv[i + 1]) / 2
              for i in range(N - 1)]
        got = self.col.generate_constraint_function()(self.free)
        np.testing.assert_allclose(got, np.hstack([r1, r2]), rtol=1e-12)

    def test_jacobian_midpoint_matches_autodiff(self):
        col = self.col
        vals = col.generate_jacobian_function()(self.free)
        rows, cols = col.jacobian_indices()
        J = dense_from_coo(vals, rows, cols, (6, 8))
        J_ad = np.asarray(jax.jacrev(col.constraints)(
            jnp.asarray(self.free)))
        np.testing.assert_allclose(J, J_ad, rtol=1e-12)


class TestUnknowns:
    """m unknown parameter, F unknown trajectory, variable duration."""

    def setup_method(self):
        h_sym = sm.Symbol('h', real=True)
        self.col = ConstraintCollocator(
            EOM, (x, v), N, h_sym,
            known_parameter_map={c: 0.3, k: 2.0},
            time_symbol=t)
        self.X = rng.normal(size=N)
        self.V = rng.normal(size=N)
        self.Fv = rng.normal(size=N)
        self.mval = 1.7
        self.h = 0.013
        self.free = np.hstack([self.X, self.V, self.Fv,
                               [self.mval], [self.h]])

    def test_sizes(self):
        col = self.col
        assert col.num_free == 2 * N + N + 1 + 1
        assert col.unknown_parameters == (m,)
        assert col.unknown_input_trajectories == (F,)
        assert col.variable_duration

    def test_constraints(self):
        X, V, Fv, mv, h = self.X, self.V, self.Fv, self.mval, self.h
        r1 = [(X[i] - X[i - 1]) / h - V[i] for i in range(1, N)]
        r2 = [mv * (V[i] - V[i - 1]) / h + 0.3 * V[i] + 2.0 * X[i] - Fv[i]
              for i in range(1, N)]
        got = self.col.generate_constraint_function()(self.free)
        np.testing.assert_allclose(got, np.hstack([r1, r2]), rtol=1e-12)

    def test_jacobian_matches_autodiff(self):
        col = self.col
        vals = col.generate_jacobian_function()(self.free)
        rows, cols = col.jacobian_indices()
        J = dense_from_coo(vals, rows, cols,
                           (col.num_constraints, col.num_free))
        J_ad = np.asarray(jax.jacrev(col.constraints)(
            jnp.asarray(self.free)))
        np.testing.assert_allclose(J, J_ad, rtol=1e-12, atol=1e-12)
        # spot check the d/dh column: d r1_i/dh = -(x_i - x_{i-1})/h^2
        X, h = self.X, self.h
        for i in range(1, N):
            np.testing.assert_allclose(
                J[i - 1, -1], -(X[i] - X[i - 1]) / h ** 2, rtol=1e-12)

    def test_hessian_blocks_match_dense(self):
        col = self.col
        free = jnp.asarray(self.free)
        y_nodes = jnp.asarray(rng.normal(size=(N - 1, 2)))

        def lagr_con(f):
            res, _ = col.constraints_nodewise(f)
            return jnp.sum(res * y_nodes)

        H_dense = np.asarray(jax.hessian(lagr_con)(free))
        Hd, Ho, Hw, Hww = [np.asarray(a)
                           for a in col.hessian_blocks(free, y_nodes)]
        nz, bw = col._nz, col._bw
        # map node-layout blocks back to free layout
        n, q = col.num_states, col.num_unknown_input_trajectories

        def fidx(node, loc):
            if loc < n:
                return loc * N + node
            return n * N + (loc - n) * N + node

        H_blocks = np.zeros_like(H_dense)
        for i in range(N):
            for a in range(nz):
                for b in range(nz):
                    H_blocks[fidx(i, a), fidx(i, b)] += Hd[i, a, b]
            if i >= 1:
                for a in range(nz):
                    for b in range(nz):
                        H_blocks[fidx(i - 1, a), fidx(i, b)] += Ho[i, a, b]
                        H_blocks[fidx(i, b), fidx(i - 1, a)] += Ho[i, a, b]
            for a in range(nz):
                for j in range(bw):
                    H_blocks[fidx(i, a), (n + q) * N + j] += Hw[i, a, j]
                    H_blocks[(n + q) * N + j, fidx(i, a)] += Hw[i, a, j]
        for a in range(bw):
            for b in range(bw):
                H_blocks[(n + q) * N + a, (n + q) * N + b] += Hww[a, b]
        np.testing.assert_allclose(H_blocks, H_dense, rtol=1e-9, atol=1e-9)


class TestInstanceConstraints:
    def setup_method(self):
        duration = (N - 1) * H
        self.instance = (x.subs(t, 0.0) - 1.0,
                         x.subs(t, duration) + 2.0,
                         v.subs(t, 0.0))
        self.col = ConstraintCollocator(
            EOM, (x, v), N, H,
            known_parameter_map={m: 1.5, c: 0.3, k: 2.0},
            known_trajectory_map={F: np.zeros(N)},
            instance_constraints=self.instance,
            time_symbol=t)
        self.X = rng.normal(size=N)
        self.V = rng.normal(size=N)
        self.free = np.hstack([self.X, self.V])

    def test_counts_and_values(self):
        col = self.col
        assert col.num_instance_constraints == 3
        assert col.num_constraints == 6 + 3
        got = col.generate_constraint_function()(self.free)
        np.testing.assert_allclose(
            got[-3:], [self.X[0] - 1.0, self.X[-1] + 2.0, self.V[0]],
            rtol=1e-12)

    def test_jacobian_with_instances(self):
        col = self.col
        vals = col.generate_jacobian_function()(self.free)
        rows, cols = col.jacobian_indices()
        J = dense_from_coo(vals, rows, cols,
                           (col.num_constraints, col.num_free))
        J_ad = np.asarray(jax.jacrev(col.constraints)(
            jnp.asarray(self.free)))
        np.testing.assert_allclose(J, J_ad, rtol=1e-12, atol=1e-12)


class TestImplicitKnownTrajectory:
    """Known trajectory as a pointwise function of a state:
    theta(x(t)) with d(theta)/dx flowing through JAX AD (the reference
    needs explicit chain-rule machinery + user-provided derivative
    arrays; test_implicit_known_traj opty/tests:18-278)."""

    def test_residual_and_jacobian(self):
        theta = sm.Function('theta')(x)
        eom = sm.Matrix([x.diff(t) - v,
                         v.diff(t) + sm.sin(theta) + v])

        def theta_of_x(xval):
            return 0.5 * xval ** 2

        col = ConstraintCollocator(
            eom, (x, v), N, H,
            known_trajectory_map={theta: theta_of_x},
            time_symbol=t)
        X = rng.normal(size=N)
        V = rng.normal(size=N)
        free = np.hstack([X, V])
        got = col.generate_constraint_function()(free)
        r2 = [(V[i] - V[i - 1]) / H + np.sin(0.5 * X[i] ** 2) + V[i]
              for i in range(1, N)]
        np.testing.assert_allclose(got[3:], r2, rtol=1e-12)

        # Jacobian must include the chain-rule term cos(theta)*x_i
        vals = col.generate_jacobian_function()(free)
        rows, cols = col.jacobian_indices()
        J = dense_from_coo(vals, rows, cols, (6, 8))
        for i in range(1, N):
            np.testing.assert_allclose(
                J[3 + (i - 1), i], np.cos(0.5 * X[i] ** 2) * X[i],
                rtol=1e-12)


class TestErrors:
    def test_duplicate_states(self):
        with pytest.raises(ValueError):
            ConstraintCollocator(EOM, (x, x), N, H, time_symbol=t)

    def test_bad_method(self):
        with pytest.raises(ValueError):
            ConstraintCollocator(EOM, (x, v), N, H, time_symbol=t,
                                 integration_method='rk4')

    def test_wrong_known_traj_length(self):
        with pytest.raises(ValueError):
            ConstraintCollocator(
                EOM, (x, v), N, H,
                known_parameter_map={m: 1.0, c: 1.0, k: 1.0},
                known_trajectory_map={F: np.zeros(N + 1)}, time_symbol=t)


class TestHessianAliasDetection:
    """check_structured_hessian flags objectives that couple
    non-adjacent nodes (VERDICT round-1 weak item 7)."""

    def test_node_local_objective_passes(self):
        import jax.numpy as jnp
        from opty_tpu.transcribe.hessian import check_structured_hessian
        N, n, q, bw = 13, 2, 1, 1

        def fun(free):
            return jnp.sum(free ** 2) + jnp.sum(free[:N] ** 3)

        free = np.linspace(0.1, 1.0, (n + q) * N + bw)
        err = check_structured_hessian(fun, free, N, n, q, bw)
        assert err < 1e-10

    def test_distant_coupling_detected(self):
        import jax.numpy as jnp
        import warnings as _w
        from opty_tpu.transcribe.hessian import check_structured_hessian
        N, n, q, bw = 13, 2, 1, 1

        def fun(free):
            # couples node 0 and node N-1 nonlinearly
            return free[0] ** 2 * free[N - 1] ** 2

        free = np.linspace(0.1, 1.0, (n + q) * N + bw)
        err = check_structured_hessian(fun, free, N, n, q, bw)
        assert err > 1e-3

    def test_problem_warns_on_aliasing(self):
        import warnings
        import jax.numpy as jnp
        import sympy as sm
        from opty_tpu import Problem
        t = sm.Symbol('t')
        x, v, F = [sm.Function(s)(t) for s in 'xvF']
        eom = sm.Matrix([x.diff(t) - v, v.diff(t) - F])
        N = 11

        def obj(free):
            return free[0] ** 2 * free[N - 1] ** 2 + jnp.sum(free ** 2)

        prob = Problem(obj, None, eom, (x, v), N, 0.1, time_symbol=t)
        prob.set_solver_options(max_iter=1)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter('always')
            prob.solve(np.full(prob.num_free, 0.3))
        assert any('block-tridiagonal' in str(w.message) for w in rec)


class TestDiscreteSymbolIntrospection:
    """Reference API parity: the symbolic discretization the numeric
    kernel implements is exposed through the same read-only properties
    the reference builds eagerly (opty/direct_collocation.py:2037-2156,
    oracle style of opty/tests/test_direct_collocation.py:758-789)."""

    def _collocator(self, method):
        import sympy as sm
        from opty_tpu.transcribe import ConstraintCollocator
        t, m, c, k = sm.symbols('t, m, c, k')
        x, v, f = [sm.Function(s)(t) for s in ('x', 'v', 'f')]
        eom = sm.Matrix([x.diff(t) - v,
                         m * v.diff(t) + c * v + k * x - f])
        return ConstraintCollocator(
            eom, (x, v), 4, 0.5,
            known_parameter_map={m: 1.0, c: 2.0, k: 3.0},
            time_symbol=t, integration_method=method), (x, v, f)

    def test_backward_euler_discrete_eom(self):
        import sympy as sm
        col, _ = self._collocator('backward euler')
        xi, vi = col.current_discrete_state_symbols
        xp, vp = col.previous_discrete_state_symbols
        (fi,) = col.current_discrete_specified_symbols
        m, c, k = sm.symbols('m, c, k')
        h = col.time_interval_symbol
        expected = sm.Matrix([(xi - xp) / h - vi,
                              m * (vi - vp) / h + c * vi + k * xi - fi])
        diff = sm.simplify(col.discrete_eom - expected)
        assert diff == sm.zeros(2, 1)

    def test_midpoint_discrete_eom(self):
        import sympy as sm
        col, _ = self._collocator('midpoint')
        xi, vi = col.current_discrete_state_symbols
        xn, vn = col.next_discrete_state_symbols
        (fi,) = col.current_discrete_specified_symbols
        (fn,) = col.next_discrete_specified_symbols
        m, c, k = sm.symbols('m, c, k')
        h = col.time_interval_symbol
        expected = sm.Matrix([
            (xn - xi) / h - (vi + vn) / 2,
            m * (vn - vi) / h + c * (vi + vn) / 2
            + k * (xi + xn) / 2 - (fi + fn) / 2])
        diff = sm.simplify(col.discrete_eom - expected)
        assert diff == sm.zeros(2, 1)
