"""User-facing Problem class.

API parity with the reference ``opty.direct_collocation.Problem``
(opty/direct_collocation.py:93-1377): same constructor signature, free
vector and constraint ordering, bounds/eom_bounds semantics,
``solve()`` result contract (:290-311), ``parse_free``,
``extract_values``/``fill_free``, ``time_vector``,
``create_linear_initial_guess``, plotting methods and Ipopt-style
``add_option``.  The backend is the JAX-native interior-point solver
with structured KKT factorization instead of cyipopt/Ipopt, so
``solve`` additionally exposes ``solve_batch`` (vmapped multi-start /
MPC / parameter-sweep solves — the workload of
examples/inverted_pendulum/run_a_bunch.py — in a single device launch).
"""

import inspect

import numpy as np
import sympy as sm

import jax
import jax.numpy as jnp

from .config import default_dtype, on_tpu
from .nlp.collocation import make_collocation_nlp_functions
from .nlp.ipm import IPMOptions, solve_ipm
from .nlp.status import STATUS_MESSAGES
from .transcribe.collocator import ConstraintCollocator
from .utils import parse_free
from . import plotting

__all__ = ['Problem']

# Map of Ipopt option names (accepted through add_option for reference
# compatibility) to IPMOptions fields.
_IPOPT_OPTION_MAP = {
    'tol': 'tol',
    'acceptable_tol': 'acceptable_tol',
    'acceptable_iter': 'acceptable_iter',
    'max_iter': 'max_iter',
    'mu_init': 'mu_init',
}


class Problem:
    """Direct collocation NLP problem.

    See the reference docstring (opty/direct_collocation.py:93-135) for
    the free-variable and constraint ordering; both are reproduced
    exactly.
    """

    INF = 10e19

    def __init__(self, obj, obj_grad, equations_of_motion, state_symbols,
                 num_collocation_nodes, node_time_interval,
                 known_parameter_map={}, known_trajectory_map={},
                 instance_constraints=None, time_symbol=None, tmp_dir=None,
                 integration_method='backward euler', parallel=False,
                 bounds=None, show_compile_output=False, backend='jax',
                 eom_bounds=None, dtype=None):
        if not equations_of_motion.has(sm.Derivative):
            raise ValueError('No time derivatives are present.'
                             ' The equations of motion must be ordinary '
                             'differential equations (ODEs) or '
                             'differential algebraic equations (DAEs).')

        self._dtype = dtype or default_dtype()
        self.collocator = ConstraintCollocator(
            equations_of_motion, state_symbols, num_collocation_nodes,
            node_time_interval, known_parameter_map, known_trajectory_map,
            instance_constraints, time_symbol, integration_method,
            dtype=self._dtype, parallel=parallel,
            show_compile_output=show_compile_output, backend=backend,
            tmp_dir=tmp_dir)

        self._bounds = bounds

        if eom_bounds is not None:
            bad = [k for k in eom_bounds
                   if k not in range(self.collocator.num_eom)]
            if bad:
                raise ValueError('Keys {} in eom_bounds do not correspond '
                                 'to equations of motion.'.format(bad))
        self._eom_bounds = eom_bounds

        # objective: accept obj(free) or obj(self, free) like the
        # reference (opty/direct_collocation.py:442-468); must be
        # JAX-traceable.  obj_grad may be None (exact AD is used).
        self._wrap_objective(obj, obj_grad)

        self.num_free = self.collocator.num_free
        self.num_constraints = self.collocator.num_constraints

        self.con = self.collocator.generate_constraint_function()
        self.con_jac = self.collocator.generate_jacobian_function()
        self.con_jac_rows, self.con_jac_cols = \
            self.collocator.jacobian_indices()

        self._generate_bound_arrays()
        self._generate_constraint_bound_arrays()
        self._extraction_indices = self._generate_extraction_indices()

        self._ipm_options = IPMOptions()
        self._factor_dtype = None
        self._kkt_method = None
        self._mesh = None
        self._refine_steps = None
        # iterations per device execution; None = auto (chunked on TPU
        # where the remote-execution path kills long launches)
        self._chunk_iters = None
        self._solver = None
        self._batch_solver = None
        self.obj_value = []

    # ------------------------------------------------------------------
    def _wrap_objective(self, obj, obj_grad):
        def num_args(f):
            try:
                sig = inspect.signature(f)
            except (TypeError, ValueError):
                return 1
            return len([p for p in sig.parameters.values()
                        if p.default is inspect.Parameter.empty
                        and p.kind in (p.POSITIONAL_ONLY,
                                       p.POSITIONAL_OR_KEYWORD)])

        if num_args(obj) not in (1, 2):
            raise ValueError('The objective function can only have one or '
                             'two arguments.')
        self.obj = obj
        self.obj_grad = obj_grad

        if num_args(obj) == 2:
            self._obj_fn = lambda free: obj(self, free)
        else:
            self._obj_fn = obj
        if obj_grad is None:
            self._obj_grad_fn = None
        elif num_args(obj_grad) == 2:
            self._obj_grad_fn = lambda free: obj_grad(self, free)
        else:
            self._obj_grad_fn = obj_grad

    # ------------------------------------------------------------------
    @property
    def bounds(self):
        """The bounds dictionary mapping unknown variables to
        (lower, upper) tuples."""
        return self._bounds

    @property
    def eom_bounds(self):
        """The equation-of-motion bounds dictionary mapping eom row
        index to (lower, upper)."""
        return self._eom_bounds

    def _generate_bound_arrays(self):
        """Box bounds in free-vector layout (parity:
        opty/direct_collocation.py:388-440): scalars or per-node (N,)
        arrays for trajectories; default (-INF, INF)."""
        N = self.collocator.num_collocation_nodes
        lb = np.full(self.num_free, -self.INF)
        ub = np.full(self.num_free, self.INF)
        if self._bounds is not None:
            d = self._extraction_indices_static()
            for var, (low, upp) in self._bounds.items():
                if var not in d:
                    raise ValueError(
                        'Bound variable {} is not an unknown state, '
                        'trajectory, parameter, or time interval.'
                        .format(var))
                idxs = d[var]
                low = np.broadcast_to(np.asarray(low, dtype=float),
                                      (len(idxs),))
                upp = np.broadcast_to(np.asarray(upp, dtype=float),
                                      (len(idxs),))
                lb[idxs] = low
                ub[idxs] = upp
        self.lower_bound = lb
        self.upper_bound = ub

    def _generate_constraint_bound_arrays(self):
        """cl/cu rows: equality (0, 0) by default; eom_bounds rows
        become path inequalities (parity: :370-386)."""
        M = self.collocator.num_eom
        N = self.collocator.num_collocation_nodes
        o = self.collocator.num_instance_constraints
        ni = N - 1
        cl = np.zeros(self.num_constraints)
        cu = np.zeros(self.num_constraints)
        if self._eom_bounds is not None:
            for idx, (low, upp) in self._eom_bounds.items():
                cl[idx * ni:(idx + 1) * ni] = low
                cu[idx * ni:(idx + 1) * ni] = upp
        self._low_con_bounds = cl
        self._upp_con_bounds = cu

    def _extraction_indices_static(self):
        d = {}
        col = self.collocator
        N = col.num_collocation_nodes
        n = col.num_states
        q = col.num_unknown_input_trajectories
        r = col.num_unknown_parameters
        for i, var in enumerate(col.state_symbols):
            d[var] = list(range(i * N, (i + 1) * N))
        for i, var in enumerate(col.unknown_input_trajectories):
            d[var] = list(range(n * N + i * N, n * N + (i + 1) * N))
        for i, var in enumerate(col.unknown_parameters):
            d[var] = [(n + q) * N + i]
        if col.variable_duration:
            d[col.time_interval_symbol] = [(n + q) * N + r]
        return d

    def _generate_extraction_indices(self):
        return self._extraction_indices_static()

    # ------------------------------------------------------------------
    # solver configuration (Ipopt-style passthrough)
    # ------------------------------------------------------------------
    def add_option(self, name, value):
        """Sets a solver option.  A compatibility shim for the
        reference's Ipopt option passthrough (cyipopt ``add_option``;
        e.g. examples/inverted_pendulum/pendulum.py:199-209): the
        common numeric options map onto the JAX IPM, everything else is
        accepted and ignored with a warning."""
        if name in _IPOPT_OPTION_MAP:
            field = _IPOPT_OPTION_MAP[name]
            caster = int if field in ('max_iter', 'acceptable_iter') \
                else float
            self._ipm_options = self._ipm_options._replace(
                **{field: caster(value)})
            self._solver = None
            self._batch_solver = None
        else:
            import warnings
            warnings.warn(
                "Solver option '{}' has no JAX-IPM mapping and is "
                'ignored (output/print options have no meaning here; '
                'use set_solver_options for native options).'
                .format(name), stacklevel=2)

    def set_solver_options(self, factor_dtype=None, kkt_method=None,
                           **kwargs):
        """Directly set IPMOptions fields (native configuration API).

        ``factor_dtype`` selects the KKT factorization precision
        (defaults to f64 on CPU, f32 + iterative refinement on TPU);
        ``kkt_method`` selects 'scan' (sequential block LU) or 'cr'
        (log-depth cyclic reduction, the TPU default).
        """
        if factor_dtype is not None:
            self._factor_dtype = factor_dtype
        if kkt_method is not None:
            self._kkt_method = kkt_method
        if 'mesh' in kwargs:
            # device mesh for kkt_method='spike' (node-sharded KKT)
            self._mesh = kwargs.pop('mesh')
        if 'refine_steps' in kwargs:
            self._refine_steps = kwargs.pop('refine_steps')
        if 'chunk_iters' in kwargs:
            self._chunk_iters = kwargs.pop('chunk_iters')
        self._ipm_options = self._ipm_options._replace(**kwargs)
        self._solver = None
        self._batch_solver = None

    # ------------------------------------------------------------------
    # solving
    # ------------------------------------------------------------------
    def _warn_if_hessian_structure_violated(self, free):
        """One-time aliasing check of the structured Hessian recovery
        (transcribe/hessian.py): the objective + instance terms must
        not couple non-adjacent nodes, else the colored recovery
        aliases and the solver runs as inexact Newton.  Warns instead
        of failing (the line search keeps global convergence)."""
        if getattr(self, '_hessian_checked', False):
            return
        self._hessian_checked = True
        from .transcribe.hessian import check_structured_hessian
        col = self.collocator

        def phi(f):
            val = self._obj_fn(f)
            if col.num_instance_constraints:
                val = val + jnp.sum(col.eval_instance_constraints(f))
            return val

        try:
            err = check_structured_hessian(
                phi, jnp.asarray(np.asarray(free, dtype=np.float64),
                                 self._dtype),
                col.num_collocation_nodes, col.num_states,
                col.num_unknown_input_trajectories, col._bw)
        except Exception:   # pragma: no cover - diagnostics only
            return
        if err > 1e-6:
            import warnings
            warnings.warn(
                'The objective/instance constraints couple collocation '
                'nodes beyond the block-tridiagonal Hessian structure '
                '(relative aliasing error {:.1e}); the solver will run '
                'as an inexact-Newton method with a possibly reduced '
                'local convergence rate.'.format(err), stacklevel=3)

    def _build_solver(self):
        options = self._ipm_options
        col = self.collocator
        obj_fn, grad_fn = self._obj_fn, self._obj_grad_fn
        lb = jnp.asarray(self.lower_bound, self._dtype)
        ub = jnp.asarray(self.upper_bound, self._dtype)
        cl = jnp.asarray(self._low_con_bounds, self._dtype)
        cu = jnp.asarray(self._upp_con_bounds, self._dtype)

        def unscale(res, sf, dsc):
            """Map the scaled-NLP result back to user units (the x
            iterate is unaffected by scaling)."""
            return res._replace(
                obj_val=res.obj_val / sf,
                g=res.g / dsc,
                mult_g=res.mult_g * dsc / sf,
                mult_x_L=res.mult_x_L / sf,
                mult_x_U=res.mult_x_U / sf,
                obj_history=res.obj_history / sf)

        chunk = self._effective_chunk()
        chunk_arg = None if chunk is None else jnp.asarray(chunk, jnp.int32)

        def build_fns(free):
            return make_collocation_nlp_functions(
                col, obj_fn, grad_fn, scale_from=free,
                factor_dtype=self._factor_dtype,
                refine_steps=self._refine_steps,
                kkt_method=self._kkt_method, mesh=self._mesh)

        def run_warm(free, y0, zl0, zu0):
            fns, (sf, dsc) = build_fns(free)
            res, state = solve_ipm(fns, free, lb, ub, cl * dsc, cu * dsc,
                                   options=options, y0=y0 * sf / dsc,
                                   zL0=zl0 * sf, zU0=zu0 * sf,
                                   iter_budget=chunk_arg, return_state=True)
            return unscale(res, sf, dsc), state

        def run_cold(free):
            fns, (sf, dsc) = build_fns(free)
            res, state = solve_ipm(fns, free, lb, ub, cl * dsc, cu * dsc,
                                   options=options, iter_budget=chunk_arg,
                                   return_state=True)
            return unscale(res, sf, dsc), state

        def run_resume(free, state):
            fns, (sf, dsc) = build_fns(free)
            res, state = solve_ipm(fns, free, lb, ub, cl * dsc, cu * dsc,
                                   options=options, resume_state=state,
                                   iter_budget=chunk_arg, return_state=True)
            return unscale(res, sf, dsc), state

        if options.debug:
            return run_warm, run_cold, run_resume
        return (jax.jit(run_warm), jax.jit(run_cold),
                jax.jit(run_resume))

    def solve(self, free, lagrange=[], zl=[], zu=[], respect_bounds=False):
        """Returns the optimal solution and an info dictionary.

        Parity with the reference contract
        (opty/direct_collocation.py:263-311): returns ``(x, info)``
        where info has keys ``x``, ``g``, ``obj_val``, ``mult_g``,
        ``mult_x_L``, ``mult_x_U``, ``status``, ``status_msg``.
        """
        if respect_bounds:
            self.check_bounds_conflict(free)
        self._warn_if_hessian_structure_violated(free)
        if self._solver is None:
            self._solver = self._build_solver()
        run_warm, run_cold, run_resume = self._solver
        free = jnp.asarray(np.asarray(free, dtype=np.float64), self._dtype)
        if len(lagrange):
            zl = zl if len(zl) else np.ones(self.num_free)
            zu = zu if len(zu) else np.ones(self.num_free)
            res, state = run_warm(free, jnp.asarray(lagrange, self._dtype),
                                  jnp.asarray(zl, self._dtype),
                                  jnp.asarray(zu, self._dtype))
        else:
            res, state = run_cold(free)
        res, state = self._drain(run_resume, free, res, state)
        return self._package_result(res)

    def _build_batch_solver(self):
        """(run_b, resume_b, refill_b): jitted vmapped cold-start,
        resume, and resume-with-lane-refill solvers sharing one chunk
        budget.  The chunked forms keep every device execution short
        (the TPU remote-execution path kills long launches) — the
        lesson the round-1 bench script learned, now absorbed by the
        library API (solve_batch / solve_queue)."""
        options = self._ipm_options
        col = self.collocator
        obj_fn, grad_fn = self._obj_fn, self._obj_grad_fn
        lb = jnp.asarray(self.lower_bound, self._dtype)
        ub = jnp.asarray(self.upper_bound, self._dtype)
        cl = jnp.asarray(self._low_con_bounds, self._dtype)
        cu = jnp.asarray(self._upp_con_bounds, self._dtype)
        chunk = self._effective_chunk()
        chunk_arg = None if chunk is None else jnp.asarray(chunk, jnp.int32)

        def unscale(res, sf, dsc):
            return res._replace(
                obj_val=res.obj_val / sf, g=res.g / dsc,
                mult_g=res.mult_g * dsc / sf,
                mult_x_L=res.mult_x_L / sf,
                mult_x_U=res.mult_x_U / sf,
                obj_history=res.obj_history / sf)

        def build_fns(free):
            return make_collocation_nlp_functions(
                col, obj_fn, grad_fn, scale_from=free,
                factor_dtype=self._factor_dtype,
                refine_steps=self._refine_steps,
                kkt_method=self._kkt_method)

        def run_one(free):
            fns, (sf, dsc) = build_fns(free)
            res, state = solve_ipm(fns, free, lb, ub, cl * dsc, cu * dsc,
                                   options=options, iter_budget=chunk_arg,
                                   return_state=True)
            return unscale(res, sf, dsc), state

        def resume_one(free, state):
            fns, (sf, dsc) = build_fns(free)
            res, state = solve_ipm(fns, free, lb, ub, cl * dsc, cu * dsc,
                                   options=options, resume_state=state,
                                   iter_budget=chunk_arg, return_state=True)
            return unscale(res, sf, dsc), state

        def refill_one(free, state, fresh):
            fns, (sf, dsc) = build_fns(free)
            res, state = solve_ipm(fns, free, lb, ub, cl * dsc, cu * dsc,
                                   options=options, resume_state=state,
                                   iter_budget=chunk_arg, return_state=True,
                                   refill=fresh)
            return unscale(res, sf, dsc), state

        return (jax.jit(jax.vmap(run_one)),
                jax.jit(jax.vmap(resume_one)),
                jax.jit(jax.vmap(refill_one)))

    def solve_batch(self, free_batch, devices=None):
        """Solve a batch of instances of this problem via ``vmap``:
        rows of ``free_batch`` are independent initial guesses
        (multi-start, MPC replans, perturbed problems).  Returns the
        vmapped IPMResult with a leading batch axis.

        This is the TPU-native replacement for serial batch sweeps
        (examples/inverted_pendulum/run_a_bunch.py).  On TPU the solve
        runs in bounded chunks with host snapshots in between, so long
        batched solves survive the remote-execution launch kill.
        """
        if self._batch_solver is None:
            self._batch_solver = self._build_batch_solver()
        run_b, resume_b, _ = self._batch_solver
        free_batch = jnp.asarray(np.asarray(free_batch, dtype=np.float64),
                                 self._dtype)
        res, state = run_b(free_batch)
        res, state = self._drain(
            lambda f, s: resume_b(f, s), free_batch, res, state)
        return res

    def solve_queue(self, free_queue, batch_size=None, progress=None):
        """Solve a queue of instances at maximum device throughput.

        ``free_queue`` has shape (Q, num_free); ``batch_size`` lanes
        run in lockstep on the device, and whenever a lane's instance
        terminates it is immediately refilled with the next queued
        instance inside the same compiled program — no lockstep
        straggler waste, one compiled shape.  Returns an IPMResult
        with a leading axis in queue order.

        ``progress(n_done, n_total, chunk_seconds)`` is called after
        every device chunk (used by bench.py for honest steady-state
        timing).
        """
        import time as _time

        free_queue = np.asarray(free_queue, dtype=np.float64)
        Q = free_queue.shape[0]
        B = min(batch_size or 32, Q)
        if self._batch_solver is None:
            self._batch_solver = self._build_batch_solver()
        run_b, _, refill_b = self._batch_solver
        chunk = self._effective_chunk()
        max_iter = self._ipm_options.max_iter

        lane_inst = np.arange(B)           # queue index per lane
        next_inst = B
        results = [None] * Q
        free_batch = jnp.asarray(free_queue[:B], self._dtype)

        t0 = _time.time()
        res, state = run_b(free_batch)
        done = np.asarray(state.done) | (np.asarray(state.it) >= max_iter)
        if progress is not None:
            progress(0, Q, _time.time() - t0)

        n_retired = 0
        while True:
            if np.any(done):
                # fetch ONLY the finished lanes: gather on device, then
                # one small host transfer (a full-batch pytree copy per
                # chunk is a needless HBM->host tax at gait-scale sizes)
                done_lanes = np.where(done)[0]
                take = jnp.asarray(done_lanes)
                res_host = jax.device_get(
                    jax.tree.map(lambda a: a[take], res))
                fresh = np.zeros(B, dtype=bool)
                new_free = np.array(free_batch)  # writable copy
                for li, lane in enumerate(done_lanes):
                    inst = lane_inst[lane]
                    if inst >= 0 and results[inst] is None:
                        results[inst] = jax.tree.map(
                            lambda a: np.asarray(a)[li], res_host)
                        n_retired += 1
                    if next_inst < Q:
                        lane_inst[lane] = next_inst
                        new_free[lane] = free_queue[next_inst]
                        fresh[lane] = True
                        next_inst += 1
                    else:
                        lane_inst[lane] = -1   # parked
                free_batch = jnp.asarray(new_free, self._dtype)
                if n_retired >= Q:
                    break
                if not np.any(fresh) and np.all(done):
                    break  # all lanes parked (shouldn't happen)
                t0 = _time.time()
                res, state = refill_b(free_batch, state,
                                      jnp.asarray(fresh))
            else:
                t0 = _time.time()
                res, state = refill_b(free_batch, state,
                                      jnp.zeros(B, dtype=bool))
            done = np.asarray(state.done) | \
                (np.asarray(state.it) >= max_iter)
            # parked lanes count as done so the loop can finish
            done = done | (lane_inst < 0)
            if progress is not None:
                progress(n_retired, Q, _time.time() - t0)

        stacked = jax.tree.map(lambda *xs: np.stack(xs), *results)
        return stacked

    def _effective_chunk(self):
        """Iterations per device execution (None = unchunked)."""
        if self._chunk_iters is not None:
            return self._chunk_iters or None
        # keep each device execution well under the remote-execution
        # kill threshold (~2 min observed)
        return 6 if on_tpu() else None

    def _drain(self, run_resume, free, res, state):
        """Host loop finishing a chunked solve (each call is one
        bounded device execution)."""
        if self._effective_chunk() is None:
            return res, state
        max_iter = self._ipm_options.max_iter
        while True:
            done = bool(np.all(np.asarray(state.done)))
            if done or int(np.max(np.asarray(state.it))) >= max_iter:
                return res, state
            res, state = run_resume(free, state)

    def _package_result(self, res):
        x = np.asarray(res.x)
        hist = np.asarray(res.obj_history)
        self.obj_value = list(hist[np.isfinite(hist)])
        status = int(res.status)
        info = {
            'x': x,
            'g': np.asarray(res.g),
            'obj_val': float(res.obj_val),
            'mult_g': np.asarray(res.mult_g),
            'mult_x_L': np.asarray(res.mult_x_L),
            'mult_x_U': np.asarray(res.mult_x_U),
            'status': status,
            'status_msg': STATUS_MESSAGES.get(
                status, b'Unknown status.').decode(),
            'iterations': int(res.iterations),
            'inf_pr': float(res.inf_pr),
            'inf_du': float(res.inf_du),
            # tail-diagnosis telemetry (see IPMResult)
            'rest_iterations': int(res.rest_total),
            'mono_fallback': bool(res.mono),
            'delta_w': float(res.delta_w),
        }
        return x, info

    def check_bounds_conflict(self, free):
        """Raises ValueError if the initial guess violates any bound or
        a lower bound exceeds an upper bound, including reversed
        eom_bounds (parity: reference :317-368, eom check :343-346)."""
        if self._eom_bounds is not None:
            rev = [k for k, (lo, hi) in self._eom_bounds.items() if lo > hi]
            if rev:
                raise ValueError(
                    'The lower bound(s) for eom_bounds {} is (are) '
                    'greater than the upper bound(s).'.format(rev))
        lb, ub = self.lower_bound, self.upper_bound
        free = np.asarray(free)
        if np.any(lb > ub):
            bad = np.where(lb > ub)[0]
            raise ValueError('Lower bound(s) greater than upper bound(s) '
                             'at free indices {}.'.format(bad.tolist()))
        viol = (free < lb) | (free > ub)
        if np.any(viol):
            bad = np.where(viol)[0]
            names = self._names_for_indices(bad)
            raise ValueError(
                'Initial guess violates bounds for: {}.'.format(names))

    def _names_for_indices(self, idxs):
        inv = {}
        for var, ind in self._extraction_indices.items():
            for i in ind:
                inv[i] = var
        return sorted({str(inv.get(i, i)) for i in idxs})

    # ------------------------------------------------------------------
    # free-vector utilities (parity: reference :972-1132)
    # ------------------------------------------------------------------
    def parse_free(self, free):
        """Parses the free parameters vector into
        (states (n, N), specifieds, constants[, h])."""
        col = self.collocator
        return parse_free(free, col.num_states,
                          col.num_unknown_input_trajectories,
                          col.num_collocation_nodes,
                          col.variable_duration)

    def extract_values(self, free, *variables):
        """Returns the numerical values of the given unknown variables
        from the free vector."""
        idxs = []
        for var in variables:
            try:
                idxs += self._extraction_indices[var]
            except KeyError:
                raise ValueError(
                    '{} not an unknown in this problem.'.format(var))
        return np.asarray(free)[idxs]

    def fill_free(self, free, values, *variables):
        """Replaces values in a free-shaped vector for the given
        unknown variables (in-place)."""
        idxs = []
        for var in variables:
            try:
                idxs += self._extraction_indices[var]
            except KeyError:
                raise ValueError(
                    '{} not an unknown in this problem.'.format(var))
        free[idxs] = values

    def time_vector(self, solution=None, start_time=0.0):
        """The array of node times (parity: reference :1097-1132)."""
        col = self.collocator
        N = col.num_collocation_nodes
        if col.variable_duration:
            if solution is None:
                raise ValueError('Solution vector must be provided for '
                                 'variable duration.')
            h = float(np.asarray(solution)[-1])
            if h <= 0.0:
                raise ValueError('Time interval must be strictly greater '
                                 'than zero.')
            if start_time >= h * (N - 1):
                raise ValueError('Start time must be less than the final '
                                 'time.')
        else:
            h = col.node_time_interval
        return np.linspace(start_time, start_time + h * (N - 1), num=N)

    def create_linear_initial_guess(self, end_time=1.0):
        """Linear-interpolation initial guess (behavior parity with
        reference :1134-1376): state trajectories interpolate linearly
        between exact single-state instance constraint values; unknown
        inputs/parameters/h take bound midpoints (one-sided bounds take
        the finite end); everything else is zero."""
        col = self.collocator
        N = col.num_collocation_nodes
        n = col.num_states
        guess = np.zeros(self.num_free)

        # gather (state, node_index, value) from simple instance
        # constraints of the form  state(time) - value
        per_state = {s: [] for s in col.state_symbols}
        if col.instance_constraints is not None:
            par_map = col.known_parameter_map
            for con in col.instance_constraints:
                con = sm.sympify(con).subs(par_map)
                funcs = list(con.atoms(sm.Function))
                if len(funcs) != 1:
                    continue  # multi-instance constraints are ignored
                func = funcs[0]
                base = func.__class__(col.time_symbol)
                if base not in col.state_symbols:
                    continue
                val = sm.solve(con, func)
                if not val:
                    continue
                try:
                    value = float(val[0])
                except TypeError:
                    continue
                # node index of the instance time
                if col.variable_duration:
                    time_idx = int(sm.sympify(func.args[0]).subs(
                        col.time_interval_symbol, 1))
                else:
                    duration = col.node_time_interval * (N - 1)
                    tv = np.linspace(0.0, duration, num=N)
                    time_idx = int(np.argmin(np.abs(
                        tv - float(func.args[0]))))
                per_state[base].append((time_idx, value))

        for i, state in enumerate(col.state_symbols):
            pts = sorted(per_state[state])
            if not pts:
                continue
            if len(pts) == 1:
                guess[i * N:(i + 1) * N] = pts[0][1]
            else:
                nodes = np.array([p[0] for p in pts])
                vals = np.array([p[1] for p in pts])
                guess[i * N:(i + 1) * N] = np.interp(
                    np.arange(N), nodes, vals)

        def midpoint_of(bound):
            low, upp = bound
            low = np.asarray(low, dtype=float)
            upp = np.asarray(upp, dtype=float)
            if np.any(low <= -self.INF):
                return upp
            if np.any(upp >= self.INF):
                return low
            return 0.5 * (low + upp)

        if self._bounds is not None:
            q = col.num_unknown_input_trajectories
            for j, sym in enumerate(col.unknown_input_trajectories):
                if sym in self._bounds:
                    guess[n * N + j * N:n * N + (j + 1) * N] = \
                        midpoint_of(self._bounds[sym])
            for j, sym in enumerate(col.unknown_parameters):
                if sym in self._bounds:
                    guess[(n + q) * N + j] = midpoint_of(self._bounds[sym])

        if col.variable_duration:
            hsym = col.time_interval_symbol
            if self._bounds is not None and hsym in self._bounds:
                guess[-1] = midpoint_of(self._bounds[hsym])
            else:
                guess[-1] = end_time / (N - 1)
        return guess

    # ------------------------------------------------------------------
    # plotting (implementations in opty_tpu.plotting)
    # ------------------------------------------------------------------
    def plot_trajectories(self, vector, axes=None, show_bounds=False):
        return plotting.plot_trajectories(self, vector, axes=axes,
                                          show_bounds=show_bounds)

    def plot_constraint_violations(self, vector, axes=None, subplots=False,
                                   show_bounds=False):
        return plotting.plot_constraint_violations(
            self, vector, axes=axes, subplots=subplots,
            show_bounds=show_bounds)

    def plot_objective_value(self):
        return plotting.plot_objective_value(self)

    def plot_jacobian_sparsity(self, axes=None):
        return plotting.plot_jacobian_sparsity(self, axes=axes)

    # ------------------------------------------------------------------
    def objective(self, free):
        """Objective value at ``free`` (cyipopt callback parity)."""
        return float(self._obj_fn(jnp.asarray(free, self._dtype)))

    def gradient(self, free):
        """Objective gradient at ``free`` (cyipopt callback parity)."""
        if self._obj_grad_fn is not None:
            return np.asarray(self._obj_grad_fn(
                jnp.asarray(free, self._dtype)))
        return np.asarray(jax.grad(self._obj_fn)(
            jnp.asarray(free, self._dtype)))

    def constraints(self, free):
        """Constraint values at ``free`` (cyipopt callback parity)."""
        return self.con(free)

    def jacobian(self, free):
        """Sparse-Jacobian values at ``free`` (cyipopt parity)."""
        return self.con_jac(free)

    def jacobianstructure(self):
        """COO (rows, cols) of the constraint Jacobian."""
        return self.con_jac_rows, self.con_jac_cols
