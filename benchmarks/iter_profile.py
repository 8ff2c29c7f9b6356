#!/usr/bin/env python
"""Amortized per-phase timing of the batched lockstep IPM iteration.

The axon-tunneled TPU dispatch path costs ~12.5 ms per launch once any
f64-emulated program has run, so per-call timing loops measure RTT, not
compute.  Every phase here is therefore repeated REPS times *inside* a
single jitted ``lax.scan`` with a forced data dependency between
repetitions; one dispatch amortizes to sub-millisecond resolution.

Additionally the *full* iteration body is measured through the real
chunked resume path (``iter_budget`` chunks of the production solver):
per-iteration cost = (chunk wall time - dispatch) / chunk_iters.  The
difference between that number and the sum of phase costs is structural
overhead (both lax.cond branches run under vmap, while_loop trips are
max-over-lanes, filter bookkeeping).

Run on TPU:  python benchmarks/iter_profile.py [--batch 16] [--nodes 501]
Prints one JSON line per phase.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=16)
    parser.add_argument('--nodes', type=int, default=501)
    parser.add_argument('--kkt', default='cr')
    parser.add_argument('--reps', type=int, default=32)
    parser.add_argument('--chunk', type=int, default=12)
    parser.add_argument('--skip-full', action='store_true')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import opty_tpu  # noqa: F401
    from opty_tpu.models import swing_up_problem
    from opty_tpu.nlp.collocation import make_collocation_nlp_functions

    prob = swing_up_problem(num_nodes=args.nodes)
    col = prob.collocator
    prob.set_solver_options(kkt_method=args.kkt, chunk_iters=args.chunk)
    fns, _ = make_collocation_nlp_functions(
        col, prob._obj_fn, prob._obj_grad_fn, kkt_method=args.kkt)

    rng = np.random.default_rng(0)
    B = args.batch
    nf = prob.num_free
    m = col.num_constraints
    f64 = jnp.float64
    x = jnp.asarray(rng.standard_normal((B, nf)), f64)
    y = jnp.asarray(rng.standard_normal((B, m)), f64)
    sigma = jnp.abs(jnp.asarray(rng.standard_normal((B, nf)), f64)) + 1.0
    ds = jnp.abs(jnp.asarray(rng.standard_normal((B, m)), f64)) * 0.01
    rx = jnp.asarray(rng.standard_normal((B, nf)), f64)
    rc = jnp.asarray(rng.standard_normal((B, m)), f64)

    def tree_tag(out):
        """Scalar f64 fingerprint of a pytree (forces the computation)."""
        tot = jnp.asarray(0.0, f64)
        for leaf in jax.tree.leaves(out):
            la = jnp.asarray(leaf)
            if jnp.issubdtype(la.dtype, jnp.inexact):
                tot = tot + jnp.sum(jnp.abs(la)).astype(f64)
        return tot

    def amortized(make_call, reps):
        """make_call(eps) -> pytree; times reps dependent calls in one
        jitted program.  Returns seconds per call."""

        @jax.jit
        def run(eps0):
            def step(c, _):
                out = make_call(c)
                return c * 0.0 + tree_tag(out) * 1e-30, None

            c, _ = jax.lax.scan(step, eps0, None, length=reps)
            return c

        eps0 = jnp.asarray(0.0, f64)
        jax.block_until_ready(run(eps0))          # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run(eps0))
        return (time.perf_counter() - t0) / reps

    vm = jax.vmap
    results = {}

    def phase(name, make_call, reps=None):
        t = amortized(make_call, reps or args.reps)
        results[name] = t
        print(json.dumps({'metric': 'ipm_phase_ms', 'phase': name,
                          'ms': round(t * 1e3, 3), 'batch': B,
                          'nodes': args.nodes, 'kkt': args.kkt,
                          'backend': jax.default_backend()}), flush=True)

    phase('constraints', lambda e: vm(fns.constraints)(x + e))
    phase('gradient', lambda e: vm(fns.gradient)(x + e))

    def eval_point(e):
        def one(xx, yy):
            g = fns.gradient(xx)
            c, vjp = jax.vjp(fns.constraints, xx)
            return g, c, vjp(yy)[0]
        return vm(one)(x + e, y)

    phase('eval_point', eval_point)
    phase('prepare', lambda e: vm(fns.kkt_prepare)(x + e, y))

    prep = jax.jit(vm(fns.kkt_prepare))(x, y)
    prep = jax.tree.map(lambda a: jnp.asarray(a), prep)

    phase('factor', lambda e: vm(fns.kkt_factor)(
        prep, sigma + jnp.abs(e), ds))

    fac = jax.jit(vm(fns.kkt_factor))(prep, sigma, ds)

    phase('apply_refined', lambda e: vm(fns.kkt_apply)(fac, rx + e, rc))
    phase('factor_plus_apply', lambda e: vm(
        lambda p, s, d, a, b: fns.kkt_solve(p, s, d, a, b))(
            prep, sigma + jnp.abs(e), ds, rx, rc))
    phase('feasibility_solve', lambda e: vm(fns.kkt_solve_feasibility)(
        prep, sigma + jnp.abs(e), rc))

    # curvature test: Hessian-vector product through the Lagrangian
    def curv(e):
        def one(xx, yy, dxx):
            def lag_grad(z):
                _, vj = jax.vjp(fns.constraints, z)
                return fns.gradient(z) + vj(yy)[0]
            return jax.jvp(lag_grad, (xx,), (dxx,))[1]
        return vm(one)(x + e, y, rx)

    phase('curvature_jvp', curv)

    # barrier_phi: 1 objective + 1 constraints + log terms
    lb = jnp.asarray(prob.lower_bound, f64)
    ub = jnp.asarray(prob.upper_bound, f64)

    def bar(e):
        def one(xx):
            d1 = jnp.where(lb > -1e18, xx - lb, 1.0)
            d2 = jnp.where(ub < 1e18, ub - xx, 1.0)
            bar = (jnp.sum(jnp.log(jnp.maximum(d1, 1e-30)))
                   + jnp.sum(jnp.log(jnp.maximum(d2, 1e-30))))
            return fns.objective(xx) - 0.1 * bar, \
                jnp.sum(jnp.abs(fns.constraints(xx)))
        return vm(one)(x + e)

    phase('barrier_phi', bar)

    if not args.skip_full:
        # full production iteration cost via the chunked resume path
        run_b, resume_b, _ = prob._build_batch_solver()
        free0 = jnp.asarray(rng.standard_normal((B, nf)), f64)
        res, state = run_b(free0)          # compile + first chunk
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        res2, state2 = resume_b(free0, state)   # compile resume
        jax.block_until_ready(res2)
        t_compile = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = resume_b(free0, state)    # same state: identical work
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        t_chunk = float(np.median(times))
        per_iter = (t_chunk - 0.0125) / args.chunk
        results['full_iteration'] = per_iter
        print(json.dumps({'metric': 'ipm_phase_ms', 'phase':
                          'full_iteration', 'ms': round(per_iter * 1e3, 3),
                          'chunk_s': round(t_chunk, 3),
                          'resume_compile_s': round(t_compile, 1),
                          'batch': B, 'nodes': args.nodes,
                          'kkt': args.kkt,
                          'backend': jax.default_backend()}), flush=True)

        # one eval_point (carried across iterations), one prep, ONE
        # merged factor+apply (restoration shares it), light SOC
        # apply (~half a refined apply), curvature jvp, restoration
        # vjp, ~3 merit/filter constraint evals
        accounted = (results['eval_point'] + results['prepare']
                     + results['factor_plus_apply']
                     + 0.5 * results['apply_refined']   # SOC (light)
                     + results['curvature_jvp']
                     + results['barrier_phi'] * 3)
        print(json.dumps({'metric': 'ipm_phase_ms', 'phase':
                          'accounted_minimum', 'ms':
                          round(accounted * 1e3, 3),
                          'unaccounted_ms': round(
                              (per_iter - accounted) * 1e3, 3)}),
              flush=True)


if __name__ == '__main__':
    main()
