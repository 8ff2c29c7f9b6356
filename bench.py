#!/usr/bin/env python
"""Benchmark: batched pendulum swing-up collocation solves per second.

Primary metric per BASELINE.json: "collocation solves/s/chip (pendulum
N=500)".  The reference path is opty (SymPy -> Cython C kernels) +
Ipopt on CPU, solving one NLP at a time at ~0.5 s/solve (no published
numbers exist — BASELINE.md — so the baseline below is a
measured-order-of-magnitude Ipopt CPU figure of 2 solves/s).

The TPU engine runs one compiled batched interior-point solver over
vmapped instances.  Device executions are chunked (the remote TPU
execution path kills long launches) and results are snapshotted to the
host after every chunk, so a late worker crash still yields a
measurable, honest result.  Prints exactly one JSON line on stdout.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_SOLVES_PER_S = 2.0   # Ipopt + opty CPU, single stream (est.)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import opty_tpu  # noqa: F401  (enables x64)
    from opty_tpu.models import swing_up_problem
    from opty_tpu.nlp.collocation import make_collocation_nlp_functions
    from opty_tpu.nlp.ipm import solve_ipm

    log('devices:', jax.devices())

    num_nodes = int(os.environ.get('BENCH_NODES', '501'))
    batch = int(os.environ.get('BENCH_BATCH', '16'))
    max_iter = int(os.environ.get('BENCH_MAXITER', '200'))
    chunk = int(os.environ.get('BENCH_CHUNK', '6'))

    prob = swing_up_problem(num_nodes=num_nodes)
    prob.set_solver_options(max_iter=max_iter)
    col = prob.collocator
    options = prob._ipm_options
    lb = jnp.asarray(prob.lower_bound)
    ub = jnp.asarray(prob.upper_bound)
    cl = jnp.asarray(prob._low_con_bounds)
    cu = jnp.asarray(prob._upp_con_bounds)
    budget = jnp.asarray(chunk, jnp.int32)

    def run_one(free):
        fns, _ = make_collocation_nlp_functions(
            col, prob._obj_fn, prob._obj_grad_fn, scale_from=free)
        return solve_ipm(fns, free, lb, ub, cl, cu, options=options,
                         iter_budget=budget, return_state=True)

    def resume_one(free, st):
        fns, _ = make_collocation_nlp_functions(
            col, prob._obj_fn, prob._obj_grad_fn, scale_from=free)
        return solve_ipm(fns, free, lb, ub, cl, cu, options=options,
                         resume_state=st, iter_budget=budget,
                         return_state=True)

    run_b = jax.jit(jax.vmap(run_one))
    resume_b = jax.jit(jax.vmap(resume_one))

    rng = np.random.default_rng(7)
    free_batch = jnp.asarray(rng.standard_normal((batch, prob.num_free)))

    log('compiling + solving (batch={}, nfree={}, chunk={})...'.format(
        batch, prob.num_free, chunk))

    chunk_times = []
    snapshot = None
    crashed = None
    try:
        t0 = time.time()
        res, st = run_b(free_batch)
        snapshot = jax.device_get((res.status, res.obj_val, st.done, st.it))
        chunk_times.append(time.time() - t0)
        log('chunk 0 (incl. compile): {:.1f}s done={}'.format(
            chunk_times[-1], int(np.sum(snapshot[2]))))
        n_chunks = (max_iter + chunk - 1) // chunk
        for c in range(1, n_chunks + 1):
            if bool(np.all(snapshot[2])) or \
                    int(np.max(snapshot[3])) >= max_iter:
                break
            t0 = time.time()
            res, st = resume_b(free_batch, st)
            snapshot = jax.device_get((res.status, res.obj_val, st.done,
                                       st.it))
            chunk_times.append(time.time() - t0)
            log('chunk {}: {:.1f}s done={} it={}'.format(
                c, chunk_times[-1], int(np.sum(snapshot[2])),
                int(np.max(snapshot[3]))))
    except Exception as err:  # worker crash mid-run: keep last snapshot
        crashed = str(err)[:200]
        log('device failure after {} chunks: {}'.format(
            len(chunk_times), crashed))

    if snapshot is None:
        print(json.dumps({
            'metric': 'pendulum_N501_collocation_solves_per_s_per_chip',
            'value': 0.0, 'unit': 'solves/s', 'vs_baseline': 0.0,
            'error': crashed or 'no chunks completed'}))
        return

    status, obj_val, done, iters = snapshot
    n_ok = int(np.sum((status == 0) | (status == 1)))
    # steady-state rate: exclude the two compile-bearing chunks
    steady = chunk_times[2:] if len(chunk_times) > 4 else chunk_times[1:]
    per_chunk = float(np.mean(steady)) if steady else chunk_times[-1]
    total_iters = int(np.max(iters))
    solve_time = per_chunk * (total_iters / chunk)
    solves_per_s = (n_ok / solve_time) if solve_time > 0 else 0.0
    log('converged {}/{}; per-chunk {:.1f}s; eff solve time {:.1f}s'.format(
        n_ok, batch, per_chunk, solve_time))
    print(json.dumps({
        'metric': 'pendulum_N501_collocation_solves_per_s_per_chip',
        'value': round(solves_per_s, 4),
        'unit': 'solves/s',
        'vs_baseline': round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
        'extra': {
            'batch': batch, 'converged': n_ok,
            'max_iters': total_iters,
            'per_chunk_s': round(per_chunk, 2),
            'chunks': len(chunk_times),
            'crashed': crashed,
        },
    }))


if __name__ == '__main__':
    try:
        main()
    except Exception as err:
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            'metric': 'pendulum_N501_collocation_solves_per_s_per_chip',
            'value': 0.0, 'unit': 'solves/s', 'vs_baseline': 0.0,
            'error': str(err)[:300]}))
