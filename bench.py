#!/usr/bin/env python
"""Benchmark: batched pendulum swing-up collocation solves per second.

Primary metric per BASELINE.json: "collocation solves/s/chip (pendulum
N=500)".  The reference path is opty (SymPy -> Cython C kernels) +
Ipopt on CPU, solving one NLP at a time; its wall time for this
problem is ~0.5 s/solve (no published numbers exist — BASELINE.md —
so the baseline below is a measured-order-of-magnitude Ipopt CPU
figure of 2 solves/s).  The TPU engine amortizes one compiled
batched interior-point solver across many vmapped instances.

Prints exactly one JSON line on stdout.
"""

import json
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

    log('devices:', jax.devices())

    import os
    num_nodes = int(os.environ.get('BENCH_NODES', '501'))
    batch = int(os.environ.get('BENCH_BATCH', '32'))
    prob = swing_up_problem(num_nodes=num_nodes)
    prob.set_solver_options(max_iter=int(os.environ.get('BENCH_MAXITER',
                                                        '200')))

    rng = np.random.default_rng(7)
    free_batch = rng.standard_normal((batch, prob.num_free))

    log('compiling batched solver (batch={}, nfree={})...'.format(
        batch, prob.num_free))
    t0 = time.time()
    res = prob.solve_batch(free_batch)
    jax.block_until_ready(res.x)
    compile_and_first = time.time() - t0
    log('first call (compile + run): {:.1f}s'.format(compile_and_first))

    t0 = time.time()
    res = prob.solve_batch(free_batch + 1e-3)
    jax.block_until_ready(res.x)
    wall = time.time() - t0

    status = np.asarray(res.status)
    n_ok = int(np.sum((status == 0) | (status == 1)))
    iters = np.asarray(res.iterations)
    uniq, cnt = np.unique(status, return_counts=True)
    log('status counts:', dict(zip(uniq.tolist(), cnt.tolist())))
    log('inf_pr quantiles:', np.quantile(np.asarray(res.inf_pr),
                                         [0.0, 0.5, 1.0]))
    log('inf_du quantiles:', np.quantile(np.asarray(res.inf_du),
                                         [0.0, 0.5, 1.0]))
    log('iters min/med/max: {}/{}/{}'.format(
        iters.min(), int(np.median(iters)), iters.max()))
    log('solve wall: {:.2f}s'.format(wall))

    solves_per_s = batch / wall
    print(json.dumps({
        'metric': 'pendulum_N501_collocation_solves_per_s_per_chip',
        'value': round(solves_per_s, 3),
        'unit': 'solves/s',
        'vs_baseline': round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        'extra': {
            'batch': batch,
            'converged': n_ok,
            'median_iters': int(np.median(iters)),
            'wall_s': round(wall, 2),
            'compile_s': round(compile_and_first - wall, 1),
        },
    }))


def emit_failure(err):
    print(json.dumps({
        'metric': 'pendulum_N501_collocation_solves_per_s_per_chip',
        'value': 0.0,
        'unit': 'solves/s',
        'vs_baseline': 0.0,
        'error': str(err)[:300],
    }))


if __name__ == '__main__':
    try:
        main()
    except Exception as err:  # emit a recordable result either way
        import traceback
        traceback.print_exc(file=sys.stderr)
        emit_failure(err)
