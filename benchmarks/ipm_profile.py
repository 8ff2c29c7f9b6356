#!/usr/bin/env python
"""Per-phase timing of one batched IPM iteration on the bench config.

Times the jitted sub-programs of the lockstep iteration separately
(vmapped over the benchmark batch) so optimization effort goes where
the microseconds are:

  prep    constraint + Jacobian + structured-Hessian evaluation
  factor  mixed-precision PCR factorization of the KKT system
  apply   one KKT solve incl. the f64 iterative-refinement rounds
  matvec  one full-precision KKT operator application (refinement unit)

Run on TPU:  python benchmarks/ipm_profile.py [--batch 64] [--nodes 501]
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


def bench(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--nodes', type=int, default=501)
    parser.add_argument('--kkt', default='cr')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import opty_tpu  # noqa: F401
    from opty_tpu.models import swing_up_problem
    from opty_tpu.nlp.collocation import make_collocation_nlp_functions

    prob = swing_up_problem(num_nodes=args.nodes)
    col = prob.collocator
    prob.set_solver_options(kkt_method=args.kkt)
    fns, _ = make_collocation_nlp_functions(
        col, prob._obj_fn, prob._obj_grad_fn, kkt_method=args.kkt)

    rng = np.random.default_rng(0)
    B = args.batch
    x = jnp.asarray(rng.standard_normal((B, prob.num_free)))
    y = jnp.asarray(rng.standard_normal((B, col.num_constraints)))
    m = col.num_constraints
    sigma = jnp.abs(jnp.asarray(rng.standard_normal((B, prob.num_free)))) + 1.0
    ds = jnp.abs(jnp.asarray(rng.standard_normal((B, m)))) * 0.01
    rx = jnp.asarray(rng.standard_normal((B, prob.num_free)))
    rc = jnp.asarray(rng.standard_normal((B, m)))

    prep_j = jax.jit(jax.vmap(fns.kkt_prepare))
    factor_j = jax.jit(jax.vmap(fns.kkt_factor))
    apply_j = jax.jit(jax.vmap(fns.kkt_apply))
    solve_j = jax.jit(jax.vmap(fns.kkt_solve))
    grad_j = jax.jit(jax.vmap(fns.gradient))
    con_j = jax.jit(jax.vmap(fns.constraints))

    results = {}
    t = bench(con_j, x); results['constraints'] = t
    t = bench(grad_j, x); results['gradient'] = t
    prep = prep_j(x, y)
    results['prep'] = bench(prep_j, x, y)
    fac = factor_j(prep, sigma, ds)
    results['factor'] = bench(factor_j, prep, sigma, ds)
    results['apply_with_refine'] = bench(apply_j, fac, rx, rc)
    results['factor_plus_apply'] = bench(solve_j, prep, sigma, ds, rx, rc)

    backend = jax.default_backend()
    for name, tt in results.items():
        print(json.dumps({'metric': 'ipm_phase_ms', 'phase': name,
                          'ms': round(tt * 1e3, 2), 'batch': B,
                          'nodes': args.nodes, 'kkt': args.kkt,
                          'backend': backend}))


if __name__ == '__main__':
    main()
