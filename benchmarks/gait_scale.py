#!/usr/bin/env python
"""Gait2d-scale wall-time-to-tolerance benchmark.

BASELINE.json's second metric is "wall-time to tol on gait2d".  The
reference's gait problems need the uninstallable pygait2d package, so
the measurement runs on the equivalent-scale self-contained model
(opty_tpu/models/nlink.py: 9-link chain on a cart, 20 states, 477k-op
EoMs, 40 instance constraints, variable h — see the module docstring
for the scale comparison).

Reports build time (symbolics + transcription), compile-inclusive
first solve, and the warm-cache re-solve wall time to tol=1e-8.

Run:  python benchmarks/gait_scale.py [--links 9] [--nodes 60]
Prints one JSON line.
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
    parser.add_argument('--links', type=int, default=9)
    parser.add_argument('--nodes', type=int, default=60)
    parser.add_argument('--note', default=None,
                        help='free-text provenance note embedded in the '
                             'JSON output (keeps committed artifacts '
                             'byte-for-byte script output)')
    parser.add_argument('--small-program', action='store_true',
                        help='statically remove the SOC and restoration '
                             'programs (use_soc=False, max_rest_visit=0) '
                             'to fit the remote TPU compile; safe for '
                             'this warm-started benchmark, which never '
                             'restores (rest_total is reported)')
    args = parser.parse_args()

    import sympy as sm
    import opty_tpu  # noqa: F401
    from opty_tpu.models.nlink import (n_link_cart_problem,
                                       n_link_initial_guess)

    t0 = time.time()
    prob, q_start = n_link_cart_problem(num_links=args.links,
                                        num_nodes=args.nodes)
    t_build = time.time() - t0
    n_ops = int(sm.count_ops(prob.collocator.eom))
    # near-feasible inverse-dynamics start -> small initial barrier;
    # the nonconvex tail of this problem converges slowly, so give it
    # a generous iteration budget and report what was achieved
    extra_opts = {}
    if args.small_program:
        extra_opts = dict(use_soc=False, max_rest_visit=0,
                          dw_decay='hold')
    prob.set_solver_options(max_iter=1500, mu_init=1e-5, **extra_opts)
    guess = n_link_initial_guess(prob, q_start)

    t0 = time.time()
    sol, info = prob.solve(guess)
    t_cold = time.time() - t0

    t0 = time.time()
    sol2, info2 = prob.solve(guess)
    t_warm = time.time() - t0

    import jax
    out = {
        'metric': 'nlink{}_gait_scale_walltime_to_tol_s'.format(
            args.links),
        'value': round(t_warm, 2),
        'unit': 's',
        'platform': jax.default_backend(),
        'extra': {
            'links': args.links, 'nodes': args.nodes,
            'states': prob.collocator.num_states,
            'eom_ops': n_ops,
            'instance_constraints':
                prob.collocator.num_instance_constraints,
            'build_s': round(t_build, 1),
            'first_solve_incl_compile_s': round(t_cold, 1),
            'status': info2['status'],
            'iterations': info2['iterations'],
            'inf_pr': float(info2['inf_pr']),
            'objective': float(info2['obj_val']),
            'rest_total': int(info2.get('rest_iterations', 0)),
            'small_program': bool(args.small_program),
        },
    }
    if args.note:
        out['note'] = args.note
    print(json.dumps(out))


if __name__ == '__main__':
    main()
