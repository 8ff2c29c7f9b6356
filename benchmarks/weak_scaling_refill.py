#!/usr/bin/env python
"""Measured weak-scaling efficiency of the DP (instance-batch) path in
REFILL mode — the round-4 verdict's missing artifact (ask #4): the old
``weak_scaling.py`` projected efficiency from lockstep-straggler
accounting and asserted "refill => ~1.0" in a note without measuring.

Method.  The batch axis is sharded over an N-virtual-device CPU mesh
(4 lanes per device) and a seeded queue is drained with the refill
solver (solve_ipm ``refill``: finished lanes restart on the next
queued instance inside the same compiled program).  Wall-clock on
virtual devices measures host oversubscription, not scaling, so the
efficiency is measured in the quantity that *is* wall-time on real
hardware: device chunks executed (every chunk costs chunk_iters
lockstep iterations on every device).

    throughput_per_device = Q / (n_devices * chunks)
    efficiency(N) = throughput_per_device(N) / throughput_per_device(1)

The compiled sharded program is also checked for data-moving
collectives (there must be none: DP shards are independent; the only
cross-device traffic is the scalar loop-predicate sync).

The queue population must FULLY converge (status 0/1 for every
instance) or the script reports failure — the round-4 artifact's 18-
of-32 converged population was judged unusable evidence.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/weak_scaling_refill.py
Prints one JSON line.
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

PER_DEV = 4
NODES = 501
CHUNK = 25
QUEUE_PER_DEV = 12     # instances per device in each configuration

_COLLECTIVES = re.compile(
    r'\b(all-reduce|all-gather|reduce-scatter|collective-permute|'
    r'all-to-all)\b')


def drain_queue(prob, queue, n_dev, mesh_devs):
    """Drain ``queue`` with B = n_dev * PER_DEV sharded refill lanes;
    returns (chunks_executed, statuses, iterations)."""
    import jax
    import jax.numpy as jnp
    from opty_tpu.parallel.mesh import make_batch_mesh, shard_batch

    B = n_dev * PER_DEV
    Q = queue.shape[0]
    mesh = make_batch_mesh(mesh_devs[:n_dev])
    run_b, _, refill_b = prob._build_batch_solver()
    max_iter = prob._ipm_options.max_iter

    def shard(a):
        return shard_batch(jnp.asarray(a, prob._dtype), mesh)

    lane_inst = np.arange(B)
    next_inst = B
    status = np.full(Q, -99, dtype=int)
    iters = np.zeros(Q, dtype=int)
    free_batch = np.array(queue[:B])

    chunks = 1
    res, state = run_b(shard(free_batch))
    hlo_probe = None
    done = np.asarray(state.done) | (np.asarray(state.it) >= max_iter)
    retired = 0
    while retired < Q:
        if np.any(done):
            done_lanes = np.where(done)[0]
            res_host = jax.device_get(res)
            fresh = np.zeros(B, dtype=bool)
            for lane in done_lanes:
                inst = lane_inst[lane]
                if inst >= 0 and status[inst] == -99:
                    status[inst] = int(np.asarray(res_host.status)[lane])
                    iters[inst] = int(
                        np.asarray(res_host.iterations)[lane])
                    retired += 1
                if next_inst < Q:
                    lane_inst[lane] = next_inst
                    free_batch[lane] = queue[next_inst]
                    fresh[lane] = True
                    next_inst += 1
                else:
                    lane_inst[lane] = -1
            if retired >= Q:
                break
            res, state = refill_b(shard(free_batch), state,
                                  shard_batch(jnp.asarray(fresh), mesh))
        else:
            res, state = refill_b(shard(free_batch), state,
                                  shard_batch(
                                      jnp.zeros(B, dtype=bool), mesh))
        chunks += 1
        done = np.asarray(state.done) | (np.asarray(state.it) >= max_iter)
        done = done | (lane_inst < 0)
    return chunks, status, iters


def main():
    import jax
    import opty_tpu  # noqa: F401
    from opty_tpu.models import swing_up_problem

    devs = jax.devices()
    n_dev = min(8, len(devs))
    if devs[0].platform != 'cpu' or n_dev < 2:
        print(json.dumps({
            'metric': 'weak_scaling_refill',
            'error': ('requires the multi-device CPU mesh: run with '
                      'JAX_PLATFORMS=cpu XLA_FLAGS='
                      '--xla_force_host_platform_device_count=8'),
            'platform': devs[0].platform, 'n_devices': len(devs)}))
        return

    # the bench configuration (N=501, default torque): known to
    # converge 128/128 from seeded random starts at mean ~43
    # iterations (BENCH_r04/r05); coarse N=201 grids legitimately
    # fail from many seeds and poison the accounting
    prob = swing_up_problem(num_nodes=NODES)
    prob.set_solver_options(max_iter=250, chunk_iters=CHUNK,
                            use_soc=False)

    rng = np.random.default_rng(7)
    big_queue = rng.standard_normal((n_dev * QUEUE_PER_DEV,
                                     prob.num_free))

    # HLO communication check on the sharded refill program
    import jax.numpy as jnp
    from opty_tpu.parallel.mesh import make_batch_mesh, shard_batch
    mesh = make_batch_mesh(devs[:n_dev])
    run_b, _, refill_b = prob._build_batch_solver()
    sb = shard_batch(jnp.asarray(big_queue[:n_dev * PER_DEV],
                                 prob._dtype), mesh)
    hlo = jax.jit(run_b).lower(sb).compile().as_text()
    comm_lines = [ln for ln in hlo.splitlines()
                  if _COLLECTIVES.search(ln)]
    pred_syncs = [ln for ln in comm_lines
                  if 'pred[]' in ln and 'all-reduce' in ln]
    data_comms = [ln for ln in comm_lines if ln not in pred_syncs]

    # N-device drain and 1-device drain of proportional queues
    chunks_n, status_n, iters_n = drain_queue(
        prob, big_queue, n_dev, devs)
    chunks_1, status_1, iters_1 = drain_queue(
        prob, big_queue[:QUEUE_PER_DEV], 1, devs)

    conv_n = int(np.sum(np.isin(status_n, (0, 1))))
    conv_1 = int(np.sum(np.isin(status_1, (0, 1))))
    tput_n = len(status_n) / (n_dev * chunks_n)
    tput_1 = len(status_1) / (1 * chunks_1)
    eff = tput_n / tput_1

    out = {
        'metric': 'weak_scaling_refill_efficiency',
        'value': round(eff, 3),
        'unit': 'relative per-device throughput (instances per '
                'device-chunk), N devices vs 1',
        'n_devices': n_dev,
        'lanes_per_device': PER_DEV,
        'chunk_iters': CHUNK,
        'queue_n_dev': len(status_n),
        'queue_1_dev': len(status_1),
        'chunks_n_dev': chunks_n,
        'chunks_1_dev': chunks_1,
        'converged_n_dev': conv_n,
        'converged_1_dev': conv_1,
        'fully_converged': bool(conv_n == len(status_n)
                                and conv_1 == len(status_1)),
        'mean_iters_n_dev': round(float(np.mean(iters_n)), 1),
        'max_iters_n_dev': int(np.max(iters_n)),
        'data_moving_collectives_in_hlo': len(data_comms),
        'scalar_loop_predicate_syncs': len(pred_syncs),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
