#!/usr/bin/env python
"""Micro-benchmark: Pallas lane-parallel block inverse vs the pure-jnp
elimination (ops/smallblock.py) on batched collocation-sized blocks.

Run on TPU:  python benchmarks/pallas_micro.py
Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def bench(fn, A, iters=20):
    import jax
    out = fn(A)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(A)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import opty_tpu  # noqa: F401
    from opty_tpu.ops.smallblock import block_inv
    from opty_tpu.ops.pallas_blocks import block_inv_pallas

    interpret = jax.default_backend() == 'cpu'
    rng = np.random.default_rng(0)
    for B, d in [(512 * 32, 10), (512 * 128, 10), (60 * 32, 50)]:
        A = jnp.asarray(rng.normal(size=(B, d, d)) + 4.0 * np.eye(d),
                        jnp.float32)
        t_jnp = bench(jax.jit(block_inv), A)
        t_pal = bench(jax.jit(
            lambda x: block_inv_pallas(x, interpret=interpret)), A)
        print(json.dumps({
            'metric': 'block_inv_us', 'batch': B, 'd': d,
            'jnp_us': round(t_jnp * 1e6, 1),
            'pallas_us': round(t_pal * 1e6, 1),
            'speedup': round(t_jnp / t_pal, 2),
            'backend': jax.default_backend()}), flush=True)


if __name__ == '__main__':
    main()
