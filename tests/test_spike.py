"""Node-sharded SPIKE KKT solve vs the single-chip solver on an
8-device CPU mesh (SURVEY.md P3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from opty_tpu.nlp.kkt import solve_structured_kkt
from opty_tpu.parallel.spike import (spike_solve,
                                     solve_structured_kkt_sharded)

from test_kkt import random_blocks, dense_kkt


@pytest.fixture(scope='module')
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices '
                    '(xla_force_host_platform_device_count)')
    return Mesh(np.array(devs[:8]), ('node',))


@pytest.mark.slow
def test_spike_matches_unsharded(mesh):
    from opty_tpu.nlp.kkt import (_assemble_node_blocks, _equilibrate,
                                  factor_kkt, solve_factored)
    rng = np.random.default_rng(5)
    blocks = random_blocks(N=64, nz=3, M=2, bw=2, o=3)
    D, E, F, Kbb = _assemble_node_blocks(blocks)
    N, d, _ = D.shape
    r = jnp.asarray(rng.normal(size=(N, d)))
    rb = jnp.asarray(rng.normal(size=(F.shape[2],)))

    u_sp, beta_sp = spike_solve(D, E, F, Kbb, r, rb, mesh)

    # oracle: dense solve of the assembled system
    K = dense_kkt(blocks)
    rhs = np.concatenate([np.asarray(r).reshape(-1), np.asarray(rb)])
    sol = np.linalg.solve(K, rhs)
    u_ref = sol[:N * d].reshape(N, d)
    beta_ref = sol[N * d:]

    np.testing.assert_allclose(np.asarray(u_sp), u_ref, rtol=1e-8,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(beta_sp), beta_ref,
                               rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_spike_no_border(mesh):
    rng = np.random.default_rng(6)
    blocks = random_blocks(N=32, nz=2, M=2, bw=0, o=0)
    from opty_tpu.nlp.kkt import _assemble_node_blocks
    D, E, F, Kbb = _assemble_node_blocks(blocks)
    N, d, _ = D.shape
    r = jnp.asarray(rng.normal(size=(N, d)))
    rb = jnp.zeros((0,))
    u_sp, beta_sp = spike_solve(D, E, F, Kbb, r, rb, mesh)
    K = dense_kkt(blocks)
    sol = np.linalg.solve(K, np.asarray(r).reshape(-1))
    np.testing.assert_allclose(np.asarray(u_sp),
                               sol.reshape(N, d), rtol=1e-8, atol=1e-8)
    assert beta_sp.shape == (0,)


@pytest.mark.slow
def test_sharded_structured_solve_refined(mesh):
    """Full wrapper (equilibration + f32 factor + refinement) matches
    the unsharded mixed-precision solver to tight tolerance."""
    rng = np.random.default_rng(7)
    blocks = random_blocks(N=64, nz=3, M=2, bw=2, o=2)
    N = blocks.Hd.shape[0]
    d = blocks.Hd.shape[1] + blocks.P.shape[1]
    b = blocks.Hw.shape[2] + blocks.Gz.shape[0]
    r_nodes = jnp.asarray(rng.normal(size=(N, d)))
    r_border = jnp.asarray(rng.normal(size=(b,)))

    u_ref, beta_ref = solve_structured_kkt(
        blocks, r_nodes, r_border, refine_steps=2)
    u_sh, beta_sh = solve_structured_kkt_sharded(
        blocks, r_nodes, r_border, mesh,
        factor_dtype=jnp.float32, refine_steps=3)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(beta_sh),
                               np.asarray(beta_ref),
                               rtol=1e-7, atol=1e-7)


@pytest.mark.slow
def test_large_n_sharded(mesh):
    """A 100k-node system solves node-sharded (the P3 scale target)
    and satisfies the equations to refinement accuracy.  (At this size
    the compile dominates the wall time; the arithmetic itself scales
    linearly and is exercised identically at any N.)"""
    from opty_tpu.nlp.kkt import kkt_matvec
    rng = np.random.default_rng(8)
    blocks = random_blocks(N=100_000, nz=2, M=2, bw=1, o=0)
    N = blocks.Hd.shape[0]
    d = blocks.Hd.shape[1] + blocks.P.shape[1]
    r_nodes = jnp.asarray(rng.normal(size=(N, d)))
    r_border = jnp.asarray(rng.normal(size=(1,)))
    u, beta = solve_structured_kkt_sharded(
        blocks, r_nodes, r_border, mesh, refine_steps=1)
    Ku, Kb = kkt_matvec(blocks, u, beta)
    resid = max(float(jnp.max(jnp.abs(Ku - r_nodes))),
                float(jnp.max(jnp.abs(Kb - r_border))))
    assert resid < 1e-7


def test_spike_smoke_small_mesh():
    """Default-suite SPIKE smoke test: 4-device mesh, tiny N — same
    code path as the slow tests at a fraction of the shard_map
    compile cost (the full-size variants are marked slow; run with
    --runslow).  dryrun_multichip exercises the 8-device form every
    round."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip('needs 4 virtual devices')
    mesh4 = Mesh(np.array(devs[:4]), ('node',))
    from opty_tpu.nlp.kkt import _assemble_node_blocks
    rng = np.random.default_rng(9)
    blocks = random_blocks(N=16, nz=2, M=1, bw=1, o=1)
    D, E, F, Kbb = _assemble_node_blocks(blocks)
    N, d, _ = D.shape
    r = jnp.asarray(rng.normal(size=(N, d)))
    rb = jnp.asarray(rng.normal(size=(F.shape[2],)))
    u_sp, beta_sp = spike_solve(D, E, F, Kbb, r, rb, mesh4)
    K = dense_kkt(blocks)
    sol = np.linalg.solve(
        K, np.concatenate([np.asarray(r).reshape(-1), np.asarray(rb)]))
    np.testing.assert_allclose(np.asarray(u_sp),
                               sol[:N * d].reshape(N, d),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(beta_sp), sol[N * d:],
                               rtol=1e-8, atol=1e-8)
