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


def test_spike_factor_apply_matches_solve():
    """spike_factor + spike_apply == the fused spike_solve (the
    factor/apply split is what the IPM reuses across refinement and
    SOC re-solves)."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip('needs 4 virtual devices')
    mesh4 = Mesh(np.array(devs[:4]), ('node',))
    from opty_tpu.nlp.kkt import _assemble_node_blocks
    from opty_tpu.parallel.spike import spike_apply, spike_factor
    rng = np.random.default_rng(11)
    blocks = random_blocks(N=16, nz=2, M=1, bw=1, o=1)
    D, E, F, Kbb = _assemble_node_blocks(blocks)
    N, d, _ = D.shape
    r = jnp.asarray(rng.normal(size=(N, d)))
    rb = jnp.asarray(rng.normal(size=(F.shape[2],)))
    fac = spike_factor(D, E, F, Kbb, mesh4)
    u_fa, beta_fa = spike_apply(fac, r, rb, mesh4)
    u_sp, beta_sp = spike_solve(D, E, F, Kbb, r, rb, mesh4)
    np.testing.assert_allclose(np.asarray(u_fa), np.asarray(u_sp),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(beta_fa),
                               np.asarray(beta_sp),
                               rtol=1e-10, atol=1e-10)
    # second rhs reuses the same factorization
    r2 = jnp.asarray(rng.normal(size=(N, d)))
    rb2 = jnp.asarray(rng.normal(size=(F.shape[2],)))
    u2, beta2 = spike_apply(fac, r2, rb2, mesh4)
    u2_sp, beta2_sp = spike_solve(D, E, F, Kbb, r2, rb2, mesh4)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u2_sp),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.slow
def test_spike_ipm_end_to_end(mesh):
    """SURVEY.md P3 completion: a large-N collocation NLP driven all
    the way through solve_ipm with the node-sharded SPIKE KKT solve,
    matching the unsharded solution."""
    from opty_tpu.models import swing_up_problem

    N = 100_000
    prob = swing_up_problem(num_nodes=N)
    rng = np.random.default_rng(3)
    x0 = rng.standard_normal(prob.num_free) * 0.01

    prob.set_solver_options(kkt_method='scan', max_iter=300)
    sol_ref, info_ref = prob.solve(x0)
    assert info_ref['status'] in (0, 1)

    prob.set_solver_options(kkt_method='spike', mesh=mesh)
    sol_sp, info_sp = prob.solve(x0)
    assert info_sp['status'] in (0, 1)
    # same KKT point to solver tolerance
    np.testing.assert_allclose(sol_sp, sol_ref, rtol=0, atol=1e-5)
