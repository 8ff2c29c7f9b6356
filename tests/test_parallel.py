"""Mesh-sharded batch solving on the 8-device virtual CPU mesh.

The reference has no distributed layer (SURVEY.md section 2); this is
the new framework's DP-analog parallelism (P1/P2): instances sharded
over a 1-D 'batch' mesh.  Results must match the unsharded path
bitwise (same program, different partitioning).
"""

import jax
import numpy as np

from opty_tpu.models import spring_damper_problem
from opty_tpu.parallel import make_batch_mesh, solve_batch_sharded


def test_mesh_has_8_devices():
    mesh = make_batch_mesh()
    assert mesh.devices.size == 8


def test_sharded_batch_matches_unsharded():
    prob = spring_damper_problem(num_nodes=21)
    rng = np.random.default_rng(5)
    batch = rng.normal(size=(8, prob.num_free)) * 0.1

    res_sharded = solve_batch_sharded(prob, batch)
    res_local = prob.solve_batch(batch)

    assert np.all(np.asarray(res_sharded.status) == 0)
    np.testing.assert_allclose(np.asarray(res_sharded.x),
                               np.asarray(res_local.x), atol=1e-12)


def test_sharded_batch_with_padding():
    prob = spring_damper_problem(num_nodes=21)
    rng = np.random.default_rng(6)
    batch = rng.normal(size=(5, prob.num_free)) * 0.1  # pads to 8
    res = solve_batch_sharded(prob, batch)
    assert res.x.shape[0] == 5
    assert np.all(np.asarray(res.status) == 0)
