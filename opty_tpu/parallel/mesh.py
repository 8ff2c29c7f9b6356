"""Device-mesh instance-batch parallelism.

The reference's only parallel mechanism is OpenMP threads over the
collocation-node loop on one CPU (opty/utils.py:716-741); its batch
workloads (parameter sweeps, multi-start: examples/inverted_pendulum/
run_a_bunch.py) run serially.  Here the unit of parallelism is the
*problem instance*: ``vmap`` packs thousands of instances per chip and
a 1-D ``jax.sharding.Mesh`` over the ``'batch'`` axis spreads them
across chips/hosts (SURVEY.md section 2 rows P1-P2).  Solves are
embarrassingly parallel — XLA inserts no cross-instance collectives —
so weak scaling is limited only by lockstep iteration counts within
each shard.

Node-axis (sequence-parallel analog) sharding of very large single
problems is planned on top of the same mesh (SURVEY.md P3).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ['make_batch_mesh', 'shard_batch', 'solve_batch_sharded']


def make_batch_mesh(devices=None):
    """1-D mesh over all (or the given) devices with axis 'batch'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=('batch',))


def shard_batch(arr, mesh):
    """Place a batched array with its leading axis split over 'batch'."""
    sharding = NamedSharding(mesh, PartitionSpec('batch'))
    return jax.device_put(arr, sharding)


def solve_batch_sharded(problem, free_batch, mesh=None):
    """Solve a batch of instances of ``problem`` sharded over a mesh.

    ``free_batch`` rows are independent initial guesses; the batch is
    padded up to a multiple of the mesh size.  Returns the vmapped
    IPMResult (padding rows dropped).
    """
    if mesh is None:
        mesh = make_batch_mesh()
    n_dev = mesh.devices.size
    b = free_batch.shape[0]
    pad = (-b) % n_dev
    if pad:
        free_batch = np.concatenate(
            [np.asarray(free_batch),
             np.repeat(np.asarray(free_batch[-1:]), pad, axis=0)], axis=0)
    free_batch = shard_batch(jnp.asarray(free_batch), mesh)
    res = problem.solve_batch(free_batch)
    if pad:
        res = jax.tree_util.tree_map(
            lambda a: a[:b] if a.ndim and a.shape[0] == b + pad else a, res)
    return res
