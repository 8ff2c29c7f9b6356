"""Multi-host entry path: ``jax.distributed`` initialization + the
data-parallel batch-split pattern across processes.

The reference is strictly single-process (SURVEY.md §5: no NCCL/MPI/
Gloo/UCX anywhere; the only parallelism is OpenMP threads inside the
generated C kernels, opty/utils.py:716-741).  Scaling beyond one host
is therefore new architecture: each host contributes its local devices
to one global mesh, instance batches are split across processes
(data parallel — SURVEY.md P2 at multi-host scope), and XLA's
collectives ride ICI within a slice and DCN across slices.

Usage (same call order on every process, before any device use)::

    from opty_tpu.parallel import multihost
    multihost.initialize(coordinator_address='host0:1234',
                         num_processes=4, process_id=rank)
    mesh = multihost.global_batch_mesh()
    global_free = multihost.host_local_batch_to_global(local_free, mesh)
    # jit(vmap(solve))(global_free) now runs DP across all hosts

On TPU pods the three ``initialize`` arguments are inferred from the
environment and may be omitted.  For CPU-backend testing (this image
has one chip and no second host), processes federate over gloo:
``tests/test_multihost.py`` spawns two coordinated CPU processes and
solves a DP-split batch, asserting both lanes converge identically to
the single-process solve.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['initialize', 'global_batch_mesh',
           'host_local_batch_to_global', 'replicate_to_global']


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, cpu_collectives='gloo'):
    """Join (or start) the jax.distributed coordination service.

    Idempotent: a second call is a no-op.  On the CPU backend the
    cross-process collectives implementation must be selected before
    the backend initializes; ``cpu_collectives`` does so when the
    active platform is cpu (the config knob does not exist for
    device backends' plugins, where collectives are native).
    """
    state = jax._src.distributed.global_state
    if state.client is not None:  # already initialized
        return
    try:
        if cpu_collectives and jax.config.jax_platforms and \
                'cpu' in str(jax.config.jax_platforms):
            jax.config.update('jax_cpu_collectives_implementation',
                              cpu_collectives)
    except Exception:  # knob absent on this jax version: native path
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch_mesh(axis_name='batch'):
    """1-D mesh over every device of every process (DP axis)."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def host_local_batch_to_global(local_batch, mesh, axis_name='batch'):
    """Assemble a globally-sharded batch from per-process slices.

    ``local_batch`` is this process's (B_local, ...) slab; the global
    array has shape (sum of B_local, ...) with rows sharded over
    ``mesh[axis_name]`` in process order.  No data moves: each process
    contributes the shard it already holds.
    """
    local_batch = np.asarray(local_batch)
    sharding = NamedSharding(mesh, P(axis_name))
    global_rows = local_batch.shape[0] * jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, local_batch,
        (global_rows,) + local_batch.shape[1:])


def replicate_to_global(value, mesh):
    """Replicate a host value (same on every process) onto the mesh."""
    value = np.asarray(value)
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx])
