"""Multi-host skeleton smoke test: two coordinated CPU processes
solve a DP-split batch through the IPM and agree with the known
optimum (SURVEY.md §5 distributed-backend row; the reference has no
multi-process capability at all).

The two workers federate via jax.distributed + gloo collectives —
the same entry path a TPU pod would use with the coordinator/process
arguments inferred from the environment.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)

WORKER = r'''
import sys
proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update('jax_platforms', 'cpu')
from opty_tpu.parallel import multihost  # noqa: E402 (enables x64)

multihost.initialize('127.0.0.1:' + port, nproc, proc_id)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == nproc

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from opty_tpu.nlp.ipm import (IPMOptions, make_nlp_functions_dense,
                              solve_ipm)

target = jnp.array([1.0, 2.0])


def objective(x):
    return jnp.sum((x - target) ** 2)


def constraints(x):
    return jnp.array([x[0] + x[1]])


fns = make_nlp_functions_dense(objective, constraints)
xl = jnp.array([-5.0, -5.0])
xu = jnp.array([5.0, 5.0])
cl = cu = jnp.array([2.0])
opts = IPMOptions(max_iter=100)

mesh = multihost.global_batch_mesh()
# each process contributes ONE lane of the global batch
local = np.array([[0.1 * (proc_id + 1), -0.2 * (proc_id + 1)]])
gbatch = multihost.host_local_batch_to_global(local, mesh)


def solve(x0):
    r = solve_ipm(fns, x0, xl, xu, cl, cu, options=opts)
    return r.x, r.status


rep = NamedSharding(mesh, P())
xs, sts = jax.jit(jax.vmap(solve), out_shardings=(rep, rep))(gbatch)
xs = np.asarray(xs)
sts = np.asarray(sts)
assert np.all(sts <= 1), sts
np.testing.assert_allclose(xs, [[0.5, 1.5]] * nproc, atol=1e-6)
print('MULTIHOST_OK', proc_id, flush=True)
jax.distributed.shutdown()
'''


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_solve(tmp_path):
    worker = tmp_path / 'worker.py'
    worker.write_text(WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    # the workers pick their own platform/devices
    env.pop('JAX_PLATFORMS', None)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), '2', port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('multihost workers timed out:\n'
                    + '\n'.join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert f'MULTIHOST_OK {i}' in out, out
