"""Global configuration for opty_tpu.

opty_tpu solves collocation NLPs to Ipopt-level tolerances (1e-8), which
requires float64 arithmetic in the solver core.  JAX disables x64 by
default, so importing :mod:`opty_tpu` enables it process-wide (the same
contract as ``import opty`` pulling in Ipopt's double-precision solver;
reference: opty uses C doubles throughout, opty/utils.py:483-529).

On TPU hardware float64 is emulated: elementwise ops and matmuls work
(slowly), but the dense linear-algebra lowerings (LU/QR) do not compile.
The interior-point KKT factorization therefore always runs in
``factor_dtype`` (float32 on TPU) and recovers float64 accuracy through
iterative refinement in ``refine_dtype``.  On CPU both default to
float64 and refinement is a no-op.
"""

import os

import jax

jax.config.update('jax_enable_x64', True)

# Persistent XLA compilation cache: the analog of the reference's
# sha256-keyed compiled-kernel cache (opty/utils.py:759-770, 824-864),
# but covering the entire solver program.  Especially valuable on TPU
# where compilation goes through a remote compile service.
_cache_dir = os.environ.get('OPTY_TPU_CACHE',
                            os.path.expanduser('~/.cache/opty_tpu_xla'))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

import jax.numpy as jnp  # noqa: E402


def default_dtype():
    """Residual/gradient working dtype (float64 when x64 is enabled)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def on_tpu():
    try:
        return jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def default_factor_dtype():
    """dtype for the blocked factorizations inside the KKT solve.

    The block factorizations use pure-jnp pivoted elimination
    (ops/smallblock.py), which runs in emulated float64 on TPU, so the
    default is full precision everywhere.  float32 (+ the automatic
    extra iterative-refinement rounds) remains available via
    Problem.set_solver_options(factor_dtype=jnp.float32) as a speed
    option.
    """
    return default_dtype()


def default_kkt_method():
    """KKT factorization algorithm: 'scan' (sequential block LU) or
    'cr' (log-depth cyclic reduction).

    'cr' is the latency-optimal choice for large-N single problems on
    TPU, but its unrolled levels currently inflate XLA-TPU compile
    times badly (>20 min for the batched solver vs ~8 min for scan),
    so 'scan' is the default everywhere for now;
    Problem.set_solver_options(kkt_method='cr') opts in.
    """
    return 'scan'
