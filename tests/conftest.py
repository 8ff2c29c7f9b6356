"""Test configuration: force the CPU backend with 8 virtual devices.

Must run before any JAX backend is initialized.  The axon TPU plugin
registers itself in sitecustomize, so explicitly select cpu here; the
mesh/sharding tests then see 8 CpuDevices
(--xla_force_host_platform_device_count=8).
"""
import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import opty_tpu  # noqa: E402, F401  (enables x64)
