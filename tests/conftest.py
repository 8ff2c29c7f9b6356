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


def pytest_addoption(parser):
    parser.addoption(
        '--runslow', action='store_true', default=False,
        help='run tests marked slow (multi-minute shard_map compiles)')


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'slow: multi-minute XLA compiles (8-device shard_map SPIKE '
        'programs); excluded by default, enable with --runslow')


def pytest_collection_modifyitems(config, items):
    import pytest
    if config.getoption('--runslow'):
        return
    skip_slow = pytest.mark.skip(reason='slow shard_map compile; '
                                 'use --runslow')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip_slow)
