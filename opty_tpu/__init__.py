"""opty_tpu: a TPU-native direct-collocation trajectory optimization and
parameter identification framework with the capabilities of csu-hmc/opty.

Importing this package enables JAX x64 mode (see opty_tpu.config).
"""

from . import config  # noqa: F401  (enables x64; must come first)
from .version import __version__  # noqa: F401
