"""opty_tpu: a TPU-native direct-collocation trajectory optimization
and parameter identification framework with the capabilities of
csu-hmc/opty, built on JAX/XLA (SymPy dynamics -> vmapped residual
kernels -> structured-KKT interior-point solver; no Ipopt, no
per-problem C code generation).

Importing this package enables JAX x64 mode (see opty_tpu.config).

Public API parity with ``opty`` (opty/__init__.py re-exports
direct_collocation and utils): ``from opty_tpu import Problem,
create_objective_function, parse_free`` etc.
"""

from . import config  # noqa: F401  (enables x64; must come first)
from .version import __version__  # noqa: F401
from .problem import Problem  # noqa: F401
from .transcribe.collocator import ConstraintCollocator  # noqa: F401
from .utils import (  # noqa: F401
    create_objective_function, parse_free, state_derivatives, f_minus_ma,
    sum_of_sines, controllable, substitute_matrix, sort_sympy)
from .nlp import IPMOptions, solve_ipm  # noqa: F401
