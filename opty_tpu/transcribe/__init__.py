from .collocator import ConstraintCollocator
from .hessian import structured_scalar_hessian

__all__ = ['ConstraintCollocator', 'structured_scalar_hessian']
