from .ipm import IPMOptions, solve_ipm, make_nlp_functions_dense
from .status import STATUS_MESSAGES

__all__ = ['IPMOptions', 'solve_ipm', 'make_nlp_functions_dense',
           'STATUS_MESSAGES']
