from .pendulum import swing_up_problem
from .spring_damper import spring_damper_problem

__all__ = ['swing_up_problem', 'spring_damper_problem']
