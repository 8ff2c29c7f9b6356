"""Symbol classification for the collocation transcription.

Reproduces the reference's classification *rules* (behavioral parity
with opty/direct_collocation.py:1904-2035: ``_parse_inputs``,
``_sort_parameters``, ``_sort_trajectories``) without its code: known
symbols keep the user's dict ordering, unknown symbols are the
remainder found in the equations of motion sorted by name
(opty/utils.py:473-480 ``sort_sympy``).
"""

import sympy as sm
import sympy.physics.mechanics as me

__all__ = ['sort_sympy', 'classify_parameters', 'classify_trajectories']


def sort_sympy(seq):
    """Sort symbols by ``.name``; applied functions by class name.

    Mirrors opty/utils.py:473-480 so unknown-variable ordering in the
    free vector matches the reference exactly.
    """
    seq = list(seq)
    try:
        seq.sort(key=lambda x: x.name)
    except AttributeError:
        seq.sort(key=lambda x: x.__class__.__name__)
    return seq


def _split_known_unknown(all_syms, known_syms):
    """Partition ``all_syms`` into (known in user order, unknown sorted).

    Raises if known symbols are supplied but none appear in the
    equations (parity with opty/direct_collocation.py:1928-1934).
    """
    all_syms = set(all_syms)
    if not all_syms:
        if known_syms:
            raise ValueError(
                '{} are not in the provided equations of motion.'.format(
                    known_syms))
        return tuple(), tuple()
    if known_syms:
        known = tuple(known_syms)
        unknown = tuple(sort_sympy(all_syms.difference(known)))
    else:
        known = tuple()
        unknown = tuple(sort_sympy(all_syms))
    return known, unknown


def classify_parameters(eom, time_symbol, time_interval_symbol,
                        known_parameter_map):
    """Classify the constant parameters appearing in the EoMs.

    Returns (known_parameters, unknown_parameters) tuples.  Known keep
    user dict order; unknowns are sorted by name (parity with
    opty/direct_collocation.py:1954-1973).
    """
    parameters = set(eom.free_symbols)
    parameters.discard(time_symbol)
    parameters.discard(time_interval_symbol)
    return _split_known_unknown(parameters, known_parameter_map.keys())


def classify_trajectories(eom, state_symbols, time_symbol,
                          known_trajectory_map):
    """Classify non-state time-varying functions in the EoMs.

    Returns (known_input_trajectories, unknown_input_trajectories).
    Handles explicit functions of time ``f(t)`` and implicit functions
    of a single state ``f(x(t))`` (parity with
    opty/direct_collocation.py:1988-2035).
    """
    states = set(state_symbols)
    state_derivs = {s.diff(time_symbol) for s in state_symbols}

    time_varying = me.find_dynamicsymbols(eom)
    non_states = time_varying.difference(states | state_derivs)

    if sm.Matrix(list(non_states)).has(sm.Derivative):
        raise ValueError('Too few state variables provided for state time '
                         'derivatives found in equations of motion.')

    for func in non_states:
        if func.args == (time_symbol,):
            continue  # explicit function of time
        if len(func.args) > 1:
            raise ValueError(
                '{} is a function of more than one variable.'.format(func))
        # else: implicit function of a single (state) variable, allowed

    fnames = [f.name for f in non_states]
    if len(fnames) != len(set(fnames)):
        raise ValueError('Repeated input trajectory variable fnames not '
                         'allowed: {}'.format(fnames))

    return _split_known_unknown(non_states, known_trajectory_map.keys())
