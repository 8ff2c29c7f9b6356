"""Diagnostic plots (parity with opty/direct_collocation.py:569-970).

matplotlib is an optional dependency, mirroring the reference's
optional-dependency guards (opty/utils.py:240-260).
"""

import numpy as np

__all__ = ['plot_trajectories', 'plot_constraint_violations',
           'plot_objective_value', 'plot_jacobian_sparsity']


def _require_plt():
    try:
        import matplotlib.pyplot as plt
    except ImportError as err:
        raise ImportError('matplotlib must be installed for plotting.') \
            from err
    return plt


def plot_trajectories(prob, vector, axes=None, show_bounds=False):
    """Plot state and unknown-input trajectories from a free vector
    (parity: reference :569-669)."""
    plt = _require_plt()
    col = prob.collocator
    parsed = prob.parse_free(vector)
    states = parsed[0]
    specifieds = parsed[1]
    time = prob.time_vector(solution=vector)

    n = col.num_states
    q = col.num_unknown_input_trajectories
    num = n + q
    if axes is None:
        fig, axes = plt.subplots(num, 1, sharex=True,
                                 figsize=(6.4, 0.8 * num),
                                 layout='compressed')
    axes = np.atleast_1d(axes)

    syms = list(col.state_symbols) + list(col.unknown_input_trajectories)
    trajs = [states[i] for i in range(n)]
    if q == 1:
        trajs.append(np.atleast_2d(specifieds)[0])
    elif q > 1:
        trajs += [specifieds[i] for i in range(q)]

    bounds = prob.bounds or {}
    for ax, sym, traj in zip(axes, syms, trajs):
        ax.plot(time, traj)
        ax.set_ylabel(str(sym))
        if show_bounds and sym in bounds:
            low, upp = bounds[sym]
            for b in (low, upp):
                b = np.broadcast_to(np.asarray(b, dtype=float), time.shape)
                ax.plot(time, b, color='C1', linestyle='--')
    axes[-1].set_xlabel('Time')
    return axes


def plot_constraint_violations(prob, vector, axes=None, subplots=False):
    """Plot EoM constraint violations per equation and instance
    constraint violations as a bar chart (parity: reference
    :671-944, simplified layout)."""
    plt = _require_plt()
    col = prob.collocator
    con_values = prob.con(np.asarray(vector))
    M = col.num_eom
    N = col.num_collocation_nodes
    o = col.num_instance_constraints
    ni = N - 1

    # clip violations against the (possibly inequality) eom bounds
    cl = prob._low_con_bounds[:M * ni]
    cu = prob._upp_con_bounds[:M * ni]
    eomv = con_values[:M * ni]
    viol = np.where(eomv < cl, eomv - cl,
                    np.where(eomv > cu, eomv - cu, 0.0))

    nplots = 1 + (1 if o else 0)
    if axes is None:
        fig, axes = plt.subplots(nplots, 1, figsize=(6.4, 3.0 * nplots),
                                 layout='compressed')
    axes = np.atleast_1d(axes)

    time = prob.time_vector(solution=vector)[1:]
    for j in range(M):
        axes[0].plot(time, viol[j * ni:(j + 1) * ni], label='eom {}'.format(j))
    axes[0].set_ylabel('EoM violation')
    axes[0].set_xlabel('Time')
    if M <= 10:
        axes[0].legend(fontsize='x-small')

    if o:
        inst = con_values[M * ni:]
        axes[1].bar(range(o), inst)
        axes[1].set_ylabel('Instance constraint violation')
        axes[1].set_xticks(range(o))
        axes[1].set_xticklabels(
            [str(c) for c in col.instance_constraints],
            rotation=30, fontsize='x-small', ha='right')
    return axes


def plot_objective_value(prob):
    """Objective value per solver iteration (parity: reference
    :946-957)."""
    plt = _require_plt()
    fig, ax = plt.subplots(1, layout='compressed')
    ax.set_title('Objective Value')
    ax.set_xlabel('Iteration Number')
    ax.set_ylabel('Objective value')
    ax.plot(prob.obj_value)
    return ax


def plot_jacobian_sparsity(prob, axes=None):
    """Spy plot of the COO constraint Jacobian (parity: reference
    :959-970)."""
    plt = _require_plt()
    from scipy.sparse import coo_matrix
    rows, cols = prob.jacobianstructure()
    vals = np.ones_like(rows, dtype=float)
    jac = coo_matrix((vals, (rows, cols)),
                     shape=(prob.num_constraints, prob.num_free))
    if axes is None:
        fig, axes = plt.subplots(1, 1, layout='constrained')
    axes.spy(jac)
    return axes
