"""Plot suite smoke tests (parity: opty/direct_collocation.py:569-970
diagnostic methods)."""

import matplotlib

matplotlib.use('Agg')

import numpy as np
import pytest

from opty_tpu.models import spring_damper_problem


@pytest.fixture(scope='module')
def solved():
    prob = spring_damper_problem(num_nodes=31)
    np.random.seed(0)
    sol, info = prob.solve(np.random.randn(prob.num_free) * 0.1)
    return prob, sol, info


def test_plot_trajectories(solved):
    prob, sol, _ = solved
    axes = prob.plot_trajectories(sol)
    assert len(axes) == 3  # x, v, F


def test_plot_trajectories_bounds(solved):
    prob, sol, _ = solved
    axes = prob.plot_trajectories(sol, show_bounds=True)
    assert axes is not None


def test_plot_constraint_violations(solved):
    prob, sol, _ = solved
    axes = prob.plot_constraint_violations(sol)
    assert len(axes) == 2  # eom violations + instance bar chart


def test_plot_constraint_violations_subplots(solved):
    """Per-eom subplot layout with eom_bounds overlays (reference
    :671-944 behavior)."""
    prob, sol, _ = solved
    axes = prob.plot_constraint_violations(sol, subplots=True)
    M = prob.collocator.num_eom
    assert len(axes) >= M
    axes2 = prob.plot_constraint_violations(sol, subplots=True,
                                            show_bounds=True)
    assert len(axes2) == len(axes)


def test_plot_objective_value(solved):
    prob, sol, _ = solved
    ax = prob.plot_objective_value()
    assert ax is not None


def test_plot_jacobian_sparsity(solved):
    prob, sol, _ = solved
    ax = prob.plot_jacobian_sparsity()
    assert ax is not None
