"""Shared helpers for the gallery ports.

Each port exposes ``build_problem() -> (prob, csv_path)`` where
``csv_path`` is the reference's committed Ipopt solution for the same
configuration.  ``certify`` checks the strongest form of parity we can
assert without Ipopt in the image: the reference optimum is feasible
in our transcription and is certified as a KKT point by our solver in
a handful of warm-started iterations.
"""

import os

import numpy as np

REF_GALLERY = '/root/reference/examples-gallery'


def csv(path):
    p = os.path.join(REF_GALLERY, path)
    return p if os.path.exists(p) else None


def certify(prob, csv_path, feas_tol=1e-6, max_certify_iters=25,
            verbose=True, solver_options=None):
    """Certify the reference's committed Ipopt solution with our
    solver.  Returns (solution, info)."""
    ref = np.loadtxt(csv_path)
    g = np.asarray(prob.con(ref))
    # feasibility = distance outside [cl, cu] (eom_bounds rows are
    # path inequalities, not equalities)
    cl, cu = prob._low_con_bounds, prob._upp_con_bounds
    resid = float(np.max(np.maximum(np.maximum(cl - g, g - cu), 0.0)))
    if verbose:
        print('reference solution constraint violation in our '
              'transcription: {:.2e}'.format(resid))
    assert resid < feas_tol, resid
    prob.set_solver_options(max_iter=max(50, max_certify_iters + 15),
                            mu_init=1e-9,
                            bound_push=1e-10, slack_push=1e-10,
                            **(solver_options or {}))
    sol, info = prob.solve(ref)
    if verbose:
        print('certification: status={} iters={} obj={:.6f}'.format(
            info['status'], info['iterations'], info['obj_val']))
    assert info['status'] in (0, 1), info['status_msg']
    assert info['iterations'] <= max_certify_iters
    return sol, info
