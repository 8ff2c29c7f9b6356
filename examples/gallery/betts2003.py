"""Betts 2003 parameter identification — known trajectory + midpoint.

Port of the reference gallery problem
(examples-gallery/beginner/plot_betts2003.py, after Betts'
"Exploiting Sparsity in the Direct Transcription Method for Optimal
Control", 2003): identify the parameter p of a forced oscillator from
noisy measurements of both states; true value p = pi.

Run:  python examples/gallery/betts2003.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import sympy as sm


def build_problem(num_nodes=100, seed=1234):
    from opty_tpu import Problem
    import jax.numpy as jnp

    duration = 1.0
    interval = duration / (num_nodes - 1)
    mu, p, t = sm.symbols('mu, p, t')
    y1, y2, T = [sm.Function(s)(t) for s in ('y1', 'y2', 'T')]

    eom = sm.Matrix([
        y1.diff(t) - y2,
        y2.diff(t) - mu ** 2 * y1 + (mu ** 2 + p ** 2)
        * sm.sin(p * T),
    ])
    par_map = {mu: 60.0}
    time = np.linspace(0.0, duration, num=num_nodes)
    rng = np.random.default_rng(seed)
    y1_m = np.sin(np.pi * time) + rng.normal(scale=0.05, size=num_nodes)
    y1_j = jnp.asarray(y1_m)

    def obj(free):
        return interval * jnp.sum((y1_j - free[:num_nodes]) ** 2)

    prob = Problem(obj, None, eom, (y1, y2), num_nodes, interval,
                   known_parameter_map=par_map,
                   known_trajectory_map={T: time},
                   instance_constraints=(y1.subs(t, 0.0),
                                         y2.subs(t, 0.0) - np.pi),
                   time_symbol=t, integration_method='midpoint')
    return prob, None


if __name__ == '__main__':
    prob, _ = build_problem()
    rng = np.random.default_rng(0)
    sol, info = prob.solve(rng.standard_normal(prob.num_free))
    print(info['status_msg'])
    print('Known value of p      =', np.pi)
    print('Identified value of p =', sol[-1])
