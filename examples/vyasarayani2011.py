"""Parameter identification of a non-minimum-phase pendulum from noisy
measurements (the reference's examples/vyasarayani2011.py, CI smoke
example, re-expressed for opty_tpu).

Identifies p in  y'' + p sin(y) = 0  from noisy observations of y,
with simultaneous state estimation on a midpoint collocation grid.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import argparse
import time

import numpy as np
import sympy as sym
from scipy.integrate import odeint

import jax.numpy as jnp

from opty_tpu import Problem


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--nodes', type=int, default=5000)
    parser.add_argument('--noise', type=float, default=0.05)
    args = parser.parse_args()

    p, t = sym.symbols('p, t')
    y1, y2 = [f(t) for f in sym.symbols('y1, y2', cls=sym.Function)]
    eom = sym.Matrix([y1.diff(t) - y2, y2.diff(t) + p * sym.sin(y1)])

    duration = 50.0
    num_nodes = args.nodes
    interval = duration / (num_nodes - 1)
    tv = np.linspace(0.0, duration, num=num_nodes)
    p_true = 10.0

    y_meas = odeint(lambda y, _t, pp: np.array(
        [y[1], -pp * np.sin(y[0])]), [np.pi / 6.0, 0.0], tv,
        args=(p_true,))
    rng = np.random.default_rng(11)
    y1_meas = y_meas[:, 0] + rng.normal(scale=args.noise, size=num_nodes)
    y1j = jnp.asarray(y1_meas)

    def obj(free):
        return interval * jnp.sum((y1j - free[:num_nodes]) ** 2)

    prob = Problem(obj, None, eom, (y1, y2), num_nodes, interval,
                   time_symbol=t, integration_method='midpoint')

    x0 = np.hstack([y1_meas, np.gradient(y1_meas, interval), 30.0])
    t0 = time.time()
    sol, info = prob.solve(x0)
    print(info['status_msg'])
    print('identified p = {:.6f} (true {})  iters {}  wall {:.1f}s'.format(
        sol[-1], p_true, info['iterations'], time.time() - t0))


if __name__ == '__main__':
    main()
