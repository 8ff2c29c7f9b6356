"""Fixed-duration pendulum swing-up (the reference gallery's beginner
example, examples-gallery/beginner/
plot_pendulum_swing_up_fixed_duration.py, re-expressed for opty_tpu).

Run:  python examples/pendulum_swing_up.py [--batch B]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import argparse
import time

import numpy as np
import sympy as sm

from opty_tpu import Problem, create_objective_function


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=0,
                        help='solve B multi-start instances via vmap')
    parser.add_argument('--nodes', type=int, default=501)
    parser.add_argument('--plot', action='store_true')
    parser.add_argument('--variable-duration', action='store_true',
                        help='free time interval h (reference: '
                        'plot_pendulum_swing_up_variable_duration.py)')
    args = parser.parse_args()

    if args.variable_duration:
        from opty_tpu.models import swing_up_problem
        prob = swing_up_problem(num_nodes=args.nodes,
                                variable_duration=True)
        np.random.seed(2)
        x0 = np.random.randn(prob.num_free) * 0.01
        x0[-1] = 0.01
        prob.set_solver_options(max_iter=2000)
        t0 = time.time()
        solution, info = prob.solve(x0)
        print(info['status_msg'])
        print('objective: {:.6f}  h: {:.6f}  iterations: {}  '
              'wall: {:.1f}s'.format(info['obj_val'], solution[-1],
                                     info['iterations'],
                                     time.time() - t0))
        if args.plot:
            import matplotlib.pyplot as plt
            prob.plot_trajectories(solution)
            plt.show()
        return

    duration = 10.0
    num_nodes = args.nodes
    interval_value = duration / (num_nodes - 1)

    I, m, g, d, t = sm.symbols('I, m, g, d, t')
    theta, omega, T = sm.symbols('theta, omega, T', cls=sm.Function)

    state_symbols = (theta(t), omega(t))
    eom = sm.Matrix([theta(t).diff() - omega(t),
                     I * omega(t).diff() + m * g * d * sm.sin(theta(t))
                     - T(t)])
    par_map = {I: 1.0, m: 1.0, g: 9.81, d: 1.0}

    obj, obj_grad = create_objective_function(
        sm.Integral(T(t) ** 2, t), state_symbols, (T(t),), tuple(),
        num_nodes, interval_value, time_symbol=t)

    target_angle = np.pi
    instance_constraints = (
        theta(0.0),
        theta(duration) - target_angle,
        omega(0.0),
        omega(duration),
    )

    prob = Problem(obj, obj_grad, eom, state_symbols, num_nodes,
                   interval_value,
                   known_parameter_map=par_map,
                   instance_constraints=instance_constraints,
                   bounds={T(t): (-2.0, 2.0)},
                   time_symbol=t)

    rng = np.random.default_rng(7)
    if args.batch:
        batch = rng.standard_normal((args.batch, prob.num_free))
        t0 = time.time()
        res = prob.solve_batch(batch)
        wall = time.time() - t0
        status = np.asarray(res.status)
        print('batch of {}: {} converged, best obj {:.4f}, {:.1f}s'.format(
            args.batch, int(np.sum(status == 0)),
            float(np.min(np.asarray(res.obj_val)[status == 0])), wall))
        return

    initial_guess = rng.standard_normal(prob.num_free)
    t0 = time.time()
    solution, info = prob.solve(initial_guess)
    print(info['status_msg'])
    print('objective:', info['obj_val'], ' iterations:',
          info['iterations'], ' wall: {:.1f}s'.format(time.time() - t0))
    if args.plot:
        import matplotlib.pyplot as plt
        prob.plot_trajectories(solution)
        prob.plot_constraint_violations(solution)
        prob.plot_objective_value()
        plt.show()


if __name__ == '__main__':
    main()
