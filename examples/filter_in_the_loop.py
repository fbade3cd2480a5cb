"""State estimation in the control loop: EKF/UKF feeding the planner.

The analog of the reference's filter demos (python/mujoco_mpc/demos/
filter examples + EstimatorLoop, app.cc:151-206): the simulation emits
noisy sensors, a Kalman (or Unscented) filter tracks the state from
(ctrl, sensors) pairs only, and the planner plans from the ESTIMATE, not
the true state.

  python examples/filter_in_the_loop.py [--estimator ukf]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_platforms', os.environ.get('MTPU_PLATFORM', 'cpu'))

import numpy as np


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--estimator', choices=['ekf', 'ukf'], default='ekf')
  parser.add_argument('--duration', type=float, default=1.0)
  parser.add_argument('--sensor_noise', type=float, default=0.005)
  args = parser.parse_args()

  from mujoco_mpc_tpu import app as app_mod

  app = app_mod.App('Cartpole', num_samples=64,
                    percent_realtime=100000.0,  # run as fast as possible
                    estimator=args.estimator,
                    sensor_noise_std=args.sensor_noise)
  metrics = app.run(duration=args.duration)

  qpos_true = np.asarray(app.agent.sim_data.qpos)
  est = app.estimate()
  assert est is not None
  qpos_est, qvel_est = est
  err = np.abs(qpos_est - qpos_true).max()
  print(f"steps={metrics['steps']} plans={metrics['plan_iterations']}")
  print(f'true qpos:      {np.round(qpos_true, 4)}')
  print(f'estimated qpos: {np.round(qpos_est, 4)}')
  print(f'max abs error:  {err:.5f}')


if __name__ == '__main__':
  main()
