"""Quadruped mode machinery: gaits, auto-gait switching, modes.

The analog of driving the reference quadruped task's GUI dropdowns
(mjpc/tasks/quadruped/quadruped.h:40-47 modes, 77-97 gaits): run MPC on
Quadruped Flat, switch between Quadruped / Biped / Walk modes mid-run,
and watch the speed-based automatic gait switching pick cadences.

  python examples/quadruped_modes.py [--duration 6]
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
  parser.add_argument('--duration', type=float, default=3.0)
  parser.add_argument('--samples', type=int, default=64)
  args = parser.parse_args()

  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task('Quadruped Flat')
  agent = agent_mod.Agent(spec, num_samples=args.samples)
  idx = {n: i for i, n in enumerate(spec.residual_param_names)}

  dt = float(spec.model.opt.timestep)
  steps = int(args.duration / dt)
  third = max(steps // 3, 1)
  # mode schedule: Quadruped -> Walk -> back (reference A_MODES dropdown)
  schedule = {0: 0, third: 2, 2 * third: 0}
  steps_per_plan = 10

  for i in range(steps):
    if i in schedule:
      agent.set_mode(schedule[i])
      print(f't={i * dt:.2f}s -> mode {schedule[i]}')
    agent.transition()
    if i % steps_per_plan == 0:
      agent.plan_iteration()
    agent.step()
    if i % 100 == 0:
      rp = np.asarray(agent.params.residual_params)
      gait = int(round(float(rp[idx['_cur_gait']])))
      h = float(np.asarray(agent.sim_data.qpos)[2])
      print(f't={i * dt:.2f}s height={h:.3f} gait={gait}')
  print('done; final qpos[:3] =',
        np.round(np.asarray(agent.sim_data.qpos[:3]), 3))


if __name__ == '__main__':
  main()
