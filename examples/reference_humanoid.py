"""MPC on the reference's OWN Humanoid Stand config (contact-rich).

Assembles the reference's humanoid task exactly as its build does
(dm_control humanoid.xml + mjpc/tasks/humanoid/humanoid.xml.patch +
stand/task.xml, staged by tasks/reference.py), then runs predictive
sampling MPC on it with this framework — planning the same 27-dof
contact-rich model, cost terms and weights a reference user would run.

Reference: mjpc/tasks/humanoid/stand/{task.xml,stand.cc}.

Usage: python examples/reference_humanoid.py [--samples N] [--steps T]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--samples', type=int, default=128)
  p.add_argument('--steps', type=int, default=100)
  p.add_argument('--steps_per_plan', type=int, default=4)
  p.add_argument('--platform', default=None,
                 help="e.g. 'cpu' to force the CPU backend")
  args = p.parse_args()
  if args.platform:
    jax.config.update('jax_platforms', args.platform)

  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.tasks import reference as ref

  if not ref.available():
    print('reference checkout / dm_control unavailable; nothing to do')
    return

  spec = ref.get_reference_task('humanoid_stand', dtype=jnp.float32)
  print('model: nq=%d nv=%d nu=%d  horizon=%.2fs  timestep=%.3fs'
        % (spec.model.nq, spec.model.nv, spec.model.nu,
           spec.config.get('agent_horizon', 0.0),
           spec.config.get('agent_timestep', 0.0)))

  sim0 = make_data(spec.model)
  t0 = time.perf_counter()
  carry, costs = agent_mod.synchronous_mpc(
      spec, num_samples=args.samples, total_steps=args.steps,
      steps_per_plan=args.steps_per_plan, key=jax.random.key(0),
      sim0=sim0)
  jax.block_until_ready(costs)
  wall = time.perf_counter() - t0
  c = np.asarray(costs)
  print('steps=%d  wall=%.1fs  cost first10=%.3f last10=%.3f'
        % (args.steps, wall, c[:10].mean(), c[-10:].mean()))
  qpos = np.asarray(carry.sim.qpos)
  print('final torso height: %.3f (standing ~1.28)' % qpos[2])


if __name__ == '__main__':
  main()
