"""Cartpole swing-up with predictive sampling (the analog of the
reference's python/mujoco_mpc/demos/predictive_sampling demos).

Runs the fully-jitted synchronous MPC loop and prints per-phase costs.

  python examples/cartpole_swingup.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.tasks import registry


def main():
  spec = registry.get_task('Cartpole')
  # start with the pole hanging down, cart off-center
  sim0 = make_data(spec.model).replace(
      qpos=jnp.asarray([1.0, 3.14159], dtype=jnp.float32))

  carry, costs = agent_mod.synchronous_mpc(
      spec, num_samples=256, total_steps=300, steps_per_plan=5,
      key=jax.random.key(0), sim0=sim0)

  costs = np.asarray(costs)
  print(f'initial cost/step: {costs[:20].mean():.4f}')
  print(f'final cost/step:   {costs[-20:].mean():.4f}')
  qpos = np.asarray(carry.sim.qpos)
  print(f'final state: cart={qpos[0]:+.3f}  pole angle={qpos[1]:+.3f} rad '
        f'(0 = upright)')
  assert costs[-20:].mean() < costs[:20].mean(), 'no improvement!'


if __name__ == '__main__':
  main()
