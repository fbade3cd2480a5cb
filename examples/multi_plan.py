"""Batched MPC: vmap the ENTIRE synchronous MPC loop over initial states
under one jit (the analog of the reference's
python/mujoco_mpc/mjx/multi_plan.ipynb:174-188, which vmaps mpc_rollout
over a batch of initial states).

This is the TPU-native superpower the thread-pool architecture cannot
express: N independent receding-horizon control problems — each itself
fanning out hundreds of sampled rollouts per plan — solved as a single
XLA program.

  python examples/multi_plan.py
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

NUM_INSTANCES = 8


def main():
  spec = registry.get_task('Cartpole')
  d0 = make_data(spec.model)

  # batch of initial conditions: pole angles from slightly-off to hanging
  angles = jnp.linspace(0.5, 3.14159, NUM_INSTANCES)
  sims0 = jax.vmap(
      lambda a: d0.replace(qpos=jnp.stack([0.0, a]).astype(d0.qpos.dtype))
  )(angles)

  def run_one(sim0, key):
    carry, costs = agent_mod.synchronous_mpc(
        spec, num_samples=256, total_steps=300, steps_per_plan=5,
        key=key, sim0=sim0)
    return carry.sim.qpos, costs

  keys = jax.random.split(jax.random.key(0), NUM_INSTANCES)
  qpos, costs = jax.jit(jax.vmap(run_one))(sims0, keys)

  qpos, costs = np.asarray(qpos), np.asarray(costs)
  print(f'{NUM_INSTANCES} MPC instances x 256 samples/plan, one XLA program')
  for i in range(NUM_INSTANCES):
    final = costs[i, -20:].mean()
    print(f'  angle0={float(angles[i]):+.2f} rad   '
          f'final cost/step={final:.3f}   '
          f'final pole angle={qpos[i, 1] % (2 * np.pi):+.3f} rad')
  assert costs[:, -20:].mean() < costs[:, :20].mean(), 'no improvement!'


if __name__ == '__main__':
  main()
