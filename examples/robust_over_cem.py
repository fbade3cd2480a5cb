"""Robust planning as a decorator over any ranked planner.

The reference instantiates its RobustPlanner only over predictive
sampling (mjpc/planners/include.cc:48-49); the RankedPlanner abstraction
(planner.h:84-102) allows any multi-candidate planner underneath. Here
the same OU-force-perturbed re-scoring wraps the Cross-Entropy planner:
CEM proposes its elite set, each elite is re-rolled under random force
perturbations, and the best AVERAGE performer is promoted — keeping CEM's
adaptive per-knot variance.

  python examples/robust_over_cem.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_platforms', os.environ.get('MTPU_PLATFORM', 'cpu'))

import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import cross_entropy, ranked, robust
from mujoco_mpc_tpu.tasks import registry


def main():
  spec = registry.get_task('ParticleFixed')
  dtype = spec.model.qpos0.dtype
  d0 = make_data(spec.model, dtype=dtype)
  t_steps = agent_mod.horizon_steps(spec)
  interp = int(spline.Interp.ZERO)

  delegate = ranked.make_cem_delegate(
      spec, cross_entropy.default_config(spec, dtype), num_samples=64,
      num_points=5, horizon_steps=t_steps, interp=interp, dtype=dtype)
  rcfg = robust.RobustConfig(xfrc_std=jnp.asarray(0.05, dtype),
                             xfrc_rate=jnp.asarray(0.1, dtype))

  state = delegate.init()
  opt = jax.jit(lambda st, key: robust.optimize_ranked(
      spec, delegate, st, d0, spec.default_params, rcfg, key,
      ncandidates=8, nrepetitions=4, horizon_steps=t_steps, interp=interp))

  for i, k in enumerate(jax.random.split(jax.random.key(0), 10)):
    state, info = opt(state, k)
    print(f'iter {i}: best return {float(info["best_return"]):.4f}  '
          f'robust score {float(info["best_robust_score"]):.4f}')
  u = delegate.action(state, d0.time)
  print('final action:', np.round(np.asarray(u), 4))


if __name__ == '__main__':
  main()
