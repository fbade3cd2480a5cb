"""Plan on the reference's OWN Fingers task config (elliptic cones).

Stages /root/reference/mjpc/tasks/fingers/task.xml (self-contained MJCF,
<option cone="elliptic"/> condim-6 contacts, gravcomp'd free fingers,
implicit integrator) via tasks/reference.py, then runs predictive
sampling on it with this framework — the same task configuration a
reference user would run, planned by the TPU engine.

Reference: mjpc/tasks/fingers/{task.xml,fingers.cc}.

Usage: python examples/reference_fingers.py [--samples N] [--iters K]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--samples', type=int, default=64)
  p.add_argument('--iters', type=int, default=5)
  p.add_argument('--platform', default=None,
                 help="e.g. 'cpu' to force the CPU backend")
  args = p.parse_args()
  if args.platform:
    jax.config.update('jax_platforms', args.platform)

  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.ops import spline
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import reference

  if not reference.available():
    print('reference checkout not available; nothing to do')
    return

  spec = reference.get_reference_task('fingers')
  m = spec.model
  assert m.opt.cone == 1, 'fingers config uses elliptic cones'
  print(f'loaded reference fingers: nq={m.nq} nu={m.nu} '
        f'planner={spec.config.get("agent_planner")} '
        f'horizon={spec.config.get("agent_horizon")}s')

  d0 = make_data(m, dtype=jnp.float64)
  k = m.keyframe_names.index('home')
  d0 = d0.replace(qpos=m.key_qpos[k], act=m.key_act[k])

  t_steps = agent_mod.horizon_steps(spec)
  policy = sampling.default_policy(
      spec, int(spec.config.get('sampling_spline_points', 5)), jnp.float64)
  cfg = sampling.default_config(spec, jnp.float64)
  key = jax.random.key(0)
  for i in range(args.iters):
    key, kk = jax.random.split(key)
    policy, info = sampling.optimize(
        spec, policy, d0, spec.default_params, cfg, kk, args.samples,
        t_steps, int(spline.Interp.ZERO))
    print(f'iter {i}: best_return={float(info["best_return"]):.4f}')
  u0 = sampling.action_from_policy(spec, policy, jnp.asarray(0.0),
                                   int(spline.Interp.ZERO))
  print('plan action(t=0):', np.asarray(u0).round(4))


if __name__ == '__main__':
  main()
