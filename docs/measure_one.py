"""Measure ONE bench config through bench.py's exact program shape.

Mirrors bench.measure_extra_configs's run_once (same jit signature →
same persistent-cache key), so running this ahead of the driver warms
the compile cache AND reports blocking p50 + steady-state chained-plan
latency. Usage:

  python docs/measure_one.py rubik [num_samples]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
from mujoco_mpc_tpu.utils import cache as _mcache  # noqa: E402
_mcache.enable()

CONFIGS = {
    'cartpole': ('Cartpole', 8192),
    'quadruped': ('Quadruped Flat', 4096),
    'humanoid_track': ('Humanoid Track', 512),
    'shadow': ('Shadow Reorient', 8192),
    'rubik': ('Cube Solving', 512),
}


def main():
  name = sys.argv[1]
  task, ns = CONFIGS[name]
  if len(sys.argv) > 2:
    ns = int(sys.argv[2])

  import jax
  import numpy as np
  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.ops import spline
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task(task)
  m = spec.model
  t_steps = agent_mod.horizon_steps(spec)
  d0 = make_data(m)
  if 'home' in m.keyframe_names:
    d0 = d0.replace(qpos=m.key_qpos[m.keyframe_names.index('home')])
  policy = sampling.default_policy(spec, 10)
  cfg = sampling.default_config(spec)
  params = spec.default_params

  @jax.jit
  def plan(pol, k, spec=spec, cfg=cfg, params=params, d0=d0, ns=ns,
           t_steps=t_steps):
    p, info = sampling.optimize(spec, pol, d0, params, cfg, k, ns,
                                t_steps, int(spline.Interp.ZERO))
    return p, info['best_return']

  k = jax.random.key(0)
  t0 = time.perf_counter()
  r = plan(policy, k)
  jax.block_until_ready(r)
  print(f'{name}: compile+first {time.perf_counter() - t0:.1f}s',
        flush=True)
  best0 = float(np.asarray(r[1]))
  print(f'{name}: best_return {best0:.4f}', flush=True)
  if not np.isfinite(best0):
    raise RuntimeError(f'non-finite best_return {best0}')
  lat = []
  for _ in range(8):
    t0 = time.perf_counter()
    r = plan(policy, k)
    jax.block_until_ready(r)
    lat.append(time.perf_counter() - t0)
  lat.sort()
  t0 = time.perf_counter()
  p = policy
  for _ in range(8):
    p, _ = plan(p, k)
  jax.block_until_ready(p)
  steady = (time.perf_counter() - t0) / 8
  print(f'{name} {ns}x{t_steps}: p50 {lat[4] * 1e3:.1f} ms  '
        f'steady {steady * 1e3:.1f} ms', flush=True)


if __name__ == '__main__':
  main()
