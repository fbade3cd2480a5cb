"""One-shot TPU measurement sweep for the perf configs (docs/PERF.md).

Measures p50 plan latency for the BASELINE configs on the real chip,
with the fused-rollout kernel off and on (cartpole-class models), and
prints a compact table. Run when the axon tunnel is up:

  python docs/measure_tpu.py            # all configs
  python docs/measure_tpu.py cartpole   # one config

Per tpu-perf-playbook: only whole-program timings are trustworthy
through the tunnel (~30 ms per dispatch).
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
    'rubik': ('Cube Solving', 4096),
}


def measure(task, ns, reps=10):
  import jax
  import jax.numpy as jnp
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
  def plan(pol, k):
    p, info = sampling.optimize(spec, pol, d0, params, cfg, k, ns,
                                t_steps, int(spline.Interp.ZERO))
    return p, info['best_return']

  key = jax.random.key(0)
  t0 = time.perf_counter()
  r = plan(policy, key)
  jax.block_until_ready(r)
  compile_s = time.perf_counter() - t0
  lat = []
  for _ in range(reps):
    t0 = time.perf_counter()
    r = plan(policy, key)
    jax.block_until_ready(r)
    lat.append(time.perf_counter() - t0)
  lat.sort()
  return lat[len(lat) // 2] * 1e3, compile_s, t_steps


def main():
  only = sys.argv[1] if len(sys.argv) > 1 else None
  for name, (task, ns) in CONFIGS.items():
    if only and only != name:
      continue
    try:
      p50, comp, t = measure(task, ns)
      print(f'{name:16s} {ns}x{t}: p50 {p50:8.1f} ms  (compile {comp:.0f}s)',
            flush=True)
    except Exception as e:  # keep sweeping
      print(f'{name:16s} FAILED: {type(e).__name__}: {e}', flush=True)


if __name__ == '__main__':
  main()
