"""Kernel ablation sweep on the real chip (run when the tunnel is up).

Times one predictive-sampling plan iteration under each kernel
configuration so the fused-Newton / fused-rollout / sublane levers can
be compared head-to-head:

  python docs/measure_kernels.py quadruped   # fused newton x sublanes
  python docs/measure_kernels.py cartpole    # fused rollout x sublanes
  python docs/measure_kernels.py             # both

Each configuration runs in-process but with a fresh jit wrapper; the
kernel env knobs are read at trace time, so they are set BEFORE the
wrapper is built. Per tpu-perf-playbook only whole-program numbers are
trustworthy through the axon tunnel (~30 ms per dispatch).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

_KNOBS = ('MJPC_TPU_FUSED_NEWTON', 'MJPC_TPU_NEWTON_SUBLANES',
          'MJPC_TPU_FUSED_ROLLOUT', 'MJPC_TPU_ROLLOUT_SUBLANES')


def _set(env):
  for k in _KNOBS:
    os.environ.pop(k, None)
  os.environ.update(env)


def measure(task, ns, reps=10):
  import jax
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
  return lat[len(lat) // 2] * 1e3, compile_s


CASES = {
    'quadruped': [
        ('xla newton        ', {'MJPC_TPU_FUSED_NEWTON': '0'}),
        ('fused lane  (S=0) ', {'MJPC_TPU_NEWTON_SUBLANES': '0'}),
        ('fused tile  (S=8) ', {'MJPC_TPU_NEWTON_SUBLANES': '8'}),
        ('fused auto        ', {}),
    ],
    'cartpole': [
        ('scan rollout      ', {}),
        ('fused lane  (S=0) ', {'MJPC_TPU_FUSED_ROLLOUT': '1',
                                'MJPC_TPU_ROLLOUT_SUBLANES': '0'}),
        ('fused tile  (S=8) ', {'MJPC_TPU_FUSED_ROLLOUT': '1',
                                'MJPC_TPU_ROLLOUT_SUBLANES': '8'}),
    ],
    'shadow': [
        ('xla newton        ', {'MJPC_TPU_FUSED_NEWTON': '0'}),
        ('fused auto        ', {}),
    ],
}
CONFIG = {'quadruped': ('Quadruped Flat', 4096),
          'cartpole': ('Cartpole', 8192),
          'shadow': ('Shadow Reorient', 8192)}


def main():
  only = sys.argv[1] if len(sys.argv) > 1 else None
  for name, cases in CASES.items():
    if only and only != name:
      continue
    task, ns = CONFIG[name]
    print(f'== {name}: {task} x {ns} ==', flush=True)
    for label, env in cases:
      _set(env)
      try:
        p50, comp = measure(task, ns)
        print(f'  {label} p50 {p50:8.1f} ms  (compile {comp:.0f}s)',
              flush=True)
      except Exception as e:  # keep sweeping (e.g. Mosaic compile fail)
        print(f'  {label} FAILED: {type(e).__name__}: {e}', flush=True)
    _set({})


if __name__ == '__main__':
  main()
