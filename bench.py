"""Benchmark: predictive-sampling plan iterations per second on TPU.

Headline metric (BASELINE.json north star): planner plan-iterations/s/chip
with 8192 sampled rollouts on the Cartpole task at horizon 1 s (101 steps),
plus p50 plan latency. The baseline is the same rollout workload executed by
the MuJoCo C engine (the reference's physics backend) with a multithreaded
CPU rollout on this machine — the reference's ThreadPool-parallel rollout
fan-out (mjpc/planners/sampling/planner.cc:342-380) measured at equal
sample count and horizon. Prints ONE JSON line.
"""

import json
import os
import time

# persistent compile cache: the six configs cost minutes of XLA compile
# each; cache hits make driver re-runs measure steady-state, not compile
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.jax_cache'))

NUM_SAMPLES = 8192
SPLINE_POINTS = 10
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              '.bench_baseline.json')


def measure_tpu_plans_per_s():
  import jax
  import jax.numpy as jnp

  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.ops import spline
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task('Cartpole')
  t_steps = agent_mod.horizon_steps(spec)
  d0 = make_data(spec.model)
  d0 = d0.replace(qpos=jnp.asarray([1.0, 3.14159], dtype=d0.qpos.dtype))
  policy = sampling.default_policy(spec, SPLINE_POINTS)
  cfg = sampling.default_config(spec)
  params = spec.default_params

  @jax.jit
  def plan(pol, key):
    new_pol, info = sampling.optimize(
        spec, pol, d0, params, cfg, key, num_samples=NUM_SAMPLES,
        horizon_steps=t_steps, interp=int(spline.Interp.ZERO))
    return new_pol, info['best_return']

  key = jax.random.key(0)
  # warmup / compile; if the fused Newton kernel fails to compile on
  # this chip generation, retry once on the XLA solver path (the env
  # knob is read at trace time and plan retraces after cache clear)
  try:
    pol, best = plan(policy, key)
    jax.block_until_ready((pol, best))
  except Exception:
    os.environ['MJPC_TPU_FUSED_NEWTON'] = '0'
    jax.clear_caches()
    pol, best = plan(policy, key)
    jax.block_until_ready((pol, best))

  lat = []
  reps = 20
  for i in range(reps):
    key, k = jax.random.split(key)
    t0 = time.perf_counter()
    pol, best = plan(pol, k)
    jax.block_until_ready((pol, best))
    lat.append(time.perf_counter() - t0)
  lat.sort()
  p50 = lat[len(lat) // 2]
  return 1.0 / p50, p50 * 1e3, t_steps


def measure_cpu_baseline(t_steps: int) -> float:
  """MuJoCo C multithreaded rollouts: plans/s for the same workload."""
  if os.path.exists(BASELINE_CACHE):
    with open(BASELINE_CACHE) as f:
      return json.load(f)['plans_per_s']

  import mujoco
  from mujoco import rollout
  import numpy as np

  path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'mujoco_mpc_tpu', 'models', 'cartpole.xml')
  mjm = mujoco.MjModel.from_xml_path(path)
  nthread = os.cpu_count() or 1
  datas = [mujoco.MjData(mjm) for _ in range(nthread)]

  d0 = mujoco.MjData(mjm)
  d0.qpos[:] = [1.0, 3.14159]
  mujoco.mj_forward(mjm, d0)
  state0 = np.zeros(mujoco.mj_stateSize(mjm,
                                        mujoco.mjtState.mjSTATE_FULLPHYSICS))
  mujoco.mj_getState(mjm, d0, state0, mujoco.mjtState.mjSTATE_FULLPHYSICS)
  initial_state = np.tile(state0, (NUM_SAMPLES, 1))
  rng = np.random.default_rng(0)
  control = np.clip(rng.standard_normal(
      (NUM_SAMPLES, t_steps, mjm.nu)), -1, 1)

  # warmup
  rollout.rollout(mjm, datas, initial_state[:64], control[:64])
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    rollout.rollout(mjm, datas, initial_state, control)
    best = min(best, time.perf_counter() - t0)
  plans_per_s = 1.0 / best
  with open(BASELINE_CACHE, 'w') as f:
    json.dump({'plans_per_s': plans_per_s, 'nthread': nthread}, f)
  return plans_per_s


def _ref_baseline_ms(task_name: str, num_samples: int, t_steps: int,
                     extra_steps: int = 0) -> dict:
  """Reference-side wall time for one plan iteration, measured on this box.

  The reference's C++ `testspeed` binary (mjpc/testspeed.cc:44-129) cannot
  be built here: its CMake superbuild fetches abseil/gtest/MuJoCo sources
  from the network and this box has zero egress and no installed abseil.
  What CAN be measured — and is the dominant cost of a reference plan
  iteration — is its rollout fan-out (sampling/planner.cc:342-380):
  num_samples rollouts of t_steps mj_step calls on the IDENTICAL model,
  executed by the MuJoCo C engine (the reference's physics backend)
  through the native threaded `rollout` module with one mjData per
  hardware thread, exactly the reference ThreadPool's per-thread-mjData
  pattern (threadpool.h:68). `extra_steps` adds the derivative-planner
  step count (FD Jacobian passes, model_derivatives.cc:76-105) expressed
  as additional rollouts of the same horizon.
  """
  import mujoco
  from mujoco import rollout as mj_rollout
  import numpy as np
  from mujoco_mpc_tpu.tasks import registry as task_registry

  spec = task_registry.get_task(task_name)
  mjm = spec.mj_model
  nthread = os.cpu_count() or 1
  datas = [mujoco.MjData(mjm) for _ in range(nthread)]
  d0 = mujoco.MjData(mjm)
  key_names = list(getattr(spec.model, 'keyframe_names', ()) or ())
  if 'home' in key_names:
    d0.qpos[:] = np.asarray(spec.model.key_qpos[key_names.index('home')])
  mujoco.mj_forward(mjm, d0)
  state0 = np.zeros(mujoco.mj_stateSize(mjm,
                                        mujoco.mjtState.mjSTATE_FULLPHYSICS))
  mujoco.mj_getState(mjm, d0, state0, mujoco.mjtState.mjSTATE_FULLPHYSICS)
  nroll = num_samples + extra_steps
  rng = np.random.default_rng(0)
  lo, hi = mjm.actuator_ctrlrange[:, 0], mjm.actuator_ctrlrange[:, 1]
  limited = mjm.actuator_ctrllimited.astype(bool)
  lo = np.where(limited, lo, -1.0)
  hi = np.where(limited, hi, 1.0)

  def _controls(n):
    u = rng.standard_normal((n, t_steps, mjm.nu))
    return np.clip(u, lo[None, None], hi[None, None])

  initial_state = np.tile(state0, (min(nroll, 64), 1))
  mj_rollout.rollout(mjm, datas, initial_state, _controls(len(initial_state)))
  # chunk to bound memory on big sample counts; time the full fan-out
  best = float('inf')
  reps = 2 if nroll * t_steps < 500_000 else 1
  for _ in range(reps):
    t0 = time.perf_counter()
    done = 0
    while done < nroll:
      chunk = min(2048, nroll - done)
      mj_rollout.rollout(mjm, datas, np.tile(state0, (chunk, 1)),
                         _controls(chunk))
      done += chunk
    best = min(best, time.perf_counter() - t0)
  return {'ms': round(best * 1e3, 1), 'nthread': nthread,
          'model_sig': [int(mjm.nq), int(mjm.nv), int(mjm.ngeom)],
          'samples': num_samples, 'steps': t_steps,
          'extra_steps': extra_steps}


def reference_baselines(configs) -> dict:
  """Measured-on-this-box reference numbers for every BASELINE config,
  cached in .bench_baseline.json under 'configs' (invalidated when the
  task model changes shape)."""
  cache = {}
  if os.path.exists(BASELINE_CACHE):
    with open(BASELINE_CACHE) as f:
      cache = json.load(f)
  cfgs = cache.setdefault('configs', {})
  from mujoco_mpc_tpu.tasks import registry as task_registry
  changed = False
  for key, (task_name, num_samples, t_steps, extra) in configs.items():
    sig = None
    try:
      mjm = task_registry.get_task(task_name).mj_model
      sig = [int(mjm.nq), int(mjm.nv), int(mjm.ngeom)]
    except Exception:
      pass
    entry = cfgs.get(key)
    if entry is None or entry.get('model_sig') != sig \
       or entry.get('samples') != num_samples:
      try:
        cfgs[key] = _ref_baseline_ms(task_name, num_samples, t_steps, extra)
        changed = True
      except Exception as e:
        cfgs[key] = {'error': str(e)[:200]}
        changed = True
  if changed:
    with open(BASELINE_CACHE, 'w') as f:
      json.dump(cache, f)
  return cfgs


def measure_extra_configs():
  """p50 plan latency for the other BASELINE.md configs (ms)."""
  import time as _time
  import jax
  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.ops import spline
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import registry

  out = {}
  for task, ns, key in [('Quadruped Flat', 4096, 'quadruped_ps4096_p50_ms'),
                        ('Humanoid Track', 512, 'humanoid_track_ps512_p50_ms'),
                        ('Shadow Reorient', 8192, 'shadow_ps8192_p50_ms'),
                        ('Cube Solving', 512, 'rubik_ps512_p50_ms')]:
    def run_once(task=task, ns=ns):
      spec = registry.get_task(task)
      m = spec.model
      t_steps = agent_mod.horizon_steps(spec)
      d0 = make_data(m)
      if 'home' in m.keyframe_names:
        d0 = d0.replace(qpos=m.key_qpos[m.keyframe_names.index('home')])
      policy = sampling.default_policy(spec, SPLINE_POINTS)
      cfg = sampling.default_config(spec)
      params = spec.default_params

      @jax.jit
      def plan(pol, k, spec=spec, cfg=cfg, params=params, d0=d0, ns=ns,
               t_steps=t_steps):
        p, info = sampling.optimize(spec, pol, d0, params, cfg, k, ns,
                                    t_steps, int(spline.Interp.ZERO))
        return p, info['best_return']

      k = jax.random.key(0)
      r = plan(policy, k)
      jax.block_until_ready(r)
      lat = []
      for _ in range(8):
        t0 = _time.perf_counter()
        r = plan(policy, k)
        jax.block_until_ready(r)
        lat.append(_time.perf_counter() - t0)
      lat.sort()
      # steady-state MPC: chained plans (policy_{k+1} = plan(policy_k)),
      # one sync at the end — the Agent's continuous plan loop. Blocking
      # p50 additionally carries the ~25 ms tunnel sync floor
      # (docs/PERF.md round-4 measurement)
      t0 = _time.perf_counter()
      p = policy
      for _ in range(8):
        p, _ = plan(p, k)
      jax.block_until_ready(p)
      steady = (_time.perf_counter() - t0) / 8
      return round(lat[len(lat) // 2] * 1e3, 1), round(steady * 1e3, 1)

    # degrade loudly: retry each config on the XLA solver path before
    # giving up, and never emit a bare -1.0 without the error string
    # (round-2 lesson: silent -1.0 hid a Mosaic compile failure)
    skey = key.replace('_p50_ms', '_steady_ms')
    try:
      out[key], out[skey] = run_once()
    except Exception as e_fused:
      os.environ['MJPC_TPU_FUSED_NEWTON'] = '0'
      jax.clear_caches()
      try:
        out[key], out[skey] = run_once()
        out[key + '_note'] = ('fused kernel failed, XLA path used: '
                              + str(e_fused)[:160])
      except Exception as e_xla:
        out[key] = -1.0
        out[key + '_error'] = str(e_xla)[:200]
      finally:
        os.environ.pop('MJPC_TPU_FUSED_NEWTON', None)
        jax.clear_caches()

  # BASELINE config #2: derivative-based backward pass (iLQG) on
  # Particle + Swimmer (reference: testspeed with planner_id=2)
  from mujoco_mpc_tpu.planners import registry as planners
  for task, key in [('Particle', 'particle_ilqg_p50_ms'),
                    ('Swimmer', 'swimmer_ilqg_p50_ms')]:
    try:
      spec = registry.get_task(task)
      t_steps = agent_mod.horizon_steps(spec)
      d0 = make_data(spec.model)
      pdef = planners.make_planner(spec, planners.ILQG, 8, t_steps, 10)
      state = pdef.init()
      params = spec.default_params
      opt = jax.jit(lambda s, k: pdef.optimize(s, d0, params, k))
      k = jax.random.key(0)
      r = opt(state, k)
      jax.block_until_ready(r)
      lat = []
      for _ in range(8):
        t0 = _time.perf_counter()
        r = opt(state, k)
        jax.block_until_ready(r)
        lat.append(_time.perf_counter() - t0)
      lat.sort()
      out[key] = round(lat[len(lat) // 2] * 1e3, 1)
      t0 = _time.perf_counter()
      s = state
      for _ in range(8):
        s, _ = opt(s, k)
      jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
      out[key.replace('_p50_ms', '_steady_ms')] = round(
          (_time.perf_counter() - t0) / 8 * 1e3, 1)
    except Exception as e:
      out[key] = -1.0
      out[key + '_error'] = str(e)[:200]
  return out


def main():
  plans_per_s, p50_ms, t_steps = measure_tpu_plans_per_s()
  try:
    baseline = measure_cpu_baseline(t_steps)
    vs = plans_per_s / baseline
  except Exception:
    vs = -1.0
  try:
    extra = measure_extra_configs()
  except Exception:
    extra = {}

  # reference-side numbers measured on this box (BASELINE.md): same
  # model + sample count + horizon through the MuJoCo C engine
  try:
    from mujoco_mpc_tpu import agent as agent_mod
    from mujoco_mpc_tpu.tasks import registry as task_registry

    def _steps(task):
      return agent_mod.horizon_steps(task_registry.get_task(task))

    def _ilqg_extra(task):
      m = task_registry.get_task(task).model
      return 2 * (2 * int(m.nv) + int(m.nu)) + 11

    ref = reference_baselines({
        'quadruped_ps4096': ('Quadruped Flat', 4096,
                             _steps('Quadruped Flat'), 0),
        'humanoid_track_ps512': ('Humanoid Track', 512,
                                 _steps('Humanoid Track'), 0),
        'shadow_ps8192': ('Shadow Reorient', 8192,
                          _steps('Shadow Reorient'), 0),
        'rubik_ps512': ('Cube Solving', 512, _steps('Cube Solving'), 0),
        'particle_ilqg': ('Particle', 0, _steps('Particle'),
                          _ilqg_extra('Particle')),
        'swimmer_ilqg': ('Swimmer', 0, _steps('Swimmer'),
                         _ilqg_extra('Swimmer')),
    })
    for key, entry in ref.items():
      ms = entry.get('ms')
      ours = extra.get(key + '_p50_ms')
      if ms and ours and ours > 0:
        extra[key + '_ref_cpu_ms'] = ms
        extra[key + '_vs_ref'] = round(ms / ours, 2)
  except Exception as e:
    extra['ref_baseline_error'] = str(e)[:200]

  print(json.dumps({
      'metric': 'cartpole_ps8192_plan_iterations_per_s',
      'value': round(plans_per_s, 3),
      'unit': f'plans/s (8192 rollouts x {t_steps} steps; p50 '
              f'{round(p50_ms, 2)} ms)',
      'vs_baseline': round(vs, 3),
      **extra,
  }))


if __name__ == '__main__':
  main()
