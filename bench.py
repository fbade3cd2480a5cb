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
# each; cache hits make driver re-runs measure steady-state, not compile.
# NOTE: jax's allowlist rejects the axon platform, so plain
# JAX_COMPILATION_CACHE_DIR silently does nothing — utils/cache.py
# force-enables it (round-5 finding: every compile of every round was
# a cache miss).
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mujoco_mpc_tpu.utils import cache as _mcache
_mcache.enable()

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
  # steady state: chained plans (policy_{k+1} = plan(policy_k)), one sync
  # at the end — the Agent's continuous plan loop; the blocking p50 above
  # additionally carries the ~25 ms tunnel sync floor (docs/PERF.md)
  t0 = time.perf_counter()
  p = pol
  for _ in range(16):
    p, _ = plan(p, key)
  jax.block_until_ready(p)
  steady_ms = (time.perf_counter() - t0) / 16 * 1e3
  return 1.0 / p50, p50 * 1e3, steady_ms, t_steps


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
      # force a device->host read: an execution error the experimental
      # tunnel fails to propagate through block_until_ready surfaces on
      # the copy, and a non-finite best_return means the measurement
      # below would time a poisoned program (round-5: rubik reported a
      # 0.1 ms 'plan')
      import numpy as _np
      best0 = float(_np.asarray(r[1]))
      if not _np.isfinite(best0):
        raise RuntimeError(f'non-finite best_return {best0}')
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
      return (round(lat[len(lat) // 2] * 1e3, 1),
              round(steady * 1e3, 1), round(best0, 4))

    # degrade loudly: retry each config on the XLA solver path before
    # giving up, and never emit a bare -1.0 without the error string
    # (round-2 lesson: silent -1.0 hid a Mosaic compile failure)
    skey = key.replace('_p50_ms', '_steady_ms')
    bkey = key.replace('_p50_ms', '_best_return')
    try:
      out[key], out[skey], out[bkey] = run_once()
    except Exception as e_fused:
      os.environ['MJPC_TPU_FUSED_NEWTON'] = '0'
      jax.clear_caches()
      try:
        out[key], out[skey], out[bkey] = run_once()
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


def measure_xrealtime():
  """Synchronous plan-act loop x-realtime (reference testspeed.cc:96-123).

  Runs the fully jitted plan-and-step scan (agent.synchronous_mpc: task
  Transition -> state sync -> plan -> steps_per_plan sim steps, exactly
  the reference's synchronous loop shape) and reports sim_time/wall plus
  average cost per step for the three PS BASELINE configs.

  Sample counts follow the reference's canonical metric: testspeed runs
  the TASK'S OWN configured planner (agent setup from the task XML,
  testspeed.cc:59-87 — quadruped: 60 rollouts, task_flat.xml:13), not
  the BASELINE north-star fan-out counts, so the plan each group pays
  for is the task-configured one, floored to the fused Newton kernel's
  128-lane tile (extra lanes are free on TPU; the planner simply sees
  more samples). The *_samples key records the count used."""
  import jax
  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.tasks import registry

  out = {}
  steps_per_plan = 4            # reference testspeed_app.cc:23-28 default
  nplans = 25
  for task, key in [('Cartpole', 'cartpole'),
                    ('Quadruped Flat', 'quadruped'),
                    ('Humanoid Track', 'humanoid_track')]:
    try:
      spec = registry.get_task(task)
      ns = max(int(spec.config.get('sampling_trajectories', 128)), 128)
      out[key + '_xrealtime_samples'] = ns
      m = spec.model
      dtype = m.qpos0.dtype
      sim0 = make_data(m, dtype=dtype)
      if 'home' in m.keyframe_names:
        sim0 = sim0.replace(
            qpos=m.key_qpos[m.keyframe_names.index('home')].astype(dtype))
      total_steps = nplans * steps_per_plan

      run = jax.jit(lambda k, spec=spec, ns=ns, sim0=sim0,
                    total_steps=total_steps: agent_mod.synchronous_mpc(
                        spec, ns, total_steps, steps_per_plan, k,
                        sim0=sim0))
      carry, costs = run(jax.random.key(0))      # warmup/compile
      jax.block_until_ready(costs)
      t0 = time.perf_counter()
      carry, costs = run(jax.random.key(1))
      jax.block_until_ready(costs)
      wall = time.perf_counter() - t0
      sim_time = total_steps * float(spec.mj_model.opt.timestep)
      out[key + '_xrealtime'] = round(sim_time / wall, 3)
      out[key + '_avg_cost'] = round(float(costs.mean()), 4)
    except Exception as e:
      out[key + '_xrealtime_error'] = str(e)[:160]
  return out


def fused_newton_golden():
  """On-hardware golden check of the fused Pallas Newton kernel.

  The production contact solve dispatches ops/pallas_newton.py's fused
  whole-iteration kernel for batched f32 planning; its interpret-mode
  equivalence is pinned in tests/test_pallas_newton.py but hardware
  numerics (f32 reduction order on the real Mosaic lowering) were
  previously accepted on one A/B note (docs/PERF.md round 4). This check
  runs a real contact config (Quadruped Flat, batch 256) through BOTH
  paths on the chip: (a) a 5-step batched rollout comparing qpos drift,
  (b) one 256-sample plan comparing best_return. Fails loudly in the
  bench JSON on regression. Reference bar: the C solver is always
  trusted by rollouts (mjpc/trajectory.cc:158).
  """
  import jax
  import jax.numpy as jnp
  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.ops import spline
  from mujoco_mpc_tpu.physics import forward as fwd
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.planners import sampling
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task('Quadruped Flat')
  m = spec.model
  d0 = make_data(m)
  if 'home' in m.keyframe_names:
    d0 = d0.replace(qpos=m.key_qpos[m.keyframe_names.index('home')])
  t_steps = agent_mod.horizon_steps(spec)
  batch = 256

  def run_both(fn, *args):
    """Evaluate fn on the fused path, then on the XLA path."""
    jax.clear_caches()
    os.environ.pop('MJPC_TPU_FUSED_NEWTON', None)
    fused = jax.jit(fn)(*args)
    jax.block_until_ready(fused)
    os.environ['MJPC_TPU_FUSED_NEWTON'] = '0'
    jax.clear_caches()
    ref = jax.jit(fn)(*args)
    jax.block_until_ready(ref)
    os.environ.pop('MJPC_TPU_FUSED_NEWTON', None)
    return fused, ref

  # (a) 5-step batched rollout: qpos drift between solver paths
  key = jax.random.key(3)
  ctrl = 0.2 * jax.random.normal(key, (batch, 5, m.nu), dtype=jnp.float32)

  def rollout5(ctrl):
    def step(d, u):
      d = fwd.step(m, d.replace(ctrl=u))
      return d, None
    def one(us):
      d, _ = jax.lax.scan(step, d0, us)
      return d.qpos
    return jax.vmap(one)(ctrl)

  qpos_f, qpos_r = run_both(rollout5, ctrl)
  drift = float(jnp.max(jnp.abs(qpos_f - qpos_r)))

  # (b) one plan: best_return agreement
  policy = sampling.default_policy(spec, SPLINE_POINTS)
  cfg = sampling.default_config(spec)

  def plan(pol, k):
    _, info = sampling.optimize(spec, pol, d0, spec.default_params, cfg, k,
                                batch, t_steps, int(spline.Interp.ZERO))
    return info['best_return'], info['winner']

  (br_f, win_f), (br_r, win_r) = run_both(plan, policy, jax.random.key(7))
  br_f, br_r = float(br_f), float(br_r)
  rel = abs(br_f - br_r) / max(abs(br_r), 1e-9)
  ok = bool(drift <= 0.05 and rel <= 0.02)
  return {
      'fused_newton_golden_ok': ok,
      'fused_newton_qpos_drift': round(drift, 5),
      'fused_newton_best_return_rel_err': round(rel, 5),
      'fused_newton_winner_match': bool(int(win_f) == int(win_r)),
  }


def main():
  plans_per_s, p50_ms, steady_ms, t_steps = measure_tpu_plans_per_s()
  try:
    baseline = measure_cpu_baseline(t_steps)
    vs = plans_per_s / baseline
  except Exception:
    vs = -1.0
  try:
    extra = measure_extra_configs()
  except Exception:
    extra = {}
  extra['cartpole_steady_ms'] = round(steady_ms, 1)
  try:
    extra.update(measure_xrealtime())
  except Exception as e:
    extra['xrealtime_error'] = str(e)[:160]
  # LAST: the golden check flips the solver-path env knob and clears jit
  # caches; running it after all latency measurements keeps them warm
  try:
    extra.update(fused_newton_golden())
  except Exception as e:
    extra['fused_newton_golden_ok'] = False
    extra['fused_newton_golden_error'] = str(e)[:200]

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
