"""Per-op TPU profile of one plan iteration for a BASELINE config.

Captures a jax.profiler trace of a steady-state jitted plan call, parses
the XPlane proto with jax.profiler.ProfileData, and prints the top ops
by device self-time — the hlo_stats-style table that drove the round-2
layout work (docs/PERF.md). Usage:

  python docs/profile_config.py quadruped [top_n]

Configs mirror docs/measure_tpu.py. The reference's equivalent
measurement is the per-phase steady_clock timer set
(mjpc/planners/sampling/planner.cc:162-184).
"""

import collections
import glob
import os
import sys
import tempfile
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
    # xrt_*: the synchronous plan-act loop bench.measure_xrealtime runs
    # (one jit: transition -> state sync -> plan -> 4 sim steps, x10) —
    # profiles the batch-1 sim-step cost that xrealtime exposes
    'xrt_quadruped': ('Quadruped Flat', 4096),
    'xrt_cartpole': ('Cartpole', 8192),
}


def build_xrt(task, ns, nplans=10, steps_per_plan=4):
  import jax
  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task(task)
  m = spec.model
  dtype = m.qpos0.dtype
  sim0 = make_data(m, dtype=dtype)
  if 'home' in m.keyframe_names:
    sim0 = sim0.replace(
        qpos=m.key_qpos[m.keyframe_names.index('home')].astype(dtype))
  total = nplans * steps_per_plan

  @jax.jit
  def run(k):
    carry, costs = agent_mod.synchronous_mpc(
        spec, ns, total, steps_per_plan, k, sim0=sim0)
    return costs

  return run, jax.random.key(0)


def build_plan(task, ns):
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

  return plan, policy


def profile_op_table(plan, policy, reps=3):
  """Trace `reps` steady-state calls; return [(op_name, total_ms)]."""
  import jax
  key = jax.random.key(0)
  r = plan(policy, key)
  jax.block_until_ready(r)

  logdir = tempfile.mkdtemp(prefix='xprof_')
  jax.profiler.start_trace(logdir)
  for _ in range(reps):
    r = plan(policy, key)
  jax.block_until_ready(r)
  jax.profiler.stop_trace()

  paths = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                    recursive=True)
  if not paths:
    raise RuntimeError(f'no xplane.pb under {logdir}')
  pd = jax.profiler.ProfileData.from_file(paths[0])
  per_op = collections.defaultdict(float)
  counts = collections.defaultdict(int)
  ncalls = 0
  for plane in pd.planes:
    if 'TPU' not in plane.name and 'Device' not in plane.name:
      continue
    for line in plane.lines:
      # xla-op-level lines carry per-op events; thread lines carry steps
      for ev in line.events:
        dur = ev.duration_ns / 1e6
        name = ev.name
        per_op[name] += dur
        counts[name] += 1
        if name.startswith('jit_'):
          ncalls += 1
  # per-call divisor: the number of module-envelope executions actually
  # captured (the trace can miss dispatched-but-started-early calls, so
  # `reps` over-divides — round-5 lesson: a shadow trace held ONE of 3
  # calls and everything read 3x too fast)
  ncalls = max(ncalls, 1)
  envelope = max((t for n, t in per_op.items() if n.startswith('jit_')),
                 default=0.0)
  return (sorted(per_op.items(), key=lambda kv: -kv[1]), counts, ncalls,
          envelope / ncalls)


def categorize(name: str) -> str:
  n = name.lstrip('%')
  for pref in ('copy-start', 'copy-done', 'copy', 'newton_batched',
               'solve_spd', 'dynamic-update-slice', 'dynamic-slice',
               'slice-start', 'slice-done', 'while', 'jit_', 'convert',
               'transpose', 'bitcast', 'broadcast', 'reduce', 'select',
               'scatter', 'gather', 'pad', 'concatenate', 'iota', 'sort',
               'rng', 'dot', 'convolution', 'all-reduce', 'custom-call'):
    if n.startswith(pref):
      return pref
  if 'fusion' in n.split(' = ')[0]:
    kind = n.split(' = ')[0].split('.')[0]
    return kind
  return n.split(' = ')[0].split('.')[0]


def main():
  cfg = sys.argv[1] if len(sys.argv) > 1 else 'quadruped'
  top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
  task, ns = CONFIGS[cfg]
  if cfg.startswith('xrt_'):
    plan, policy = build_xrt(task, ns)
    plan = (lambda p, k, _run=plan: _run(k))  # adapt to (pol, key) calls
  else:
    plan, policy = build_plan(task, ns)
  table, counts, ncalls, env_ms = profile_op_table(plan, policy)
  print(f'== {cfg}: {task} x {ns} samples; module envelope '
        f'~{env_ms:.1f} ms/call ({ncalls} captured calls) ==')
  # category rollup (excluding envelope lines: jit_/while; async-start
  # durations include dependency waits, so flag them)
  cats = collections.defaultdict(float)
  for name, ms in table:
    c = categorize(name)
    if c in ('jit_', 'while'):
      continue
    cats[c] += ms / ncalls
  print('-- categories (ms/call; *-start overlap other compute) --')
  for c, ms in sorted(cats.items(), key=lambda kv: -kv[1])[:18]:
    print(f'{ms:9.3f} ms  {c}')
  print('-- top ops (ms/call, xN = events/call) --')
  cum = 0.0
  grand = sum(ms for _, ms in table) or 1.0
  for name, ms in table[:top_n]:
    cum += ms
    print(f'{ms/ncalls:9.3f} ms x{counts[name]//ncalls:<4d} '
          f'{100.0*ms/grand:5.1f}%  (cum {100.0*cum/grand:5.1f}%)  '
          f'{name[:105]}')


if __name__ == '__main__':
  main()
