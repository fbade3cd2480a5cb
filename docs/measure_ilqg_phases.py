"""Per-phase iLQG timing on TPU (reference hot loops: ilqg/planner.cc
nominal/model-deriv/cost-deriv/backward-pass/rollouts timers, :392-614).

Times each phase of one optimize() — nominal rollout, derivative stack
(jacfwd dynamics + GN cost expansion), Riccati backward pass, batched
linesearch — both blocking (includes the ~25 ms tunnel sync floor, see
docs/PERF.md) and pipelined (8 submissions, one sync — the
steady-state-relevant number). Usage:

  python docs/measure_ilqg_phases.py [Swimmer|Particle]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
from mujoco_mpc_tpu.utils import cache as _mcache  # noqa: E402
_mcache.enable()

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import derivatives, ilqg, registry as preg
from mujoco_mpc_tpu.tasks import registry


def timeit(name, fn, *args):
  f = jax.jit(fn)
  r = f(*args)
  jax.block_until_ready(r)
  lat = []
  for _ in range(6):
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    lat.append(time.perf_counter() - t0)
  lat.sort()
  t0 = time.perf_counter()
  rs = [f(*args) for _ in range(8)]
  jax.block_until_ready(rs)
  piped = (time.perf_counter() - t0) / 8
  print(f'{name:16s} blocking p50 {lat[3]*1e3:7.1f} ms | '
        f'pipelined {piped*1e3:7.1f} ms')
  return r


def main():
  task = sys.argv[1] if len(sys.argv) > 1 else 'Swimmer'
  spec = registry.get_task(task)
  t_steps = agent_mod.horizon_steps(spec)
  m = spec.model
  d0 = make_data(m)
  params = spec.default_params
  cfg = ilqg.default_config(spec)
  state = ilqg.default_state(spec, t_steps)
  dtype = d0.qpos.dtype
  print(f'{task}: T {t_steps} nv {m.nv} nu {m.nu} nq {m.nq}')

  roll = timeit('nominal_rollout', lambda: ilqg._feedback_rollout(
      spec, d0, state.policy, jnp.zeros((), dtype), params, t_steps, True))
  prev_ret, actions, qpos, qvel, act, times, residuals, costs = roll
  traj = derivatives.Trajectory(qpos=qpos, qvel=qvel, act=act, time=times,
                                actions=actions, residuals=residuals,
                                costs=costs)
  derivs = timeit('derivatives',
                  lambda: derivatives.compute(spec, d0, traj, params))
  timeit('transition_derivs',
         lambda: derivatives.transition_derivs(spec, d0, traj))
  timeit('cost_derivs',
         lambda: derivatives.cost_derivs(spec, d0, traj, params))
  timeit('riccati', lambda: ilqg.riccati(
      derivs, state.regularization, traj.actions, m.actuator_ctrlrange,
      cfg.regularization_type, True))
  steps8 = jnp.linspace(1.0, 0.0, 8, dtype=dtype)
  timeit('linesearch8', lambda: jax.vmap(lambda s: ilqg._feedback_rollout(
      spec, d0, state.policy, s, params, t_steps)[0])(steps8))

  pdef = preg.make_planner(spec, preg.ILQG, 8, t_steps, 10)
  st = pdef.init()
  timeit('full_optimize', lambda: pdef.optimize(
      st, d0, params, jax.random.key(0)))


if __name__ == '__main__':
  main()
