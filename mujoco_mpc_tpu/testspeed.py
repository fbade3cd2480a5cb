"""Headless synchronous planning benchmark (the reference testspeed binary).

Mirrors /root/reference/mjpc/testspeed.{h,cc}: a synchronous plan-act loop —
Transition -> SetState -> plan every steps_per_planning_iteration ->
ActionFromPolicy -> step — reporting total wall time, x-realtime factor and
average cost per step. Usage:

  python -m mujoco_mpc_tpu.testspeed --task Cartpole --planner 0 \
      --total_time 10.0 --steps_per_planning_iteration 4 --num_samples 128
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def synchronous_planning_cost(task_name: str, planner_id: int,
                              total_time: float,
                              steps_per_planning_iteration: int,
                              num_samples: int, seed: int = 0,
                              verbose: bool = True):
  """Reference SynchronousPlanningCost (testspeed.cc:44-129)."""
  import jax.numpy as jnp

  from mujoco_mpc_tpu import agent as agent_mod
  from mujoco_mpc_tpu.physics import forward as fwd
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task(task_name)
  agent = agent_mod.Agent(spec, num_samples=num_samples, seed=seed,
                          planner_id=planner_id)
  m = spec.model
  timestep = float(np.asarray(m.opt.timestep))
  total_steps = int(total_time / timestep)

  # warmup compile (excluded from timing, like the reference's first plan)
  agent.plan_iteration()
  agent.action()

  costs = []
  t_start = time.perf_counter()
  for i in range(total_steps):
    agent.transition()
    if i % steps_per_planning_iteration == 0:
      agent.plan_iteration()
    agent.step()
    costs.append(float(agent.cost_terms().sum()))
  jax.block_until_ready(agent.sim_data.qpos)
  wall = time.perf_counter() - t_start

  sim_time = total_steps * timestep
  result = {
      'task': task_name,
      'planner': planner_id,
      'total_steps': total_steps,
      'wall_time_s': wall,
      'x_realtime': sim_time / wall,
      'avg_cost': float(np.mean(costs)),
  }
  if verbose:
    print(f'task: {task_name}  planner: {planner_id}')
    print(f'  total wall time: {wall:.3f} s over {sim_time:.2f} s sim '
          f'({result["x_realtime"]:.2f}x realtime)')
    print(f'  average cost/step: {result["avg_cost"]:.5f}')
  return result


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--task', default='Cartpole')
  p.add_argument('--planner', type=int, default=0)
  p.add_argument('--total_time', type=float, default=10.0)
  p.add_argument('--steps_per_planning_iteration', type=int, default=4)
  p.add_argument('--num_samples', type=int, default=128)
  p.add_argument('--json', action='store_true')
  args = p.parse_args()
  result = synchronous_planning_cost(
      args.task, args.planner, args.total_time,
      args.steps_per_planning_iteration, args.num_samples,
      verbose=not args.json)
  if args.json:
    print(json.dumps(result))


if __name__ == '__main__':
  main()
