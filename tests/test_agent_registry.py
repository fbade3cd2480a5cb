"""Agent + planner-registry integration: every planner id plans and acts on
cartpole (reference: test/agent/agent_test.cc plans with each planner)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.planners import registry as planner_registry
from mujoco_mpc_tpu.tasks import registry


@pytest.mark.parametrize('planner_id', range(7))
def test_agent_all_planners(planner_id):
  spec = registry.get_task('Cartpole')
  ag = agent_mod.Agent(spec, num_samples=8, planner_id=planner_id)
  ag.set_state(qpos=np.asarray([0.5, 3.0]), qvel=np.zeros(2))
  info = ag.plan_iteration()
  assert np.isfinite(float(info['best_return'])), planner_id
  u = ag.action()
  assert u.shape == (1,)
  assert np.isfinite(float(u[0]))
  assert abs(float(u[0])) <= 1.0 + 1e-5
  ag.step()
  # second iteration reuses carried state
  info = ag.plan_iteration()
  assert np.isfinite(float(info['best_return']))


def test_planner_names():
  assert len(planner_registry.PLANNER_NAMES) == 7
  assert planner_registry.PLANNER_NAMES[0] == 'Sampling'
  assert planner_registry.PLANNER_NAMES[2] == 'iLQG'


def test_testspeed_runs():
  from mujoco_mpc_tpu import testspeed
  result = testspeed.synchronous_planning_cost(
      'ParticleFixed', planner_id=0, total_time=0.3,
      steps_per_planning_iteration=5, num_samples=15, verbose=False)
  assert result['total_steps'] == 30
  assert result['wall_time_s'] > 0
  assert np.isfinite(result['avg_cost'])
