"""Task registry tests: every task loads, residual dims match the cost spec
(reference: test/tasks/task_test.cc pattern), and contact-based / flying
tasks can plan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks import registry


# the interlocked cube (26 mesh cubelets, 310 contact pairs) takes
# minutes to load+trace on one CPU: its cases run in the slow suite
_HEAVY_TASKS = ('Cube Solving',)
_TASK_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _HEAVY_TASKS else n
    for n in registry.task_names()]


@pytest.mark.parametrize('name', _TASK_PARAMS)
def test_task_loads_and_residual_dims(name):
  spec = registry.get_task(name)
  d = make_data(spec.model)
  d = fwd.forward(spec.model, d)
  res = spec.residual_fn(spec.model, d, spec.default_params.residual_params)
  assert res.shape == (spec.num_residual,), (name, res.shape)
  cost = spec.cost(res, spec.default_params)
  assert np.isfinite(float(cost)), name
  terms = spec.cost_terms(res, spec.default_params)
  assert terms.shape == (spec.num_term,)


@pytest.mark.parametrize('name', _TASK_PARAMS)
def test_task_steps(name):
  spec = registry.get_task(name)
  d = make_data(spec.model)
  step = jax.jit(lambda d: fwd.step(spec.model, d))
  for _ in range(5):
    d = step(d)
  assert np.all(np.isfinite(np.asarray(d.qpos))), name


def test_quadrotor_hovers_with_planning():
  spec = registry.get_task('Quadrotor')
  carry, costs = agent_mod.synchronous_mpc(
      spec, num_samples=63, total_steps=100, steps_per_plan=5,
      key=jax.random.key(0), interp=spline.Interp.ZERO)
  # quad should stay aloft near z=1 rather than free-falling
  z = float(carry.sim.qpos[2])
  assert z > 0.4, z
  assert np.all(np.isfinite(costs))


def test_walker_planning_keeps_torso_up():
  spec = registry.get_task('Walker')
  carry, costs = agent_mod.synchronous_mpc(
      spec, num_samples=63, total_steps=100, steps_per_plan=5,
      key=jax.random.key(0), interp=spline.Interp.ZERO)
  height = float(carry.sim.qpos[1]) + 1.3  # rootz is relative to spawn
  assert height > 0.7, height
  assert np.all(np.isfinite(costs))
