"""Hand / bimanual / OP3 / humanoid-track / interact task specs
(reference: mjpc/tasks/{shadow_reorient,allegro,rubik,bimanual,op3,
humanoid/tracking,humanoid/interact})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.tasks import registry

EXTENDED_TASKS = [
    'Shadow Reorient', 'Allegro Cube', 'Cube Solving',
    'Bimanual Handover', 'Bimanual Insert', 'Bimanual Reorient',
    'OP3 Stand', 'Humanoid Track', 'Humanoid Interact',
]


@pytest.mark.parametrize('name', EXTENDED_TASKS)
def test_task_loads_and_residual_dims(name):
  spec = registry.get_task(name)
  d = make_data(spec.model)
  if 'home' in spec.model.keyframe_names:
    d = d.replace(qpos=spec.model.keyframe_qpos('home'))
  d = fwd.forward(spec.model, d)
  r = spec.residual_fn(spec.model, d, spec.default_params.residual_params)
  assert r.shape == (spec.num_residual,)
  assert np.all(np.isfinite(np.array(r)))
  c = float(spec.cost(r, spec.default_params))
  assert np.isfinite(c)


def test_registry_covers_reference_task_families():
  """Every reference task family (tasks/tasks.cc:46-73) has a counterpart."""
  names = set(registry.task_names())
  expected = {
      'Acrobot', 'Allegro Cube', 'Bimanual Handover', 'Bimanual Insert',
      'Bimanual Reorient', 'Cartpole', 'FreeFingers', 'Humanoid Interact',
      'Humanoid Stand', 'Humanoid Track', 'Humanoid Walk', 'OP3 Stand',
      'Panda', 'Panda Bring', 'Particle', 'ParticleFixed', 'Quadrotor',
      'Quadruped Flat', 'Quadruped Hill', 'Cube Solving', 'Shadow Reorient',
      'Swimmer', 'Walker',
  }
  missing = expected - names
  assert not missing, missing


def test_cube_solving_schedule_advances():
  spec = registry.get_task('Cube Solving')
  d = make_data(spec.model)
  d = fwd.forward(spec.model, d)
  # cube starts at the first goal (identity) -> transition advances index
  d2, _ = spec.transition_fn(spec.model, d, spec.default_params,
                             jax.random.key(0))
  assert float(d2.userdata[0]) == 1.0
  # now the goal is a quarter-turn away -> cost is nonzero
  r = spec.residual_fn(spec.model, d2, spec.default_params.residual_params)
  assert float(spec.cost(r, spec.default_params)) > 0.01


def test_shadow_reorient_drop_recovery():
  spec = registry.get_task('Shadow Reorient')
  d = make_data(spec.model)
  qpos = np.array(d.qpos)
  qpos[2] = -0.2  # cube fell below the palm
  d = fwd.forward(spec.model, d.replace(
      qpos=jnp.asarray(qpos, dtype=d.qpos.dtype)))
  d2, _ = spec.transition_fn(spec.model, d, spec.default_params,
                             jax.random.key(1))
  assert float(d2.qpos[2]) > 0.0  # teleported back above the palm


def test_humanoid_track_clip_interpolation():
  spec = registry.get_task('Humanoid Track')
  m = spec.model
  assert m.key_qpos.shape[0] >= 120
  d = make_data(m)
  d = fwd.forward(m, d)
  r0 = spec.residual_fn(m, d, spec.default_params.residual_params)
  d1 = fwd.forward(m, d.replace(time=jnp.asarray(0.5, dtype=d.qpos.dtype)))
  r1 = spec.residual_fn(m, d1, spec.default_params.residual_params)
  # tracking target moves with time
  assert not np.allclose(np.array(r0[:17]), np.array(r1[:17]))
