"""Quadruped / Humanoid task specs: residual dims, cost, gait machinery.

Mirrors the reference's task loading test (test/tasks/task_test.cc: every
registered task loads and residual dimension matches the sensor spec).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.tasks import registry

LOCO_TASKS = ['Quadruped Flat', 'Quadruped Hill', 'Humanoid Stand',
              'Humanoid Walk']


@pytest.mark.parametrize('name', LOCO_TASKS)
def test_task_loads_and_residual_dims(name):
  spec = registry.get_task(name)
  d = make_data(spec.model)
  if 'home' in spec.model.keyframe_names:
    d = d.replace(qpos=spec.model.keyframe_qpos('home'))
  d = fwd.forward(spec.model, d)
  r = spec.residual_fn(spec.model, d, spec.default_params.residual_params)
  assert r.shape == (spec.num_residual,)
  c = spec.cost(r, spec.default_params)
  assert np.isfinite(float(c))
  terms = spec.cost_terms(r, spec.default_params)
  assert terms.shape == (spec.num_term,)
  assert np.all(np.isfinite(np.array(terms)))


def test_quadruped_gait_phases():
  """Swing-height targets follow the selected gait's phase signature."""
  spec = registry.get_task('Quadruped Flat')
  rp = np.array(spec.default_params.residual_params)
  d = make_data(spec.model).replace(
      qpos=spec.model.keyframe_qpos('home'))
  d = fwd.forward(spec.model, d)

  names = spec.residual_param_names
  gait_idx = names.index('select_Gait')

  # stand (gait 0): all four gait residuals equal foot clearance (~0)
  rp0 = rp.copy()
  rp0[gait_idx] = 0.0
  r = spec.residual_fn(spec.model, d, jnp.asarray(rp0, dtype=jnp.float32))
  gait_terms = np.array(r[7:11])
  np.testing.assert_allclose(gait_terms, gait_terms[0] * np.ones(4),
                             atol=1e-5)

  # trot (gait 2) at a swing-phase time: diagonal pairs match
  rp2 = rp.copy()
  rp2[gait_idx] = 2.0
  d_mid = d.replace(time=jnp.asarray(0.4, dtype=d.qpos.dtype))
  d_mid = fwd.forward(spec.model, d_mid)
  r2 = np.array(spec.residual_fn(spec.model, d_mid,
                                 jnp.asarray(rp2, dtype=jnp.float32))[7:11])
  # feet order [FL, FR, HL, HR]; trot pairs (FL,HR) and (FR,HL)
  np.testing.assert_allclose(r2[0], r2[3], atol=1e-5)
  np.testing.assert_allclose(r2[1], r2[2], atol=1e-5)


def test_quadruped_stands_under_home_ctrl():
  """With home-keyframe servo targets the quadruped stays upright."""
  spec = registry.get_task('Quadruped Flat')
  m = spec.model
  k = m.keyframe_names.index('home')
  d = make_data(m).replace(qpos=m.key_qpos[k], ctrl=m.key_ctrl[k])

  @jax.jit
  def run(d):
    def body(d, _):
      return fwd.step(m, d), None
    d, _ = jax.lax.scan(body, d, None, length=100)
    return d

  d = run(d)
  z = float(d.qpos[2])
  assert 0.2 < z < 0.5, z
  # trunk roughly upright
  assert float(d.qpos[3]) > 0.9


def test_humanoid_transition_free():
  spec = registry.get_task('Humanoid Stand')
  assert spec.transition_fn is None
  # walk variant defaults to a nonzero speed goal
  walk = registry.get_task('Humanoid Walk')
  sidx = walk.residual_param_names.index('Speed Goal')
  assert float(walk.default_params.residual_params[sidx]) > 0
