"""FreeFingers / Panda / Panda Bring task specs (reference:
mjpc/tasks/fingers/, mjpc/tasks/panda/, mjpc/tasks/manipulation/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.tasks import registry

# end-to-end planning tests: minutes on one CPU; the <5-min core suite is
# the unit/parity set (pytest -m "not slow")
pytestmark = pytest.mark.slow

MANIP_TASKS = ['FreeFingers', 'Panda', 'Panda Bring']


@pytest.mark.parametrize('name', MANIP_TASKS)
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
  assert np.isfinite(c) and c >= 0


def test_fingers_transition_moves_target():
  spec = registry.get_task('FreeFingers')
  d = make_data(spec.model)
  d = fwd.forward(spec.model, d)
  # teleport object onto the target -> transition must relocate target
  tgt = np.array(d.mocap_pos[0])
  qpos = np.array(d.qpos)
  qpos[0:3] = tgt
  d2 = fwd.forward(spec.model, d.replace(qpos=jnp.asarray(
      qpos, dtype=d.qpos.dtype)))
  key = jax.random.key(3)
  d3, _ = spec.transition_fn(spec.model, d2, spec.default_params, key)
  assert not np.allclose(np.array(d3.mocap_pos[0][:2]), tgt[:2])


def test_panda_object_rests_on_floor():
  """Free cube settles on the plane under gravity (contact sanity)."""
  spec = registry.get_task('Panda')
  m = spec.model
  k = m.keyframe_names.index('home')
  d = make_data(m).replace(qpos=m.key_qpos[k], ctrl=m.key_ctrl[k])

  @jax.jit
  def run(d):
    def body(d, _):
      return fwd.step(m, d), None
    d, _ = jax.lax.scan(body, d, None, length=200)
    return d

  d = run(d)
  # object z stays at half-extent above the floor (0.028) within tolerance
  assert 0.01 < float(d.qpos[2]) < 0.06, float(d.qpos[2])
