"""Height-field collision (physics/collision.py _hfield_*).

Reference terrain: the quadruped hill task runs on an MJCF hfield
(mjpc/tasks/quadruped/task_hill.xml); MuJoCo collides against prism
decompositions of the triangulated grid. Here the surface is the same
triangulation, contacted piecewise-planar — golden vs MuJoCo on flat
and sloped grids, qualitative on rough terrain.
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import support
from mujoco_mpc_tpu.physics.model import make_data, put_model


def _hfield_xml(nrow=9, ncol=9, size='2 2 0.5 0.1', body=''):
  return f"""
  <mujoco>
    <option timestep="0.002" gravity="0 0 -9.81"/>
    <asset><hfield name="terrain" nrow="{nrow}" ncol="{ncol}"
                   size="{size}"/></asset>
    <worldbody>
      <geom name="hf" type="hfield" hfield="terrain" friction="0.8"/>
      {body}
    </worldbody>
  </mujoco>"""


def _models(xml, hdata):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjm.hfield_data[:] = np.asarray(hdata, dtype=np.float64).ravel()
  m = put_model(mjm, dtype=jnp.float64)
  return mjm, m


def test_sphere_rests_on_flat_hfield():
  """On a constant-height grid both engines settle the ball at the same
  height (flat hfield == plane at z_top * h)."""
  body = ('<body name="ball" pos="0.3 0.2 0.6"><freejoint/>'
          '<geom type="sphere" size="0.1" mass="0.3"/></body>')
  xml = _hfield_xml(body=body)
  mjm, m = _models(xml, 0.4 * np.ones((9, 9)))
  mjd = mujoco.MjData(mjm)
  for _ in range(600):
    mujoco.mj_step(mjm, mjd)
  d = make_data(m, dtype=jnp.float64)
  step = jax.jit(fwd.step)
  for _ in range(600):
    d = step(m, d)
  # surface at 0.4 * z_top(0.5) = 0.2; ball radius 0.1 -> center ~0.3
  assert abs(float(d.qpos[2]) - 0.3) < 5e-3, float(d.qpos[2])
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=5e-3)


def test_ball_rolls_down_sloped_hfield():
  """A ball released on a sloped grid rolls downhill in both engines."""
  body = ('<body name="ball" pos="0 0 0.8"><freejoint/>'
          '<geom type="sphere" size="0.1" mass="0.3" friction="0.8"/>'
          '</body>')
  xml = _hfield_xml(body=body)
  # slope rising along +x: downhill is -x
  grid = np.tile(np.linspace(0.0, 1.0, 9)[None, :], (9, 1))
  mjm, m = _models(xml, grid)
  mjd = mujoco.MjData(mjm)
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
  d = make_data(m, dtype=jnp.float64)
  step = jax.jit(fwd.step)
  for _ in range(500):
    d = step(m, d)
  assert float(d.qpos[0]) < -0.15, float(d.qpos[0])       # rolled -x
  assert mjd.qpos[0] < -0.15
  # same downhill direction and comparable distance
  np.testing.assert_allclose(float(d.qpos[0]), mjd.qpos[0], atol=0.15)


def test_capsule_contacts_hfield():
  body = ('<body name="cap" pos="0 0 0.5"><freejoint/>'
          '<geom type="capsule" size="0.05 0.2" mass="0.2" euler="0 90 0"/>'
          '</body>')
  xml = _hfield_xml(body=body)
  mjm, m = _models(xml, np.zeros((9, 9)))
  d = make_data(m, dtype=jnp.float64)
  step = jax.jit(fwd.step)
  for _ in range(500):
    d = step(m, d)
  # resting on the (flat, z=0) surface on its radius
  assert abs(float(d.qpos[2]) - 0.05) < 5e-3, float(d.qpos[2])


def test_ground_height_raycast_on_hfield():
  """support.ground_height reads the triangulated surface (the foot
  raycast the quadruped hill task uses, reference Ground())."""
  xml = _hfield_xml()
  grid = np.tile(np.linspace(0.0, 1.0, 9)[None, :], (9, 1))
  mjm, m = _models(xml, grid)
  d = fwd.forward(m, make_data(m, dtype=jnp.float64))
  # at x=0 (grid center) height = 0.5 * z_top = 0.25
  h_mid = float(support.ground_height(m, d, jnp.asarray([0.0, 0.0, 1.0])))
  assert abs(h_mid - 0.25) < 1e-6, h_mid
  # at x=+2 (max edge) height = z_top = 0.5
  h_hi = float(support.ground_height(m, d, jnp.asarray([1.99, 0.0, 1.0])))
  assert abs(h_hi - 0.5) < 0.07, h_hi
