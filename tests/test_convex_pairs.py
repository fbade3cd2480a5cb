"""Golden tests for the round-2 convex narrowphase pairs.

Exact closed forms (plane-ellipsoid support point, sphere-cylinder,
capsule-box alternating projection) are compared tightly against the
MuJoCo C oracle; pairs routed through compile-time tessellated hulls
(cylinder-box, cylinder-cylinder, sphere-ellipsoid) are checked to settle
to the oracle's resting state within the tessellation error (MuJoCo
resolves all of these with its convex collider,
engine_collision_convex.c).
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data, put_model


def _both(xml, qvel=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if qvel is not None:
    mjd.qvel[:] = qvel
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  return mjm, mjd, m, d


def _run(mjm, mjd, m, d, nsteps):
  step = jax.jit(fwd.step)
  for _ in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  return mjd, d


def test_plane_ellipsoid_settles():
  """A tilted ellipsoid rolls to rest at the oracle's height (exact
  support-point contact; round-1 used the inner sphere, which floated
  the long axis through the floor)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="floor" type="plane" size="5 5 0.1"/>
      <body pos="0 0 0.12" euler="0 20 0">
        <freejoint/>
        <geom type="ellipsoid" size="0.15 0.08 0.06" mass="0.5"
              friction="0.9"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _both(xml)
  mjd, d = _run(mjm, mjd, m, d, 800)
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=3e-3)
  # resting height must reflect the true surface, not the inner sphere
  assert float(d.qpos[2]) > 0.055


def test_sphere_cylinder_qacc_and_settle():
  """Ball resting on a lying cylinder: exact closed-form contact."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="cyl" type="cylinder" size="0.1 0.4" pos="0 0 0.1"
            euler="0 90 0" friction="0.8"/>
      <body pos="0.05 0.0 0.305">
        <freejoint/>
        <geom type="sphere" size="0.1" mass="0.3" friction="0.8"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _both(xml)
  mujoco.mj_forward(mjm, mjd)
  d0 = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d0.qacc), mjd.qacc,
                             rtol=1e-4, atol=1e-4)
  mjd, d = _run(mjm, mjd, m, d, 300)
  np.testing.assert_allclose(np.asarray(d.qpos)[:3], mjd.qpos[:3],
                             atol=5e-3)


def test_sphere_cylinder_end_disc():
  """Ball dropped onto a cylinder's flat end disc rests on it."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="cyl" type="cylinder" size="0.15 0.2" pos="0 0 0.2"/>
      <body pos="0.03 0.02 0.55">
        <freejoint/>
        <geom type="sphere" size="0.08" mass="0.3"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _both(xml)
  mjd, d = _run(mjm, mjd, m, d, 600)
  # rest height = disc top (0.4) + radius
  np.testing.assert_allclose(float(d.qpos[2]), 0.48, atol=5e-3)
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=5e-3)


def test_capsule_across_box_edge():
  """Capsule resting across the top edge of a box: the mid-segment
  contact resolves exactly (round-1 end spheres missed it entirely)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="floor" type="plane" size="5 5 0.1"/>
      <geom name="block" type="box" size="0.05 0.3 0.15" pos="0 0 0.15"/>
      <body pos="0 0 0.36" euler="0 4 0">
        <freejoint/>
        <geom type="capsule" size="0.05" fromto="-0.25 0 0 0.25 0 0"
              mass="0.4" friction="0.7"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _both(xml)
  mjd, d = _run(mjm, mjd, m, d, 500)
  # stays supported by the block edge (z = 0.30 + 0.05), does not fall
  # through to the floor
  assert float(d.qpos[2]) > 0.25, float(d.qpos[2])
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=1e-2)


def test_capsule_flat_on_box():
  """Capsule settling flat on a box face matches the oracle height."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="slab" type="box" size="0.6 0.6 0.1" pos="0 0 0.1"/>
      <body pos="0 0 0.27">
        <freejoint/>
        <geom type="capsule" size="0.04" fromto="-0.2 0 0 0.2 0 0"
              mass="0.4"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _both(xml)
  mjd, d = _run(mjm, mjd, m, d, 400)
  np.testing.assert_allclose(float(d.qpos[2]), 0.24, atol=3e-3)
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=3e-3)


def test_cylinder_rests_on_box():
  """Lying cylinder settles on a box top via the tessellated hull
  (16-gon rim: height error bounded by the tessellation, < 1% r)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="slab" type="box" size="0.6 0.6 0.1" pos="0 0 0.1"/>
      <body pos="0 0 0.33" euler="0 90 0">
        <freejoint/>
        <geom type="cylinder" size="0.1 0.25" mass="0.5"
              friction="0.8"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _both(xml)
  mjd, d = _run(mjm, mjd, m, d, 500)
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=5e-3)
  assert abs(float(d.qpos[2]) - 0.3) < 8e-3


def test_cylinder_on_cylinder_stack():
  """Crossed cylinder stack stays stacked (hull-hull route)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="floor" type="plane" size="5 5 0.1"/>
      <geom name="base" type="cylinder" size="0.12 0.4" pos="0 0 0.12"
            euler="0 90 0" friction="1.0"/>
      <body pos="0 0 0.37" euler="90 0 0">
        <freejoint/>
        <geom type="cylinder" size="0.12 0.3" mass="0.5" friction="1.0"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _both(xml)
  mjd, d = _run(mjm, mjd, m, d, 600)
  # stays on top of the base cylinder (center ~0.24+0.12), both engines
  assert float(d.qpos[2]) > 0.3, float(d.qpos[2])
  assert mjd.qpos[2] > 0.3
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=2e-2)


def test_sphere_on_ellipsoid():
  """Ball resting on a large ellipsoid (hull route) stays on top and
  matches the oracle within the tessellation error."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="dome" type="ellipsoid" size="0.4 0.4 0.2"
            pos="0 0 0.2" friction="1.2"/>
      <body pos="0.0 0.0 0.52">
        <freejoint/>
        <geom type="sphere" size="0.1" mass="0.2" friction="1.2"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _both(xml)
  mjd, d = _run(mjm, mjd, m, d, 250)
  # still near the dome apex in both engines
  assert float(d.qpos[2]) > 0.45, float(d.qpos[2])
  assert mjd.qpos[2] > 0.45
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=2e-2)
