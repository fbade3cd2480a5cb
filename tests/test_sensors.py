"""Sensor golden tests vs mujoco sensordata."""

import mujoco
import numpy as np
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import sensors
from mujoco_mpc_tpu.physics.model import make_data, put_model

XML = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="h1" type="hinge" axis="0 1 0" damping="0.02"/>
      <geom name="g1" type="capsule" size="0.04" fromto="0 0 0 0.5 0 0" mass="0.5"/>
      <site name="s1" pos="0.5 0 0" quat="0.92 0.38 0 0"/>
      <body pos="0.5 0 0">
        <joint name="s2j" type="slide" axis="0 0 1" damping="0.01"/>
        <geom name="g2" type="sphere" size="0.05" mass="0.2"/>
        <site name="s2" pos="0 0 -0.1"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="h1" gear="1"/></actuator>
  <sensor>
    <jointpos name="jp" joint="h1"/>
    <jointvel name="jv" joint="s2j"/>
    <framepos name="fp" objtype="site" objname="s1"/>
    <framequat name="fq" objtype="site" objname="s1"/>
    <framelinvel name="flv" objtype="site" objname="s2"/>
    <frameangvel name="fav" objtype="body" objname="world"/>
    <gyro name="gy" site="s1"/>
    <velocimeter name="vm" site="s2"/>
    <accelerometer name="ac" site="s1"/>
    <magnetometer name="mg" site="s1"/>
    <subtreecom name="sc" body="world"/>
  </sensor>
</mujoco>
"""


def test_sensordata_matches_mujoco():
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(2)
  mjd.qpos[:] = rng.standard_normal(mjm.nq) * 0.4
  mjd.qvel[:] = rng.standard_normal(mjm.nv) * 0.5
  mjd.ctrl[:] = [0.3]
  mujoco.mj_forward(mjm, mjd)

  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel),
                ctrl=jnp.array(mjd.ctrl))
  d = fwd.forward(m, d)
  ours = np.asarray(sensors.sensordata(m, d))

  # quaternion sign normalization for framequat
  mj_sd = mjd.sensordata.copy()
  fq_adr = mjm.sensor_adr[3]
  if np.dot(ours[fq_adr:fq_adr + 4], mj_sd[fq_adr:fq_adr + 4]) < 0:
    mj_sd[fq_adr:fq_adr + 4] *= -1

  np.testing.assert_allclose(ours, mj_sd, atol=1e-8,
                             err_msg=str(list(zip(ours, mj_sd))))


FORCE_XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1" contype="1"
          conaffinity="1"/>
    <body name="plate" pos="0 0 0.3">
      <geom name="plate_g" type="box" size="0.2 0.2 0.02" mass="0.3"
            contype="2" conaffinity="2"/>
      <site name="fs" pos="0 0 0" type="box" size="0.01 0.01 0.01"/>
      <site name="ts" pos="0 0 0.02" type="box" size="0.21 0.21 0.08"/>
    </body>
    <body name="box" pos="0.05 0 0.38">
      <freejoint/>
      <geom name="box_g" type="box" size="0.05 0.05 0.05" mass="0.2"
            contype="3" conaffinity="3"/>
    </body>
  </worldbody>
  <sensor>
    <force name="f" site="fs"/>
    <torque name="t" site="fs"/>
    <touch name="touch" site="ts"/>
  </sensor>
</mujoco>
"""


def test_force_torque_touch_golden():
  """Force/torque (cfrc_int) and touch sensors vs MuJoCo on a box resting
  on a sensored plate (plate welded to world, box in contact)."""
  mjm = mujoco.MjModel.from_xml_string(FORCE_XML)
  mjd = mujoco.MjData(mjm)
  # settle the box onto the plate under MuJoCo dynamics
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)

  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel))
  d = fwd.forward(m, d)
  ours = np.asarray(sensors.sensordata(m, d))
  want = mjd.sensordata.copy()

  # at rest the plate's interface force carries plate + box weight
  total_w = 9.81 * (0.3 + 0.2)
  assert abs(want[2] + total_w) < 0.05 or abs(want[2] - total_w) < 0.05
  np.testing.assert_allclose(ours, want, atol=0.02,
                             err_msg=str(list(zip(ours, want))))


def test_contact_forces_weight_balance():
  """Decoded contact forces (constraint.contact_forces) support the
  resting box's weight."""
  from mujoco_mpc_tpu.physics import constraint

  mjm = mujoco.MjModel.from_xml_string(FORCE_XML)
  mjd = mujoco.MjData(mjm)
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)

  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel))
  d = fwd.forward(m, d)
  cf = constraint.contact_forces(m, d)
  assert cf is not None
  fw = np.einsum('prx,pr->px', np.asarray(cf.frame),
                 np.asarray(cf.force6[:, :3]))
  # total vertical contact force on the box equals its weight
  box_body = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY, 'box')
  up = 0.0
  for i in range(fw.shape[0]):
    if cf.b2[i] == box_body:
      up += fw[i, 2]
    elif cf.b1[i] == box_body:
      up -= fw[i, 2]
  assert abs(up - 9.81 * 0.2) < 0.02, up


RANGE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <geom name="wall" type="box" size="0.1 2 1" pos="2 0 1"/>
    <geom name="ball" type="sphere" size="0.3" pos="0 2 0.5"/>
    <geom name="post" type="capsule" size="0.08 0.5" pos="-1.5 0 0.6"/>
    <geom name="drum" type="cylinder" size="0.25 0.4" pos="0 -2 0.4"/>
    <body name="head" pos="0 0 0.5">
      <joint name="yaw" type="hinge" axis="0 0 1"/>
      <geom type="sphere" size="0.05" mass="0.2"/>
      <site name="eye_fwd" pos="0.06 0 0" zaxis="1 0 0"/>
      <site name="eye_left" pos="0 0.06 0" zaxis="0 1 0"/>
      <site name="eye_back" pos="-0.06 0 0" zaxis="-1 0 0"/>
      <site name="eye_right" pos="0 -0.06 0" zaxis="0 -1 0"/>
      <site name="eye_up" pos="0 0 0.06" zaxis="0 0 1"/>
      <site name="eye_down" pos="0 0 -0.06" zaxis="0 0 -1"/>
    </body>
  </worldbody>
  <sensor>
    <rangefinder site="eye_fwd"/>
    <rangefinder site="eye_left"/>
    <rangefinder site="eye_back"/>
    <rangefinder site="eye_right"/>
    <rangefinder site="eye_up"/>
    <rangefinder site="eye_down"/>
  </sensor>
</mujoco>
"""


def test_rangefinder_golden():
  """Rangefinder rays against box / sphere / capsule / cylinder / plane
  and the no-hit case match mj_ray (support.raycast)."""
  mjm = mujoco.MjModel.from_xml_string(RANGE_XML)
  mjd = mujoco.MjData(mjm)
  for yaw in (0.0, 0.4, -1.1, 2.5):
    mjd.qpos[0] = yaw
    mujoco.mj_forward(mjm, mjd)
    m = put_model(mjm, dtype=jnp.float64)
    d = make_data(m, dtype=jnp.float64).replace(
        qpos=jnp.asarray(mjd.qpos.copy()))
    d = fwd.forward(m, d)
    ours = np.asarray(sensors.sensordata(m, d))
    np.testing.assert_allclose(ours, mjd.sensordata, atol=1e-9,
                               err_msg=f'yaw={yaw}')
