"""Fixed tendons: lengths, coupling springs, limits, actuation — golden vs
MuJoCo (reference gets tendons from mj_step; humanoid patch uses limited
fixed tendons, panda patch a tendon actuator)."""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import smooth
from mujoco_mpc_tpu.physics.model import make_data, put_model

COUPLED = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.01"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0" mass="0.5"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.01"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0" mass="0.3"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="hamstring" limited="true" range="-0.3 0.5">
      <joint joint="j1" coef="0.5"/>
      <joint joint="j2" coef="-0.5"/>
    </fixed>
    <fixed name="springy" stiffness="3.0" damping="0.2" springlength="0.1">
      <joint joint="j1" coef="1.0"/>
      <joint joint="j2" coef="0.4"/>
    </fixed>
  </tendon>
  <actuator>
    <motor joint="j1" gear="2" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
  <sensor>
    <tendonpos tendon="hamstring"/>
    <tendonvel tendon="springy"/>
  </sensor>
</mujoco>
"""

TENDON_ACT = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="slide" axis="0 0 1" damping="0.5"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.4"/>
      <body pos="0.2 0 0">
        <joint name="j2" type="slide" axis="0 0 1" damping="0.5"/>
        <geom type="box" size="0.05 0.05 0.05" mass="0.4"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="split">
      <joint joint="j1" coef="1.0"/>
      <joint joint="j2" coef="1.0"/>
    </fixed>
  </tendon>
  <actuator>
    <motor tendon="split" gear="3" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
</mujoco>
"""


def _setup(xml, qpos, qvel, ctrl):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel
  mjd.ctrl[:] = ctrl
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(np.asarray(qpos, dtype=np.float64)),
                qvel=jnp.asarray(np.asarray(qvel, dtype=np.float64)),
                ctrl=jnp.asarray(np.asarray(ctrl, dtype=np.float64)))
  return mjm, mjd, m, d


def test_tendon_length_velocity():
  mjm, mjd, m, d = _setup(COUPLED, [0.3, -0.2], [0.5, 0.8], [0.1])
  mujoco.mj_forward(mjm, mjd)
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.ten_length), mjd.ten_length,
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.ten_velocity), mjd.ten_velocity,
                             atol=1e-12)
  # tendonpos / tendonvel sensors
  from mujoco_mpc_tpu.physics import sensors
  sd = np.asarray(sensors.sensordata(m, d))
  np.testing.assert_allclose(sd, mjd.sensordata, atol=1e-12)


def test_tendon_spring_damper_force():
  mjm, mjd, m, d = _setup(COUPLED, [0.3, -0.2], [0.5, 0.8], [0.0])
  mujoco.mj_forward(mjm, mjd)
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_passive), mjd.qfrc_passive,
                             atol=1e-10)


def test_tendon_limit_trajectory():
  """Drive the coupled arm into the tendon limit; trajectories match."""
  mjm, mjd, m, d = _setup(COUPLED, [0.0, 0.0], [0.0, 0.0], [1.0])
  step = jax.jit(fwd.step)
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d.replace(ctrl=jnp.asarray([1.0])))
  # the hamstring tendon limit must have engaged
  assert mjd.ten_length[0] > 0.3
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-6)


def test_tendon_actuator():
  mjm, mjd, m, d = _setup(TENDON_ACT, [0.0, 0.0], [0.0, 0.0], [0.7])
  mujoco.mj_forward(mjm, mjd)
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.actuator_length),
                             mjd.actuator_length, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qfrc_actuator),
                             mjd.qfrc_actuator, atol=1e-12)
  step = jax.jit(fwd.step)
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)


# geom-wrap tendons (sphere/cylinder wrap surfaces, mju_wrap semantics):
# a hinged arm whose tendon runs from a world anchor over a wrap geom to
# the arm tip; sweeping the hinge exercises no-wrap, tangent-engage and
# deep-wrap configurations
WRAP_CYL = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <site name="anchor" pos="-0.35 0 0.3"/>
    <geom name="wg" type="cylinder" size="0.06 0.15" pos="0 0 0.3"
          euler="90 0 0" contype="0" conaffinity="0"/>
    <site name="side" pos="0 0 0.42"/>
    <body pos="0.25 0 0.3">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.4"/>
      <site name="tip" pos="0.3 0 0"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="wt" stiffness="4.0" damping="0.1" springlength="0.5">
      <site site="anchor"/>
      <geom geom="wg" sidesite="side"/>
      <site site="tip"/>
    </spatial>
  </tendon>
</mujoco>
"""

# the sphere twin lifts the anchor off the center-tip line: on the
# exactly-collinear configuration the geodesic plane is ambiguous (any
# plane through the axis gives the same length) and the oracle's plane
# pick there is an arbitrary implementation artifact; off the degenerate
# manifold the wrap is unique and must match
WRAP_SPHERE = WRAP_CYL.replace(
    'type="cylinder" size="0.06 0.15"', 'type="sphere" size="0.06"'
).replace('<site name="anchor" pos="-0.35 0 0.3"/>',
          '<site name="anchor" pos="-0.35 0.02 0.33"/>')


@pytest.mark.parametrize('xml', [WRAP_CYL, WRAP_SPHERE],
                         ids=['cylinder', 'sphere'])
def test_geom_wrap_length_and_moment(xml):
  """Wrap length/moment vs the oracle across a hinge sweep spanning
  no-wrap and wrapped configurations (mj_tendon + mju_wrap)."""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = put_model(mjm, dtype=jnp.float64)
  fw = jax.jit(fwd.forward)
  wrapped_seen, straight_seen = 0, 0
  for q in np.linspace(-1.2, 1.2, 9):
    mjd.qpos[:] = [q]
    mujoco.mj_forward(mjm, mjd)
    d = make_data(m, dtype=jnp.float64)
    d = fw(m, d.replace(qpos=jnp.asarray([q], jnp.float64)))
    np.testing.assert_allclose(np.asarray(d.ten_length), mjd.ten_length,
                               atol=1e-9, err_msg=f'qpos {q}')
    np.testing.assert_allclose(np.asarray(d.ten_J).ravel(),
                               np.asarray(mjd.ten_J).ravel(),
                               atol=1e-8, err_msg=f'qpos {q}')
    if mjd.ten_wrapnum[0] > 2:
      wrapped_seen += 1
    else:
      straight_seen += 1
  # the sweep must exercise both branches of the wrap
  assert wrapped_seen >= 2 and straight_seen >= 2, (wrapped_seen,
                                                    straight_seen)


@pytest.mark.parametrize('xml', [WRAP_CYL, WRAP_SPHERE],
                         ids=['cylinder', 'sphere'])
def test_geom_wrap_spring_trajectory(xml):
  """Spring-loaded wrap tendon drives the arm; trajectories match the
  oracle through wrap engage/release transitions."""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [0.9]
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray([0.9], jnp.float64))
  step = jax.jit(fwd.step)
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-5)


SPATIAL = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <site name="anchor" pos="0.1 0 1.2"/>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0" mass="0.5"/>
      <site name="mid" pos="0.2 0 0.03"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"
              mass="0.3"/>
        <site name="tip" pos="0.3 0 0"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="string" stiffness="40" damping="1.0"
             springlength="0.5">
      <site site="anchor"/><site site="mid"/><site site="tip"/>
    </spatial>
  </tendon>
  <sensor>
    <tendonpos tendon="string"/>
    <tendonvel tendon="string"/>
  </sensor>
</mujoco>
"""


def test_spatial_tendon_length_and_moment():
  """Site-waypoint tendon length and moment rows match mj_tendon."""
  mjm = mujoco.MjModel.from_xml_string(SPATIAL)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(3)
  mjd.qpos[:] = 0.3 * rng.standard_normal(mjm.nq)
  mjd.qvel[:] = 0.5 * rng.standard_normal(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64).replace(
      qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy()))
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.ten_length), mjd.ten_length,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.ten_velocity), mjd.ten_velocity,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.ten_J)[0],
                             mjd.ten_J.reshape(mjm.ntendon, mjm.nv)[0],
                             atol=1e-10)


def test_spatial_tendon_spring_trajectory():
  """Swinging double pendulum held by a spatial tendon spring follows
  the oracle (spring + damper forces through the moment rows)."""
  mjm = mujoco.MjModel.from_xml_string(SPATIAL)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [0.5, -0.3]
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64).replace(
      qpos=jnp.asarray(mjd.qpos.copy()))
  step = jax.jit(fwd.step)
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-5)


def test_spatial_tendon_actuator_and_limit():
  """Tendon actuator pulling through a spatial path + tendon range
  limit, trajectory vs oracle."""
  xml = """
  <mujoco>
    <option timestep="0.002" gravity="0 0 -9.81"/>
    <worldbody>
      <site name="top" pos="0 0 1.5"/>
      <body pos="0 0 1">
        <joint name="lift" type="slide" axis="0 0 1" damping="2.0"/>
        <geom type="box" size="0.05 0.05 0.05" mass="0.5"/>
        <site name="hook" pos="0 0 0.05"/>
      </body>
    </worldbody>
    <tendon>
      <spatial name="cable" limited="true" range="0.1 0.48">
        <site site="top"/><site site="hook"/>
      </spatial>
    </tendon>
    <actuator>
      <motor tendon="cable" gear="-8" ctrlrange="0 1" ctrllimited="true"/>
    </actuator>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.ctrl[:] = 0.6
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64).replace(
      ctrl=jnp.asarray(mjd.ctrl.copy()))
  step = jax.jit(fwd.step)
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=5e-4)
  # the range limit kept the cable from collapsing below its minimum
  assert float(d.ten_length[0]) > 0.09


def test_spatial_tendon_pulley_branches():
  """Pulley divisor splits the path into scaled branches (mj_tendon
  semantics): length = sum(branch length / divisor)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <site name="a" pos="0 0 1"/>
      <site name="b" pos="0.3 0 1"/>
      <body pos="0 0 0.5">
        <joint name="z" type="slide" axis="0 0 1"/>
        <geom type="sphere" size="0.05" mass="1"/>
        <site name="p1" pos="0 0 0"/>
        <site name="p2" pos="0.05 0 0"/>
      </body>
    </worldbody>
    <tendon>
      <spatial name="rig">
        <site site="a"/><site site="p1"/>
        <pulley divisor="2"/>
        <site site="b"/><site site="p2"/>
      </spatial>
    </tendon>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.ten_length), mjd.ten_length,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.ten_J)[0],
                             mjd.ten_J.reshape(mjm.ntendon, mjm.nv)[0],
                             atol=1e-10)
