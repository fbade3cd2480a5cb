"""Golden tests: our JAX physics pipeline vs the MuJoCo C oracle.

The reference framework runs MuJoCo C (mj_step / mj_forward) inside its
rollout hot loop; our pipeline must reproduce those dynamics. Each test
builds a small MJCF, runs both engines in float64, and compares stage-by-
stage quantities plus multi-step trajectories.
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import kinematics as kin
from mujoco_mpc_tpu.physics import smooth
from mujoco_mpc_tpu.physics.model import make_data, put_model

PENDULUM = """
<mujoco>
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 2">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0 0 -1" mass="1"/>
      <site name="tip" pos="0 0 -1"/>
    </body>
  </worldbody>
  <actuator><motor joint="hinge" gear="2.0" ctrlrange="-1 1" ctrllimited="true"/></actuator>
</mujoco>
"""

CARTPOLE = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <body name="cart" pos="0 0 1">
      <joint name="slider" type="slide" axis="1 0 0" damping="0.05"/>
      <geom type="box" size="0.2 0.1 0.05" mass="1"/>
      <body name="pole" pos="0 0 0">
        <joint name="hinge" type="hinge" axis="0 1 0"/>
        <geom type="capsule" size="0.045" fromto="0 0 0 0 0 1" mass="0.1"/>
        <site name="tip" pos="0 0 1"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="slider" gear="10" ctrlrange="-1 1" ctrllimited="true"/></actuator>
</mujoco>
"""

# ball joint + springs + position/velocity actuators
MIXED = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0.1 0 1" quat="0.92 0.38 0 0">
      <joint name="ball" type="ball" damping="0.02" stiffness="0.5"/>
      <geom type="box" size="0.1 0.15 0.2" mass="0.7" pos="0 0 -0.25"/>
      <body pos="0 0 -0.5" quat="0.98 0 0.19 0">
        <joint name="h1" type="hinge" axis="1 1 0" damping="0.01" stiffness="2" springref="0.3"/>
        <joint name="s1" type="slide" axis="0 0 1" damping="0.03"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 -0.4" mass="0.3"/>
        <site name="ee" pos="0.3 0 -0.4"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position joint="h1" kp="3.0" ctrlrange="-1 1"/>
    <velocity joint="s1" kv="1.5"/>
  </actuator>
</mujoco>
"""

FREEBODY = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.1 0.2 0.3" mass="2" pos="0.02 -0.01 0.03"/>
      <site name="thrust" pos="0 0 -0.1" quat="0.92 0.38 0 0"/>
    </body>
  </worldbody>
  <actuator>
    <general site="thrust" gear="0 0 1 0 0 0" ctrlrange="0 5" ctrllimited="true"/>
    <general site="thrust" gear="0 0 0 0 0 0.4" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
</mujoco>
"""

SWIMMER = """
<mujoco>
  <option timestep="0.01" integrator="implicit" density="1000" viscosity="0.1" gravity="0 0 0"/>
  <worldbody>
    <body pos="0 0 0.05">
      <joint name="rootx" type="slide" axis="1 0 0"/>
      <joint name="rooty" type="slide" axis="0 1 0"/>
      <joint name="rootz" type="hinge" axis="0 0 1"/>
      <geom type="capsule" size="0.01" fromto="0 0 0 0.1 0 0" mass="0.01"/>
      <body pos="0.1 0 0">
        <joint name="j1" type="hinge" axis="0 0 1" range="-1.7 1.7" damping="5e-5"/>
        <geom type="capsule" size="0.01" fromto="0 0 0 0.1 0 0" mass="0.01"/>
        <body pos="0.1 0 0">
          <joint name="j2" type="hinge" axis="0 0 1" range="-1.7 1.7" damping="5e-5"/>
          <geom type="capsule" size="0.01" fromto="0 0 0 0.1 0 0" mass="0.01"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j1" gear="5e-4" ctrlrange="-1 1" ctrllimited="true"/>
    <motor joint="j2" gear="5e-4" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
</mujoco>
"""

ALL_MODELS = {
    'pendulum': PENDULUM,
    'cartpole': CARTPOLE,
    'mixed': MIXED,
    'freebody': FREEBODY,
    'swimmer': SWIMMER,
}


def _setup(xml, qpos=None, qvel=None, ctrl=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  if qpos is None:
    qpos = mjm.qpos0 + 0.1 * rng.standard_normal(mjm.nq)
    # re-normalize quaternions
    for j in range(mjm.njnt):
      t = mjm.jnt_type[j]
      adr = mjm.jnt_qposadr[j]
      if t == mujoco.mjtJoint.mjJNT_BALL:
        qpos[adr:adr + 4] /= np.linalg.norm(qpos[adr:adr + 4])
      elif t == mujoco.mjtJoint.mjJNT_FREE:
        qpos[adr + 3:adr + 7] /= np.linalg.norm(qpos[adr + 3:adr + 7])
  if qvel is None:
    qvel = 0.2 * rng.standard_normal(mjm.nv)
  if ctrl is None:
    ctrl = np.clip(rng.standard_normal(mjm.nu), -1, 1)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel
  mjd.ctrl[:] = ctrl

  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                ctrl=jnp.asarray(ctrl))
  return mjm, mjd, m, d


@pytest.mark.parametrize('name', list(ALL_MODELS))
def test_forward_stages(name):
  xml = ALL_MODELS[name]
  mjm, mjd, m, d = _setup(xml)
  mujoco.mj_forward(mjm, mjd)
  d = fwd.forward(m, d)

  np.testing.assert_allclose(d.xpos, mjd.xpos, atol=1e-10, err_msg='xpos')
  # quaternion sign may differ
  for b in range(m.nbody):
    q_ours, q_mj = np.asarray(d.xquat[b]), mjd.xquat[b]
    if np.dot(q_ours, q_mj) < 0:
      q_mj = -q_mj
    np.testing.assert_allclose(q_ours, q_mj, atol=1e-10, err_msg='xquat')
  np.testing.assert_allclose(d.xipos, mjd.xipos, atol=1e-10)
  if m.nsite:
    np.testing.assert_allclose(d.site_xpos, mjd.site_xpos, atol=1e-10)
  np.testing.assert_allclose(d.subtree_com, mjd.subtree_com, atol=1e-10)
  np.testing.assert_allclose(d.cinert, mjd.cinert.reshape(m.nbody, 10),
                             atol=1e-9, err_msg='cinert')
  np.testing.assert_allclose(d.cdof, mjd.cdof.reshape(m.nv, 6), atol=1e-10,
                             err_msg='cdof')

  qm_mj = np.zeros((m.nv, m.nv))
  mujoco.mj_fullM(mjm, mjd, qm_mj)
  np.testing.assert_allclose(d.qM, qm_mj, atol=1e-9, err_msg='qM')

  np.testing.assert_allclose(d.qfrc_bias, mjd.qfrc_bias, atol=1e-9,
                             err_msg='qfrc_bias')
  np.testing.assert_allclose(d.qfrc_passive, mjd.qfrc_passive, atol=1e-9,
                             err_msg='qfrc_passive')
  np.testing.assert_allclose(d.qfrc_actuator, mjd.qfrc_actuator, atol=1e-9,
                             err_msg='qfrc_actuator')
  np.testing.assert_allclose(d.qacc, mjd.qacc, atol=1e-7, err_msg='qacc')


@pytest.mark.parametrize('name', list(ALL_MODELS))
def test_step_trajectory(name):
  xml = ALL_MODELS[name]
  mjm, mjd, m, d = _setup(xml)
  step = jax.jit(fwd.step)

  for t in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)

  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-6,
                             err_msg=f'{name} qpos after 100 steps')
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=1e-6,
                             err_msg=f'{name} qvel after 100 steps')
  np.testing.assert_allclose(float(d.time), mjd.time, atol=1e-9)


def test_xfrc_applied():
  mjm, mjd, m, d = _setup(FREEBODY)
  xfrc = np.zeros((m.nbody, 6))
  xfrc[1] = [0.3, -0.2, 0.5, 0.05, -0.02, 0.01]
  mjd.xfrc_applied[:] = xfrc
  d = d.replace(xfrc_applied=jnp.asarray(xfrc))
  mujoco.mj_forward(mjm, mjd)
  d = fwd.forward(m, d)
  np.testing.assert_allclose(d.qacc, mjd.qacc, atol=1e-7)


def test_rk4():
  xml = PENDULUM.replace('timestep="0.01"', 'timestep="0.01" integrator="RK4"')
  mjm, mjd, m, d = _setup(xml)
  assert m.opt.integrator == 1
  step = jax.jit(fwd.step)
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-7)
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=1e-7)
