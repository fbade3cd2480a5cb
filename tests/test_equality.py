"""Equality constraints (connect / weld / joint / tendon couplings) —
golden vs MuJoCo (reference relies on mj_step for these; menagerie hand
models use joint couplings, task scenes use connect/weld attachments)."""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data, put_model

CONNECT = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0" mass="0.5" contype="0" conaffinity="0"/>
    </body>
    <body name="b" pos="0.4 0 1">
      <joint type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.3" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <connect body1="a" body2="b" anchor="0.4 0 0"/>
  </equality>
</mujoco>
"""

WELD = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.08 0.05 0.05" mass="0.5" contype="0" conaffinity="0"/>
    </body>
    <body name="b" pos="0.25 0 1">
      <freejoint/>
      <geom type="box" size="0.08 0.05 0.05" mass="0.3" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="a" body2="b" torquescale="1"/>
  </equality>
</mujoco>
"""

JOINT_COUPLING = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.01"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.4"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.01"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.3" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <equality>
    <joint joint1="j2" joint2="j1" polycoef="0 0.71 0.1 0 0"/>
  </equality>
  <actuator><motor joint="j1" gear="1"/></actuator>
</mujoco>
"""

TENDON_COUPLING = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="slide" axis="0 0 1" damping="0.2"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.4"/>
    </body>
    <body pos="0.3 0 1">
      <joint name="j2" type="slide" axis="0 0 1" damping="0.2"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.6"/>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1"><joint joint="j1" coef="1.0"/></fixed>
    <fixed name="t2"><joint joint="j2" coef="1.0"/></fixed>
  </tendon>
  <equality>
    <tendon tendon1="t1" tendon2="t2" polycoef="0 -1 0 0 0"/>
  </equality>
  <actuator><motor joint="j1" gear="1"/></actuator>
</mujoco>
"""


def _setup(xml, qpos=None, qvel=None, ctrl=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if qpos is not None:
    mjd.qpos[:] = qpos
  if qvel is not None:
    mjd.qvel[:] = qvel
  if ctrl is not None:
    mjd.ctrl[:] = ctrl
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  # np.array(copy=True): jnp.asarray on CPU may zero-copy ALIAS the mujoco
  # buffers, which mj_step then mutates under us
  d = d.replace(qpos=jnp.asarray(np.array(mjd.qpos, dtype=np.float64)),
                qvel=jnp.asarray(np.array(mjd.qvel, dtype=np.float64)),
                ctrl=jnp.asarray(np.array(mjd.ctrl, dtype=np.float64)))
  return mjm, mjd, m, d


def _check_forward(mjm, mjd, m, d, atol=1e-8):
  mujoco.mj_forward(mjm, mjd)
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=atol,
                             rtol=1e-6)
  return d


def _check_trajectory(mjm, mjd, m, d, steps, ctrl_fn=None, atol=1e-6):
  step = jax.jit(fwd.step)
  for i in range(steps):
    if ctrl_fn is not None:
      u = ctrl_fn(i)
      mjd.ctrl[:] = u
      d = d.replace(ctrl=jnp.asarray(u, dtype=jnp.float64))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=atol)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=atol * 10)


def test_connect_forward_and_trajectory():
  mjm, mjd, m, d = _setup(CONNECT, qpos=[0.2, -0.1], qvel=[0.3, -0.4])
  _check_forward(mjm, mjd, m, d)
  _check_trajectory(mjm, mjd, m, d, 150)


def test_weld_forward_and_trajectory():
  mjm, mjd, m, d = _setup(WELD)
  qv = np.zeros(12)
  qv[0], qv[4], qv[9] = 0.3, 0.5, 0.2   # translate + spin
  mjd.qvel[:] = qv
  d = d.replace(qvel=jnp.asarray(qv))
  _check_forward(mjm, mjd, m, d, atol=1e-6)
  _check_trajectory(mjm, mjd, m, d, 100, atol=1e-5)


def test_joint_coupling():
  mjm, mjd, m, d = _setup(JOINT_COUPLING, qpos=[0.1, 0.3], qvel=[0.2, 0.0])
  _check_forward(mjm, mjd, m, d)
  _check_trajectory(mjm, mjd, m, d, 150,
                    ctrl_fn=lambda i: [0.4 * np.sin(0.05 * i)])


def test_tendon_coupling():
  mjm, mjd, m, d = _setup(TENDON_COUPLING, qpos=[0.05, -0.02])
  _check_forward(mjm, mjd, m, d)
  _check_trajectory(mjm, mjd, m, d, 150,
                    ctrl_fn=lambda i: [0.5 * np.cos(0.04 * i)])
