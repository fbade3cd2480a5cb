"""Actuator transmission/activation golden tests vs MuJoCo.

Site-with-refsite transmission and integrated-velocity (intvelocity)
actuators with actrange clamping — the actuation model of the reference
fingers task (mjpc/tasks/fingers/task.xml:94-99, intvelocity + site +
refsite + actrange).
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data, put_model

FINGER = """
<mujoco>
  <option timestep="0.002" gravity="0 0 0"/>
  <worldbody>
    <body name="base" pos="0 0 0.1">
      <joint type="hinge" axis="0 0 1" damping="0.3"/>
      <geom type="box" size="0.05 0.05 0.02" mass="0.5"/>
      <site name="ref" pos="0.05 0 0" euler="0 0 30"/>
    </body>
    <body name="finger" pos="0.1 0 0.3">
      <joint type="slide" axis="1 0 0" damping="2"/>
      <joint type="slide" axis="0 1 0" damping="2"/>
      <joint type="slide" axis="0 0 1" damping="2"/>
      <joint type="hinge" axis="0 0 1" damping="0.5"/>
      <geom type="sphere" size="0.03" mass="0.2"/>
      <site name="tip" pos="0.01 0 0.02" euler="0 10 0"/>
    </body>
  </worldbody>
  <actuator>
    <intvelocity name="ax" site="tip" refsite="ref" actrange="-1 1"
      ctrlrange="-.99 .99" ctrllimited="true" kp="100"
      gear="1 0 0 0 0 0"/>
    <intvelocity name="ay" site="tip" refsite="ref" actrange="-1 1"
      ctrlrange="-.99 .99" ctrllimited="true" kp="100"
      gear="0 1 0 0 0 0"/>
    <intvelocity name="az" site="tip" refsite="ref" actrange="0 0.3"
      ctrlrange="-.99 .99" ctrllimited="true" kp="100"
      gear="0 0 1 0 0 0"/>
    <intvelocity name="ar" site="tip" refsite="ref" actrange="-3 3"
      ctrlrange="-.99 .99" ctrllimited="true" kp="10"
      gear="0 0 0 0 0 1"/>
  </actuator>
</mujoco>
"""


def _setup(ctrl, qpos=None):
  mjm = mujoco.MjModel.from_xml_string(FINGER)
  mjd = mujoco.MjData(mjm)
  mjd.ctrl[:] = ctrl
  if qpos is not None:
    mjd.qpos[:] = qpos
  mujoco.mj_forward(mjm, mjd)
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64).replace(
      ctrl=jnp.asarray(mjd.ctrl.copy()))
  if qpos is not None:
    d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()))
  return mjm, mjd, m, d


def test_refsite_length_moment_golden():
  """Relative site pose length and its Jacobian (moment rows) match
  mj_transmission, including the rotating-ref-frame cross term (the ref
  site sits on a hinged base)."""
  mjm, mjd, m, d = _setup([0.5, -0.3, 0.8, 0.4],
                          qpos=[0.4, 0.02, -0.05, 0.1, 0.7])
  d = fwd.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.actuator_length),
                             mjd.actuator_length, atol=1e-12)
  mom = np.zeros((mjm.nu, mjm.nv))
  mujoco.mju_sparse2dense(mom, mjd.actuator_moment, mjd.moment_rownnz,
                          mjd.moment_rowadr, mjd.moment_colind)
  np.testing.assert_allclose(np.asarray(d.actuator_moment), mom,
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qfrc_actuator),
                             mjd.qfrc_actuator, atol=1e-12)


def test_intvelocity_actrange_saturation():
  """Integrated-velocity setpoint saturates at actrange in both engines
  (mj_advance act clipping; az has actrange [0, 0.3] and is driven up
  for long enough to hit it)."""
  mjm, mjd, m, d = _setup([0.2, 0.1, 0.9, 0.0])
  step = jax.jit(fwd.step)
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  # az integrates 0.9 * 0.002 * 500 = 0.9 -> clamped to 0.3
  np.testing.assert_allclose(float(d.act[2]), 0.3, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)
