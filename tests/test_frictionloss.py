"""Joint frictionloss rows vs the MuJoCo C oracle.

MuJoCo friction rows (mjCNSTR_FRICTION_DOF) carry a two-sided Huber cost:
force = -clip(D jar, -frictionloss, +frictionloss), D from the dof's
solimpfriction impedance at pos=0 over dof_invweight0, aref = -B v.
Menagerie robot models (shadow hand, a1, aloha — the reference's
contact-rich tasks) set frictionloss on most joints, so this is core
model coverage (constraint.py FrictionRows, pallas_newton Huber zones).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward
from mujoco_mpc_tpu.physics.model import make_data, put_model

CHAIN_XML = """
<mujoco>
  <option timestep="0.002" iterations="100" tolerance="1e-15"/>
  <worldbody>
    <body>
      <joint name="j0" type="slide" axis="1 0 0" frictionloss="0.7"
             damping="0.1" solreffriction="0.02 1"
             solimpfriction="0.9 0.95 0.001 0.5 2"/>
      <geom type="sphere" size=".05" mass="1"/>
      <body>
        <joint name="j1" type="hinge" axis="0 0 1" frictionloss="0.3"
               range="-1 1" limited="true"/>
        <geom type="sphere" size=".05" mass="1" pos=".2 0 0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

CONTACT_XML = """
<mujoco>
  <option timestep="0.002" iterations="100" tolerance="1e-15"/>
  <worldbody>
    <geom type="plane" size="5 5 .1" friction="0.5"/>
    <body pos="0 0 0.049">
      <freejoint/>
      <geom type="box" size=".05 .05 .05" friction="0.5" mass="1"/>
      <body pos="0 0 .1">
        <joint name="arm" type="hinge" axis="0 1 0" frictionloss="0.4"/>
        <geom type="capsule" size=".02" fromto="0 0 0 .2 0 0" mass="0.5"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def _forward_both(xml, qpos=None, qvel=None, qfrc=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if qpos is not None:
    mjd.qpos[:len(qpos)] = qpos
  if qvel is not None:
    mjd.qvel[:len(qvel)] = qvel
  if qfrc is not None:
    mjd.qfrc_applied[:len(qfrc)] = qfrc
  mujoco.mj_forward(mjm, mjd)
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(np.asarray(mjd.qpos)),
                qvel=jnp.asarray(np.asarray(mjd.qvel)),
                qfrc_applied=jnp.asarray(np.asarray(mjd.qfrc_applied)))
  d = forward.forward(m, d)
  return m, d, mjm, mjd


def _assert_qacc(d, mjd, rel_tol=1e-8):
  scale = max(1.0, float(np.abs(mjd.qacc).max()))
  err = float(np.abs(np.asarray(d.qacc) - mjd.qacc).max()) / scale
  assert err < rel_tol, f'qacc rel err {err:.3e}'


@pytest.mark.parametrize('qvel,qfrc', [
    ((0.0, 0.0), (0.1, 0.0)),     # static: friction holds the push
    ((0.001, 0.0), None),         # creep: quadratic (regularized) zone
    ((0.5, -0.2), None),          # sliding: both rows force-clamped
    ((5.0, 3.0), (1.0, -0.5)),    # fast + applied torque
])
def test_chain_matches_oracle(qvel, qfrc):
  _, d, _, mjd = _forward_both(CHAIN_XML, qvel=qvel, qfrc=qfrc)
  _assert_qacc(d, mjd)


def test_friction_with_engaged_limit():
  """Friction row and limit row active on the same dof."""
  _, d, _, mjd = _forward_both(CHAIN_XML, qpos=(0.0, 1.02),
                               qvel=(0.3, 0.5))
  _assert_qacc(d, mjd)


def test_friction_with_contacts():
  """Friction dof coupled to pyramidal contact rows through the tree."""
  _, d, _, mjd = _forward_both(
      CONTACT_XML, qvel=(0.5, 0.1, 0, 0, 0, 0.3, 2.0))
  _assert_qacc(d, mjd)


def test_jacfwd_through_friction_rows():
  """Implicit tangent (frozen Huber zones) vs finite differences of the
  full forward, in the quadratic (stick) zone."""
  mjm = mujoco.MjModel.from_xml_string(CHAIN_XML)
  m = put_model(mjm, dtype=jnp.float64)
  d0 = make_data(m, dtype=jnp.float64)

  def qacc_of_qvel(qv):
    return forward.forward(m, d0.replace(qvel=qv)).qacc

  qv0 = jnp.asarray([0.001, 0.0])
  jac = jax.jacfwd(qacc_of_qvel)(qv0)
  eps = 1e-7
  for col in range(2):
    e = jnp.zeros(2, dtype=jnp.float64).at[col].set(eps)
    fd = (qacc_of_qvel(qv0 + e) - qacc_of_qvel(qv0 - e)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(jac[:, col]), np.asarray(fd),
                               rtol=1e-4, atol=1e-6)


def test_tendon_frictionloss_fails_loudly():
  xml = """
  <mujoco>
    <worldbody>
      <body><joint name="a" type="slide" axis="1 0 0"/>
        <geom type="sphere" size=".05" mass="1"/></body>
    </worldbody>
    <tendon><fixed name="t" frictionloss="0.5">
      <joint joint="a" coef="1"/></fixed></tendon>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError, match='tendon frictionloss'):
    put_model(mjm)
