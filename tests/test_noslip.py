"""Noslip post-pass vs the MuJoCo C oracle.

The reference gets <option noslip_iterations/> behavior from mj_step
(reference planning configs that set it: mjpc/tasks/fingers/task.xml:4,
manipulation/task_panda_bring.xml:4). physics/noslip.py reimplements the
pass (elliptic per-contact QCQP, pyramidal per-pair difference GS); these
tests pin qacc to mj_forward with noslip enabled, in float64.
"""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward
from mujoco_mpc_tpu.physics.model import make_data, put_model

XML = """
<mujoco>
  <option timestep="0.002" iterations="200" tolerance="1e-15" cone="{cone}"
          noslip_iterations="{nsi}" noslip_tolerance="0"/>
  <worldbody>
    <geom type="plane" size="5 5 .1" friction="0.8 0.02 0.001"/>
    <body pos="0 0 0.0499">
      <freejoint/>
      <geom type="sphere" size=".05" friction="0.8 0.02 0.001" mass="1"
            condim="{condim}"/>
    </body>
  </worldbody>
</mujoco>
"""

TWO_CONTACT_XML = """
<mujoco>
  <option timestep="0.002" iterations="200" tolerance="1e-15" cone="{cone}"
          noslip_iterations="{nsi}" noslip_tolerance="0"/>
  <worldbody>
    <geom type="plane" size="5 5 .1" friction="0.8"/>
    <body pos="0 0 0.0499">
      <joint type="slide" axis="1 0 0"/>
      <joint type="slide" axis="0 1 0"/>
      <joint type="slide" axis="0 0 1"/>
      <joint type="hinge" axis="0 0 1"/>
      <geom type="sphere" size=".05" friction="0.8" mass="1"
            pos="-.2 0 0" condim="{condim}"/>
      <geom type="sphere" size=".05" friction="0.8" mass="1"
            pos=".2 0 0" condim="{condim}"/>
    </body>
  </worldbody>
</mujoco>
"""


def _compare_qacc(xml, vel, rel_tol=1e-6):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:len(vel)] = vel
  mujoco.mj_forward(mjm, mjd)
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(np.asarray(mjd.qpos)),
                qvel=jnp.asarray(np.asarray(mjd.qvel)))
  d = forward.forward(m, d)
  scale = max(1.0, float(np.abs(mjd.qacc).max()))
  err = float(np.abs(np.asarray(d.qacc) - mjd.qacc).max()) / scale
  assert err < rel_tol, f'qacc rel err {err:.3e}'


@pytest.mark.parametrize('cone,condim,vel', [
    # stick regime: friction rows driven to jar=0 (interior of the cone)
    ('pyramidal', 3, (0.02, 0.005, 0, 0, 0, 0.3)),
    ('elliptic', 3, (0.02, 0.005, 0, 0, 0, 0.3)),
    # torsion in the joint solve (condim 4)
    ('elliptic', 4, (0.02, 0.005, 0, 0, 0, 0.3)),
    # rolling dims pinned at the cone cap (condim 6 joint QCQP)
    ('elliptic', 6, (0.02, 0.005, 0, 0.1, 0.05, 0.3)),
    # fast slide: saturated solution must come out unchanged
    ('pyramidal', 4, (2.0, 0.5, 0, 0, 0, 5.0)),
    ('elliptic', 4, (2.0, 0.5, 0, 0, 0, 5.0)),
])
def test_single_contact_matches_oracle(cone, condim, vel):
  xml = XML.format(cone=cone, condim=condim, nsi=2)
  _compare_qacc(xml, vel)


@pytest.mark.parametrize('cone', ['pyramidal', 'elliptic'])
def test_two_contacts_gauss_seidel_sequencing(cone):
  """Cross-contact coupling: the sequential sweep must match MuJoCo's
  row-order Gauss-Seidel at a FINITE iteration count (nsi=1 is not yet
  converged, so this pins the per-sweep update, not just the fixed
  point)."""
  xml = TWO_CONTACT_XML.format(cone=cone, condim=3, nsi=1)
  _compare_qacc(xml, (0.02, 0.0, 0, 0.1), rel_tol=1e-8)


FRICTION_MIX_XML = """
<mujoco>
  <option timestep="0.002" iterations="200" tolerance="1e-15" cone="{cone}"
          noslip_iterations="{nsi}" noslip_tolerance="0"/>
  <worldbody>
    <geom type="plane" size="5 5 .1" friction="0.8"/>
    <body pos="0 0 0.0499">
      <freejoint/>
      <geom type="sphere" size=".05" friction="0.8" mass="1"/>
      <body pos="0 0 .1">
        <joint name="arm" type="hinge" axis="0 1 0" frictionloss="0.4"/>
        <geom type="capsule" size=".02" fromto="0 0 0 .15 0 0" mass="0.5"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.mark.parametrize('cone,nsi', [('pyramidal', 1), ('elliptic', 1),
                                      ('elliptic', 5)])
def test_frictionloss_rows_interleave_with_contacts(cone, nsi):
  """noslip also updates dof frictionloss rows, visited BEFORE contacts
  in each sweep (efc row order); nsi=1 pins the per-sweep sequencing
  because the friction/contact coupling converges only geometrically."""
  xml = FRICTION_MIX_XML.format(cone=cone, nsi=nsi)
  _compare_qacc(xml, (0.02, 0, 0, 0, 0, 0, 0.05), rel_tol=1e-8)


def test_noslip_zero_iterations_is_free():
  """noslip_iterations=0 must not trace any noslip ops (the flag is
  static; planning models without the option pay nothing)."""
  import jax

  xml = XML.format(cone='elliptic', condim=3, nsi=0)
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  text = jax.make_jaxpr(lambda dd: forward.forward(m, dd))(d)
  assert 'while' in str(text)  # the main Newton solve is there
  assert m.opt.noslip_iterations == 0
