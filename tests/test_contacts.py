"""Contact golden tests vs MuJoCo: forward accelerations and multi-step
trajectories for primitive pairs."""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data, put_model

SPHERE_PLANE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0.1 0.2 0.095">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1" friction="0.8"/>
    </body>
  </worldbody>
</mujoco>
"""

BOX_PLANE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.099">
      <freejoint/>
      <geom type="box" size="0.1 0.15 0.1" mass="2" friction="0.6"/>
    </body>
  </worldbody>
</mujoco>
"""

CAPSULE_PLANE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.048" quat="0.999 0 0.04 0">
      <freejoint/>
      <geom type="capsule" size="0.05" fromto="-0.2 0 0 0.2 0 0" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""

SPHERE_SPHERE = """
<mujoco>
  <option timestep="0.002" gravity="0 0 0"/>
  <worldbody>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1"/>
    </body>
    <body pos="0.19 0.02 1">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""

ALL = {
    'sphere_plane': SPHERE_PLANE,
    'box_plane': BOX_PLANE,
    'capsule_plane': CAPSULE_PLANE,
    'sphere_sphere': SPHERE_SPHERE,
}


def _setup(xml, qvel=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if qvel is not None:
    mjd.qvel[:] = qvel
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qvel=jnp.array(mjd.qvel))
  return mjm, mjd, m, d


@pytest.mark.parametrize('name', list(ALL))
def test_contact_qacc(name):
  rng = np.random.default_rng(0)
  mjm = mujoco.MjModel.from_xml_string(ALL[name])
  qvel = 0.3 * rng.standard_normal(mjm.nv)
  mjm2, mjd, m, d = _setup(ALL[name], qvel)
  mujoco.mj_forward(mjd and mjm or mjm, mjd)
  d = fwd.forward(m, d)
  np.testing.assert_allclose(d.qacc, mjd.qacc, rtol=1e-5, atol=1e-6,
                             err_msg=f'{name} ncon={mjd.ncon}')


@pytest.mark.parametrize('name', list(ALL))
def test_contact_trajectory(name):
  rng = np.random.default_rng(1)
  mjm0 = mujoco.MjModel.from_xml_string(ALL[name])
  qvel = 0.2 * rng.standard_normal(mjm0.nv)
  mjm, mjd, m, d = _setup(ALL[name], qvel)
  step = jax.jit(fwd.step)
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=2e-4,
                             err_msg=f'{name} qpos after 200 steps')
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=2e-3,
                             err_msg=f'{name} qvel after 200 steps')
