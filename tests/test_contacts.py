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

# yawed capsule sliding on the plane: the contact tangent frame must
# follow the capsule axis (mjc_PlaneCapsule), not makeFrame(normal) —
# the pyramidal cone is tangent-anisotropic, so a wrong frame shows up
# in qacc only when the axis is NOT world-axis-aligned (regression for
# the humanoid reference-parity finding)
CAPSULE_PLANE_YAW = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.048" euler="0 0 37">
      <freejoint/>
      <geom type="capsule" size="0.05" fromto="-0.2 0 0 0.2 0 0"
            mass="0.5" friction="0.7"/>
    </body>
  </worldbody>
</mujoco>
"""

ALL = {
    'sphere_plane': SPHERE_PLANE,
    'box_plane': BOX_PLANE,
    'capsule_plane': CAPSULE_PLANE,
    'capsule_plane_yaw': CAPSULE_PLANE_YAW,
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


def _traj_check(xml, qpos0, qvel0, nsteps, atol, ctrl=None):
  import mujoco
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = qpos0
  mjd.qvel[:] = qvel0
  if ctrl is not None:
    mjd.ctrl[:] = ctrl
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(np.array(qpos0, dtype=np.float64)),
                qvel=jnp.asarray(np.array(qvel0, dtype=np.float64)))
  if ctrl is not None:
    d = d.replace(ctrl=jnp.asarray(np.array(ctrl, dtype=np.float64)))
  step = jax.jit(fwd.step)
  for _ in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=atol)
  return m, d, mjm, mjd


def test_box_box_sat_stack():
  """Aligned box stacking settles identically to MuJoCo (SAT face
  manifold; the round-1 corner approximation is gone)."""
  xml = """
  <mujoco><option timestep=\"0.005\"/>
  <worldbody>
    <geom type=\"plane\" size=\"1 1 0.1\"/>
    <body pos=\"0 0 0.055\"><freejoint/>
      <geom type=\"box\" size=\"0.05 0.05 0.05\" mass=\"0.5\"/></body>
    <body pos=\"0.01 0.005 0.162\"><freejoint/>
      <geom type=\"box\" size=\"0.04 0.04 0.05\" mass=\"0.3\"/></body>
  </worldbody></mujoco>"""
  q0 = [0, 0, 0.055, 1, 0, 0, 0, 0.01, 0.005, 0.162, 1, 0, 0, 0]
  _traj_check(xml, q0, np.zeros(12), 80, 5e-3)


def test_box_box_sat_rotated():
  """A box dropped twisted 30 degrees onto another: SAT edge/face axes
  engage; trajectory stays within a loose band of MuJoCo (contact-rich
  chaotic amplification)."""
  xml = """
  <mujoco><option timestep=\"0.004\"/>
  <worldbody>
    <geom type=\"plane\" size=\"1 1 0.1\"/>
    <body pos=\"0 0 0.05\"><freejoint/>
      <geom type=\"box\" size=\"0.06 0.06 0.05\" mass=\"0.6\"/></body>
    <body pos=\"0 0 0.17\"><freejoint/>
      <geom type=\"box\" size=\"0.05 0.05 0.04\" mass=\"0.2\"/></body>
  </worldbody></mujoco>"""
  half = np.cos(np.pi / 12), np.sin(np.pi / 12)
  q0 = [0, 0, 0.05, 1, 0, 0, 0,
        0, 0, 0.17, half[0], 0, 0, half[1]]
  _traj_check(xml, q0, np.zeros(12), 60, 2e-2)


def test_plane_cylinder_exact():
  """Upright and lying cylinders rest on the plane at the exact rim/disc
  height (bounding-sphere approximation replaced)."""
  xml = """
  <mujoco><option timestep=\"0.005\"/>
  <worldbody>
    <geom type=\"plane\" size=\"1 1 0.1\"/>
    <body pos=\"0 0 0.08\"><freejoint/>
      <geom type=\"cylinder\" size=\"0.03 0.08\" mass=\"0.2\"/></body>
    <body pos=\"0.3 0 0.03\"><freejoint/>
      <geom type=\"cylinder\" size=\"0.03 0.08\" mass=\"0.2\"
            euler=\"90 0 0\"/></body>
  </worldbody></mujoco>"""
  import mujoco
  mjm = mujoco.MjModel.from_xml_string(xml)
  q0 = np.array(mjm.qpos0)
  _traj_check(xml, q0, np.zeros(12), 100, 6e-3)


def test_mesh_hull_contacts():
  """A meshed tetrahedron resting on the plane and poked by a sphere:
  hull-vertex/halfspace contacts keep it on the surface like MuJoCo."""
  xml = """
  <mujoco><option timestep=\"0.004\"/>
  <asset>
    <mesh name=\"tet\" vertex=\"0.05 0 0  -0.03 0.04 0  -0.03 -0.04 0
                                0 0 0.07\"/>
  </asset>
  <worldbody>
    <geom type=\"plane\" size=\"1 1 0.1\"/>
    <body pos=\"0 0 0.05\"><freejoint/>
      <geom type=\"mesh\" mesh=\"tet\" mass=\"0.1\"/></body>
  </worldbody></mujoco>"""
  import mujoco
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = put_model(mjm, dtype=jnp.float64)
  assert m.geom_mesh and 1 in m.geom_mesh
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(np.array(mjd.qpos, dtype=np.float64)))
  step = jax.jit(fwd.step)
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  # settled on the plane at the same height as MuJoCo (the tet's base
  # sits at body z=0, so the settled origin is ~0 with soft penetration)
  z = float(d.qpos[2])
  assert abs(z - float(mjd.qpos[2])) < 2e-3, (z, float(mjd.qpos[2]))
  assert float(jnp.linalg.norm(d.qvel)) < 0.2


def test_sliding_friction_long_horizon():
  """condim-3 kinetic friction: a box shoved across a plane decelerates
  under sliding friction and stops; golden vs MuJoCo over 500 steps
  (VERDICT round 1: long-horizon condim>1 sliding coverage)."""
  xml = """
  <mujoco>
    <option timestep="0.002" gravity="0 0 -9.81"/>
    <worldbody>
      <geom type="plane" size="8 8 0.1" friction="0.4"/>
      <body pos="0 0 0.0499">
        <freejoint/>
        <geom type="box" size="0.05 0.05 0.05" mass="0.4" friction="0.4"/>
      </body>
    </worldbody>
  </mujoco>"""
  qpos0 = [0, 0, 0.0499, 1, 0, 0, 0]
  qvel0 = [2.5, 0.6, 0, 0, 0, 0]           # fast diagonal shove
  m, d, mjm, mjd = _traj_check(xml, qpos0, qvel0, 500, atol=5e-3)
  # the slide actually happened and friction dissipated it
  assert mjd.qpos[0] > 0.3
  assert abs(np.asarray(d.qvel)[0]) < 0.05


def test_rolling_friction_condim6_long_horizon():
  """condim-6: a rolling sphere with torsional+rolling friction slows
  down; golden vs MuJoCo over 400 steps."""
  xml = """
  <mujoco>
    <option timestep="0.002" gravity="0 0 -9.81"/>
    <worldbody>
      <geom type="plane" size="8 8 0.1" condim="6"
            friction="0.6 0.01 0.002"/>
      <body pos="0 0 0.0999">
        <freejoint/>
        <geom type="sphere" size="0.1" mass="0.3" condim="6"
              friction="0.6 0.01 0.002"/>
      </body>
    </worldbody>
  </mujoco>"""
  qpos0 = [0, 0, 0.0999, 1, 0, 0, 0]
  qvel0 = [1.5, 0, 0, 0, 15.0, 0]           # rolling forward
  m, d, mjm, mjd = _traj_check(xml, qpos0, qvel0, 400, atol=8e-3)
  assert mjd.qpos[0] > 0.4                  # it rolled


def test_clustered_narrowphase_matches_unrolled():
  """The batched same-hull cluster narrowphase (plane-mesh, box-mesh,
  sphere-mesh, capsule-mesh; collision.contact_clusters) must produce
  the same dynamics as the unrolled per-pair path it replaces."""
  import mujoco
  from mujoco_mpc_tpu.physics import collision as coll
  from mujoco_mpc_tpu.physics import forward as fwd
  from mujoco_mpc_tpu.physics.model import make_data, put_model

  balls = '\n'.join(f"""
    <body pos="{0.05*i - 0.1} {0.02*(i%3)} {0.035 + 0.012*i}">
      <freejoint/>
      <geom type="mesh" mesh="cubelet" mass="0.1" condim="3"/>
    </body>""" for i in range(6))
  spheres = '\n'.join(f"""
    <body pos="{0.06*i - 0.1} -0.08 0.05">
      <freejoint/>
      <geom type="sphere" size="0.02" mass="0.05" condim="3"/>
    </body>""" for i in range(4))
  capsules = '\n'.join(f"""
    <body pos="{0.05*i - 0.08} 0.07 0.05" euler="0 {20*i} 0">
      <freejoint/>
      <geom type="capsule" size="0.012 0.025" mass="0.05" condim="3"/>
    </body>""" for i in range(4))
  xml = f"""
  <mujoco>
    <option timestep="0.002"/>
    <asset><mesh name="cubelet" vertex="{_chamfered(0.018, 0.005)}"/></asset>
    <worldbody>
      <geom name="floor" type="plane" size="2 2 0.1"/>
      <geom name="slab" type="box" size="0.3 0.3 0.01" pos="0 0 -0.01"
            contype="1" conaffinity="1"/>
      {balls}
      {spheres}
      {capsules}
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = put_model(mjm, dtype=jnp.float64)
  d0 = make_data(m, dtype=jnp.float64)
  rng = np.random.default_rng(4)
  qv = jnp.asarray(0.3 * rng.standard_normal(m.nv), jnp.float64)
  d0 = d0.replace(qvel=qv)

  # clustered (production) qacc
  d_c = fwd.forward(m, d0)

  # unrolled reference: same model with clustering disabled
  orig = coll.contact_clusters
  try:
    coll.contact_clusters = lambda mm: ([], [], [], [], [], set())
    jax.clear_caches()
    d_u = fwd.forward(m, d0)
  finally:
    coll.contact_clusters = orig
    jax.clear_caches()
  np.testing.assert_allclose(np.asarray(d_c.qacc), np.asarray(d_u.qacc),
                             rtol=1e-9, atol=1e-9)


def _chamfered(half, cham):
  from mujoco_mpc_tpu.models.hands import _chamfered_cube_vertices
  return _chamfered_cube_vertices(half, cham)
