"""Elliptic friction-cone golden tests vs MuJoCo.

Reference tasks fingers / manipulation / quadruped-a1 / aloha set
<option cone="elliptic"/> (e.g. /root/reference/mjpc/tasks/fingers/
task.xml:4); these tests pin our cone-zone cost/force formulas and the
Newton solution to the C oracle (mj_constraintUpdate / mj_forward)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_mpc_tpu.ops import pallas_newton
from mujoco_mpc_tpu.physics import constraint, forward as fwd
from mujoco_mpc_tpu.physics.model import make_data, put_model

SPHERE_SLIDE = """
<mujoco>
  <option timestep="0.002" cone="elliptic"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" friction="0.7 0.02 0.003"/>
    <body pos="0.1 0.2 0.095">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1" condim="{condim}"
            friction="0.7 0.02 0.003"/>
    </body>
  </worldbody>
</mujoco>
"""

BOX_SLIDE = """
<mujoco>
  <option timestep="0.002" cone="elliptic"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" friction="0.5"/>
    <body pos="0 0 0.099">
      <freejoint/>
      <geom type="box" size="0.1 0.15 0.1" mass="2" friction="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""


def _setup(xml, qvel=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if qvel is not None:
    mjd.qvel[:] = qvel
  m = put_model(mjm, dtype=jnp.float64)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qvel=jnp.array(mjd.qvel))
  return mjm, mjd, m, d


def test_cone_cost_formulas_vs_oracle():
  """cone_cost / cone_grad reproduce mj_constraintUpdate exactly for
  probe jar vectors in every zone (satisfied / bottom / middle)."""
  mjm = mujoco.MjModel.from_xml_string(SPHERE_SLIDE.format(condim=6))
  mjd = mujoco.MjData(mjm)
  mjd.qvel[0] = 1.3
  mjd.qvel[5] = 2.0
  mujoco.mj_forward(mjm, mjd)
  assert mjd.nefc == 6 and mjd.ncon == 1
  d0 = jnp.asarray([mjd.efc_D[0]])
  fric = mjd.contact.friction[0]
  mu = jnp.asarray([fric[0]])
  s = jnp.asarray([[fric[1] / fric[0], fric[2] / fric[0],
                    fric[3] / fric[0], fric[4] / fric[0]]])
  s = jnp.concatenate([jnp.ones((1, 1)), s], axis=1)  # slide1 ratio = 1
  probes = [
      [1.0, 0, 0, 0, 0, 0],       # satisfied
      [-1.0, 0, 0, 0, 0, 0],      # bottom
      [-1.0, 0.3, 0.2, 0, 0, 0],  # bottom with tangent
      [-1.0, 0, 0, 5.0, 0, 0],    # bottom via torsion
      [-1.0, 2.0, 0, 0, 0, 0],    # middle
      [0.5, 2.0, -0.4, 0, 0, 0],  # middle, separating normal
      [-1.0, 0, 0, 100.0, 0, 0],  # middle via torsion
      [1.0, 1.1, 0.9, 30.0, 0, 0],
  ]
  c_ref = np.zeros(1)
  for jar in probes:
    jar_np = np.asarray(jar, dtype=np.float64)
    mujoco.mj_constraintUpdate(mjm, mjd, jar_np, c_ref, 0)
    ours = float(pallas_newton.cone_cost(jnp.asarray([jar_np]), d0, s, mu))
    np.testing.assert_allclose(ours, c_ref[0], rtol=1e-12, atol=1e-12,
                               err_msg=f'cost at jar={jar}')
    f_ref = mjd.efc_force[:6].copy()
    f_ours = -np.asarray(
        pallas_newton.cone_grad(jnp.asarray([jar_np]), d0, s, mu))[0]
    np.testing.assert_allclose(f_ours, f_ref, rtol=1e-10, atol=1e-12,
                               err_msg=f'force at jar={jar}')


def test_cone_hess_is_cost_curvature():
  """cone_hess == jacfwd(cone_grad) away from zone boundaries."""
  d0 = jnp.asarray([9.5])
  mu = jnp.asarray([0.7])
  s = jnp.asarray([[1.0, 1.0, 0.02 / 0.7, 0.003 / 0.7, 0.003 / 0.7]])
  for jar in [[-1.0, 0.3, 0.2, 3.0, 0, 0],      # bottom
              [-1.0, 2.0, -0.5, 40.0, 0, 0],    # middle
              [2.0, 0.1, 0, 0, 0, 0]]:          # satisfied
    jar_c = jnp.asarray([jar], dtype=jnp.float64)
    h_ana = pallas_newton.cone_hess(jar_c, d0, s, mu)[0]
    h_ad = jax.jacfwd(
        lambda x: pallas_newton.cone_grad(x[None], d0, s, mu)[0])(
            jar_c[0])
    np.testing.assert_allclose(h_ana, h_ad, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize('condim', [3, 4, 6])
def test_elliptic_qacc(condim):
  rng = np.random.default_rng(1)
  xml = SPHERE_SLIDE.format(condim=condim)
  mjm = mujoco.MjModel.from_xml_string(xml)
  for trial in range(3):
    qvel = 0.5 * rng.standard_normal(mjm.nv)
    mjm2, mjd, m, d = _setup(xml, qvel)
    mujoco.mj_forward(mjm2, mjd)
    d = fwd.forward(m, d)
    assert m.opt.cone == 1
    np.testing.assert_allclose(
        d.qacc, mjd.qacc, rtol=1e-5, atol=1e-6,
        err_msg=f'condim={condim} trial={trial} ncon={mjd.ncon} '
                f'state={mjd.efc_state[:mjd.nefc]}')


def test_elliptic_box_qacc():
  rng = np.random.default_rng(2)
  mjm = mujoco.MjModel.from_xml_string(BOX_SLIDE)
  qvel = 0.4 * rng.standard_normal(mjm.nv)
  mjm2, mjd, m, d = _setup(BOX_SLIDE, qvel)
  mujoco.mj_forward(mjm2, mjd)
  d = fwd.forward(m, d)
  np.testing.assert_allclose(d.qacc, mjd.qacc, rtol=1e-5, atol=1e-6,
                             err_msg=f'ncon={mjd.ncon}')


def test_elliptic_trajectory():
  """Sliding box decelerates identically to MuJoCo over 300 steps."""
  xml = BOX_SLIDE
  mjm, mjd, m, d = _setup(xml, qvel=[1.5, 0, 0, 0, 0, 0.5])
  step = jax.jit(lambda dd: fwd.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(d.qvel, mjd.qvel, rtol=1e-3, atol=1e-4)
  # friction actually dissipated the shove
  assert abs(float(d.qvel[0])) < 1.0


def test_elliptic_contact_forces_match_oracle():
  """Decoded contact-frame forces match efc_force rows (elliptic rows
  map 1:1 to force dims)."""
  xml = SPHERE_SLIDE.format(condim=6)
  mjm, mjd, m, d = _setup(xml, qvel=[1.0, 0, 0, 0, 0, 3.0])
  mujoco.mj_forward(mjm, mjd)
  d = fwd.forward(m, d)
  cf = constraint.contact_forces(m, d)
  assert cf is not None and cf.force6.shape[0] == 1
  # compare frame-invariant quantities: normal force, tangent magnitude,
  # torsional moment (our tangent basis may differ from MuJoCo's)
  f_ref = mjd.efc_force[:6]
  f = np.asarray(cf.force6[0])
  np.testing.assert_allclose(f[0], f_ref[0], rtol=1e-4, atol=1e-6)
  np.testing.assert_allclose(np.hypot(f[1], f[2]),
                             np.hypot(f_ref[1], f_ref[2]),
                             rtol=1e-4, atol=1e-6)
  np.testing.assert_allclose(abs(f[3]), abs(f_ref[3]), rtol=1e-4,
                             atol=1e-8)


def test_elliptic_jacfwd_tangent():
  """Frozen-zone implicit tangent vs central finite differences on a
  tightly-converged synthetic cone problem (middle + bottom zones).

  The full-forward FD comparison is inherently loose on SLIDING contacts
  (the exact solution map has one-sided derivatives at facet/zone
  boundaries and the solver stops at ~1e-8; the same ~1e-2 FD gap exists
  on the pyramidal path), so precision is asserted here on a solve run
  to tol 1e-13, strictly inside the zones."""
  key = jax.random.key(0)
  nv, nc = 5, 2
  ks = jax.random.split(key, 5)
  a = jax.random.normal(ks[0], (nv, nv), dtype=jnp.float64)
  qm = a @ a.T + 2.0 * jnp.eye(nv, dtype=jnp.float64)
  qs = jax.random.normal(ks[1], (nv,), dtype=jnp.float64)
  c_j = jax.random.normal(ks[2], (nc, 6, nv), dtype=jnp.float64)
  c_aref = jax.random.normal(ks[3], (nc, 6), dtype=jnp.float64)
  c_d0 = jax.nn.softplus(
      jax.random.normal(ks[4], (nc,), dtype=jnp.float64)) * 5
  c_mu = jnp.asarray([0.7, 0.5], dtype=jnp.float64)
  c_s = jnp.asarray([[1.0, 1.0, 0.1, 0.05, 0.05],
                     [1.0, 1.0, 0.0, 0.0, 0.0]], dtype=jnp.float64)
  z1 = jnp.zeros((0,), dtype=jnp.float64)
  z2 = jnp.zeros((0, nv), dtype=jnp.float64)
  newton = pallas_newton.make_newton((), (), 200, 1e-13)

  def qacc_of(qs_, c_aref_):
    return newton(qm, qs_, z2, z1, z1, z1, z1, z1, c_j, c_aref_, c_d0,
                  c_s, c_mu, z1, z1, z1)[0]

  # both cone zones are exercised at the solution
  q0 = qacc_of(qs, c_aref)
  jar = jnp.einsum('cdn,n->cd', c_j, q0) - c_aref
  _, _, _, bot, mid = pallas_newton._cone_parts(jar, c_s, c_mu)
  assert bool(jnp.any(mid))

  for argn, x0 in [(0, qs), (1, c_aref)]:
    f = (lambda x: qacc_of(x, c_aref)) if argn == 0 else \
        (lambda x: qacc_of(qs, x))
    jac = jax.jacfwd(f)(x0)
    flat0 = np.asarray(x0).ravel()
    jac2 = np.asarray(jac).reshape(nv, flat0.size)
    eps = 1e-6
    for i in range(flat0.size):
      dv = np.zeros(flat0.size)
      dv[i] = eps
      xp = jnp.asarray((flat0 + dv).reshape(np.asarray(x0).shape))
      xm = jnp.asarray((flat0 - dv).reshape(np.asarray(x0).shape))
      fd = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * eps)
      # atol = central-FD truncation floor at eps=1e-6
      np.testing.assert_allclose(jac2[:, i], fd, rtol=1e-4, atol=1e-5,
                                 err_msg=f'arg{argn} col{i}')


def test_elliptic_full_forward_jacfwd_loose():
  """Full-forward d qacc / d qvel vs FD on the real sliding model —
  loose band (see test_elliptic_jacfwd_tangent for why)."""
  xml = SPHERE_SLIDE.format(condim=3)
  mjm, mjd, m, d = _setup(xml, qvel=[1.0, 0.2, 0, 0, 0, 0])

  def qacc_of_qvel(qv):
    return fwd.forward(m, d.replace(qvel=qv)).qacc

  jac = np.asarray(jax.jacfwd(qacc_of_qvel)(d.qvel))
  eps = 1e-5
  qv0 = np.asarray(d.qvel)
  jac_fd = np.zeros((m.nv, m.nv))
  for i in range(m.nv):
    dq = np.zeros(m.nv)
    dq[i] = eps
    qp = np.asarray(qacc_of_qvel(jnp.asarray(qv0 + dq)))
    qm_ = np.asarray(qacc_of_qvel(jnp.asarray(qv0 - dq)))
    jac_fd[:, i] = (qp - qm_) / (2 * eps)
  scale = 1.0 + np.abs(jac_fd).max()
  assert np.abs(jac - jac_fd).max() / scale < 1e-3
