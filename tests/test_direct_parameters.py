"""Direct model-parameter estimation (reference:
mjpc/test/direct/direct_parameter_test.cc: recover model parameters from
simulated sensor data) and the banded-vs-dense Gauss-Newton step."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.estimators import direct
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import sensors as sensors_mod
from mujoco_mpc_tpu.physics.model import load_model, make_data

_XML = """
<mujoco model="damped pendulum">
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="pole" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.35"/>
      <geom name="rod" type="capsule" size="0.02" fromto="0 0 0 0 0 -0.5"
            mass="1.0"/>
      <site name="tip" pos="0 0 -0.5"/>
    </body>
  </worldbody>
  <sensor>
    <jointpos name="angle" joint="hinge"/>
    <framepos name="tip_pos" objtype="site" objname="tip"/>
  </sensor>
</mujoco>
"""


def _simulate_window(m, T, damping_scale=1.0):
  """Ground-truth rollout with (optionally scaled) damping."""
  m_true = m.replace(dof_damping=m.dof_damping * damping_scale)
  d = make_data(m_true, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray([0.9], dtype=jnp.float64))

  qs, ss = [], []
  step = jax.jit(lambda d: fwd.step(m_true, d))
  for _ in range(T):
    df = fwd.forward(m_true, d)
    qs.append(np.array(df.qpos))
    ss.append(np.array(sensors_mod.sensordata(m_true, df)))
    d = step(d)
  return np.stack(qs), np.stack(ss)


def _make_problem_and_data(T=10):
  m, _ = load_model(xml_string=_XML, dtype=jnp.float64)
  qs, ss = _simulate_window(m, T, damping_scale=1.6)
  template = make_data(m, dtype=jnp.float64)
  p = direct.make_problem(m, template, horizon=T)
  h = float(m.opt.timestep)
  data = direct.DirectData(
      qpos_ref=jnp.asarray(qs),
      sensor_meas=jnp.asarray(ss),
      force_meas=jnp.zeros((T, m.nv), dtype=jnp.float64),
      times=jnp.arange(T, dtype=jnp.float64) * h)
  return m, p, data


def test_parameter_estimation_recovers_damping():
  m, p, data = _make_problem_and_data(T=12)
  settings = direct.default_settings(p, dtype=jnp.float64).replace(
      max_iterations=12)
  pmodel = direct.damping_parameter_model(m.nv)
  theta0 = jnp.zeros(1, dtype=jnp.float64)
  z, theta, info = direct.optimize_joint(p, data, settings, pmodel, theta0)
  # data was generated with damping * 1.6 -> theta should approach ln(1.6)
  assert np.isfinite(float(info['final_cost']))
  np.testing.assert_allclose(float(jnp.exp(theta[0])), 1.6, rtol=0.15)


def test_banded_gn_matches_dense_solution():
  """The banded normal-equation assembly solves the same system as the
  dense jacfwd construction."""
  m, p, data = _make_problem_and_data(T=8)
  settings = direct.default_settings(p, dtype=jnp.float64)
  rng = np.random.RandomState(0)
  z = jnp.asarray(rng.randn(8 * m.nv) * 0.01)

  diag, off1, off2, g = direct._banded_normal_equations(p, data, z, settings)

  r = direct.residuals(p, data, z, settings)
  jac = jax.jacfwd(lambda zz: direct.residuals(p, data, zz, settings))(z)
  g_dense = np.array(jac.T @ r)
  h_dense = np.array(jac.T @ jac)

  np.testing.assert_allclose(np.array(g).reshape(-1), g_dense, atol=1e-8)
  T, nv = 8, m.nv
  for t in range(T):
    np.testing.assert_allclose(
        np.array(diag[t]), h_dense[t*nv:(t+1)*nv, t*nv:(t+1)*nv], atol=1e-8)
  for t in range(T - 1):
    np.testing.assert_allclose(
        np.array(off1[t]), h_dense[(t+1)*nv:(t+2)*nv, t*nv:(t+1)*nv],
        atol=1e-8)
  for t in range(T - 2):
    np.testing.assert_allclose(
        np.array(off2[t]), h_dense[(t+2)*nv:(t+3)*nv, t*nv:(t+1)*nv],
        atol=1e-8)
