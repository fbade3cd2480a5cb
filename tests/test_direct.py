"""Direct optimizer tests: inverse dynamics golden vs mujoco, window
smoothing recovers a true trajectory from noisy measurements (model:
reference test/direct/direct_optimize_test.cc pattern)."""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators import batch as batch_mod
from mujoco_mpc_tpu.estimators import direct as direct_mod
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import inverse as inv_mod
from mujoco_mpc_tpu.physics import sensors as sensors_mod
from mujoco_mpc_tpu.physics.model import load_model, make_data, put_model

DTYPE = jnp.float64

XML = """
<mujoco>
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="h1" type="hinge" axis="0 1 0" damping="0.03"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0" mass="0.5"/>
    </body>
  </worldbody>
  <actuator><motor joint="h1" gear="1"/></actuator>
  <sensor>
    <jointpos name="jp" joint="h1"/>
    <jointvel name="jv" joint="h1"/>
  </sensor>
</mujoco>
"""


def test_inverse_dynamics_golden():
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] = rng.standard_normal(mjm.nq) * 0.3
  mjd.qvel[:] = rng.standard_normal(mjm.nv) * 0.4
  mjd.qacc[:] = rng.standard_normal(mjm.nv) * 1.5
  mujoco.mj_inverse(mjm, mjd)

  m = put_model(mjm, dtype=DTYPE)
  d = make_data(m, dtype=DTYPE)
  d = d.replace(qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel),
                qacc=jnp.array(mjd.qacc))
  d = inv_mod.inverse(m, d)
  np.testing.assert_allclose(d.qfrc_smooth, mjd.qfrc_inverse, atol=1e-9)


def _simulate_window(model, template, horizon, noise, rng):
  d = template.replace(qpos=jnp.asarray([0.4]), qvel=jnp.asarray([-0.3]))
  step = jax.jit(lambda d: fwd.step(model, d))
  fwd_fn = jax.jit(lambda d: fwd.forward(model, d))
  sens = jax.jit(lambda d: sensors_mod.sensordata(model, d))
  qpos_true, meas, forces, times = [], [], [], []
  for t in range(horizon):
    u = 0.3 * np.sin(0.3 * t)
    d = d.replace(ctrl=jnp.asarray([u]))
    df = fwd_fn(d)
    qpos_true.append(np.asarray(d.qpos))
    meas.append(np.asarray(sens(df)) + noise * rng.standard_normal(2))
    forces.append([u])  # gear 1 motor: tau = u
    times.append(float(d.time))
    d = step(d)
  return (np.asarray(qpos_true), np.asarray(meas), np.asarray(forces),
          np.asarray(times))


def test_direct_optimize_recovers_trajectory():
  model, _ = load_model(xml_string=XML, dtype=DTYPE)
  template = make_data(model, dtype=DTYPE)
  horizon = 10
  rng = np.random.default_rng(3)
  qpos_true, meas, forces, times = _simulate_window(
      model, template, horizon, noise=0.01, rng=rng)

  p = direct_mod.make_problem(model, template, horizon)
  settings = direct_mod.default_settings(p, dtype=DTYPE).replace(
      sensor_weight=jnp.asarray([1e4, 1e2], dtype=DTYPE),
      force_weight=jnp.asarray([1e2], dtype=DTYPE))

  # initial guess: noisy measured positions
  qpos_ref = jnp.asarray(meas[:, :1])
  data = direct_mod.DirectData(
      qpos_ref=qpos_ref, sensor_meas=jnp.asarray(meas),
      force_meas=jnp.asarray(forces), times=jnp.asarray(times))

  z, info = jax.jit(lambda: direct_mod.optimize(p, data, settings))()
  qpos_est = np.asarray(info['qpos'])

  err_before = np.abs(meas[1:-1, 0] - qpos_true[1:-1, 0]).mean()
  err_after = np.abs(qpos_est[1:-1, 0] - qpos_true[1:-1, 0]).mean()
  # smoothing should beat the raw noisy measurements
  assert err_after < err_before, (err_after, err_before)
  assert float(info['cost_trace'][-1]) < float(info['cost_trace'][0])


def test_batch_estimator_tracks():
  model, _ = load_model(xml_string=XML, dtype=DTYPE)
  template = make_data(model, dtype=DTYPE)
  horizon = 6
  rng = np.random.default_rng(4)
  qpos_true, meas, forces, times = _simulate_window(
      model, template, 30, noise=0.005, rng=rng)

  p = direct_mod.make_problem(model, template, horizon)
  settings = direct_mod.default_settings(p, dtype=DTYPE).replace(
      sensor_weight=jnp.asarray([1e4, 1e2], dtype=DTYPE),
      force_weight=jnp.asarray([1e2], dtype=DTYPE),
      prior_weight=jnp.asarray(1e-3, dtype=DTYPE),
      max_iterations=4)
  state = batch_mod.init_state(p, dtype=DTYPE, scale_prior=1e-3)
  state = state.replace(times=jnp.asarray(times[:horizon]) - horizon * 0.01)

  upd = jax.jit(lambda st, y, f, t: batch_mod.update(
      p, st, settings, y, f, t, jnp.asarray(0.01, DTYPE)))

  for t in range(30):
    state, info = upd(state, jnp.asarray(meas[t]), jnp.asarray(forces[t]),
                      jnp.asarray(times[t], DTYPE))

  est = float(info['qpos_estimate'][0])
  true = float(qpos_true[-2, 0])
  assert abs(est - true) < 0.05, (est, true)
