"""Estimator tests: EKF and UKF track a simulated trajectory from noisy
partial observations (model: reference test/estimator/{kalman,unscented}
_test.cc pattern — simulate truth, feed noisy sensors, compare)."""

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators import base, kalman, unscented
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import sensors as sensors_mod
from mujoco_mpc_tpu.physics.model import load_model, make_data

XML = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="h1" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.4 0 0" mass="0.5"/>
      <body pos="0.4 0 0">
        <joint name="h2" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" size="0.035" fromto="0 0 0 0.3 0 0" mass="0.3"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="h1" gear="1"/></actuator>
  <sensor>
    <jointpos name="jp1" joint="h1"/>
    <jointpos name="jp2" joint="h2"/>
  </sensor>
</mujoco>
"""

DTYPE = jnp.float64


def _simulate(m, template, nsteps, rng):
  d = template.replace(qpos=jnp.asarray([0.3, -0.2]),
                       qvel=jnp.asarray([0.1, 0.0]))
  step = jax.jit(lambda d: fwd.step(m, d))
  fwd_fn = jax.jit(lambda d: fwd.forward(m, d))
  sens_fn = jax.jit(lambda d: sensors_mod.sensordata(m, d))
  truth, meas, ctrls = [], [], []
  for t in range(nsteps):
    u = 0.2 * np.sin(0.02 * t)
    d = d.replace(ctrl=jnp.asarray([u]))
    df = fwd_fn(d)
    y = np.asarray(sens_fn(df))
    truth.append((np.asarray(d.qpos), np.asarray(d.qvel)))
    meas.append(y + 0.001 * rng.standard_normal(y.shape))
    ctrls.append([u])
    d = step(d)
  return truth, np.asarray(meas), np.asarray(ctrls)


def _run_filter(update_fn, m, template, meas, ctrls):
  state = base.init_state(m, dtype=DTYPE, covariance_scale=1.0,
                          process_noise=1e-6, sensor_noise=1e-6)
  # deliberately wrong initial state
  state = state.replace(qpos=jnp.asarray([0.0, 0.0]),
                        qvel=jnp.asarray([0.0, 0.0]))
  upd = jax.jit(lambda s, u, y: update_fn(m, template, s, u, y))
  estimates = []
  for y, u in zip(meas, ctrls):
    state = upd(state, jnp.asarray(u), jnp.asarray(y))
    estimates.append(np.asarray(state.qpos))
  return np.asarray(estimates), state


def test_ekf_tracks_truth():
  model, _ = load_model(xml_string=XML, dtype=DTYPE)
  template = make_data(model, dtype=DTYPE)
  rng = np.random.default_rng(0)
  truth, meas, ctrls = _simulate(model, template, 100, rng)
  est, state = _run_filter(kalman.update, model, template, meas, ctrls)
  err_final = np.abs(est[-1] - truth[-1][0]).max()
  err_initial = np.abs(est[0] - truth[0][0]).max()
  # locks on immediately despite the wrong initial state...
  assert err_initial < 0.05, err_initial
  # ...and stays locked on through 100 chaotic double-pendulum steps
  assert err_final < 0.05, err_final
  # velocity also recovered reasonably
  assert np.abs(np.asarray(state.qvel) - truth[-1][1]).max() < 0.2


def test_ukf_tracks_truth():
  model, _ = load_model(xml_string=XML, dtype=DTYPE)
  template = make_data(model, dtype=DTYPE)
  rng = np.random.default_rng(1)
  truth, meas, ctrls = _simulate(model, template, 100, rng)
  est, state = _run_filter(unscented.update, model, template, meas, ctrls)
  err_final = np.abs(est[-1] - truth[-1][0]).max()
  assert err_final < 0.05, err_final


def test_ground_truth_estimator():
  model, _ = load_model(xml_string=XML, dtype=DTYPE)
  template = make_data(model, dtype=DTYPE)
  state = base.init_state(model, dtype=DTYPE)
  state = state.replace(qpos=jnp.asarray([0.3, -0.2]),
                        qvel=jnp.asarray([0.1, 0.0]))
  d = template.replace(qpos=state.qpos, qvel=state.qvel)
  for _ in range(10):
    state = base.ground_truth_update(model, template, state,
                                     jnp.asarray([0.1]))
    d = fwd.step(model, d.replace(ctrl=jnp.asarray([0.1])))
  np.testing.assert_allclose(state.qpos, d.qpos, atol=1e-12)


def test_batch_prior_marginalization_matches_dense_oracle():
  """Recursive prior update (reference batch_prior_test.cc math): the
  band-truncated Schur complement from marginalize_prior matches a dense
  linear-algebra oracle on a random block-banded SPD Hessian."""
  import numpy as np
  import jax.numpy as jnp
  from mujoco_mpc_tpu.estimators import batch as batch_mod

  rng = np.random.default_rng(0)
  T, nv = 4, 3
  n = T * nv
  # random SPD with block-pentadiagonal structure
  a = rng.standard_normal((n, n))
  h = a @ a.T + n * np.eye(n)
  for i in range(T):
    for j in range(T):
      if abs(i - j) > 2:
        h[i * nv:(i + 1) * nv, j * nv:(j + 1) * nv] = 0.0

  p_diag, p_off1 = batch_mod.marginalize_prior(
      jnp.asarray(h), nv, scale_prior=0.5, damping=0.0)

  # dense oracle: Schur complement removing the first nv variables
  hc = h[nv:, nv:] - h[nv:, :nv] @ np.linalg.solve(h[:nv, :nv],
                                                   h[:nv, nv:])
  for i in range(T - 1):
    np.testing.assert_allclose(np.asarray(p_diag[i]),
                               hc[i * nv:(i + 1) * nv, i * nv:(i + 1) * nv],
                               rtol=1e-5, atol=1e-8)
  for i in range(T - 2):
    np.testing.assert_allclose(
        np.asarray(p_off1[i]),
        hc[(i + 1) * nv:(i + 2) * nv, i * nv:(i + 1) * nv],
        rtol=1e-5, atol=1e-8)
  np.testing.assert_allclose(np.asarray(p_diag[T - 1]), 0.5 * np.eye(nv))


def test_batch_recursive_prior_update_runs():
  """Batch filter with the recursive band prior: updates run, estimates
  stay finite, and the prior matrix departs from the initial scalar*I."""
  import numpy as np
  import jax.numpy as jnp
  from mujoco_mpc_tpu.estimators import batch as batch_mod
  from mujoco_mpc_tpu.estimators import direct as direct_mod
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task('Cartpole')
  m = spec.model
  template = make_data(m)
  p = direct_mod.make_problem(m, template, 4)
  settings = direct_mod.default_settings(p).replace(
      max_iterations=3, prior_weight=jnp.asarray(0.1, jnp.float32))
  state = batch_mod.init_state(p, scale_prior=0.1)
  p0 = np.array(state.prior_diag)

  for i in range(3):
    sensor = 0.01 * np.ones(p.sensor_dim, np.float32)
    force = np.zeros(m.nv, np.float32)
    state, info = batch_mod.update(
        p, state, settings, jnp.asarray(sensor), jnp.asarray(force),
        jnp.asarray(0.01 * (i + 4), jnp.float32),
        jnp.asarray(0.01, jnp.float32), recursive_prior=True)
  assert np.all(np.isfinite(np.asarray(state.qpos_window)))
  assert np.all(np.isfinite(np.asarray(state.prior_diag)))
  # the prior absorbed measurement information (no longer scalar*I)
  assert np.abs(np.asarray(state.prior_diag)[0] - p0[0]).max() > 1e-3
