"""Extended Kalman filter.

TPU-native re-design of the reference Kalman estimator
(/root/reference/mjpc/estimators/kalman.cc). The reference builds sensor and
dynamics Jacobians with mjd_transitionFD and solves the gain with dense
Cholesky; here both Jacobians are exact (jacfwd in tangent coordinates,
quaternion manifold handled by perturb/difference) and the gain solve uses
the unrolled small-matrix Cholesky. The quaternion-manifold state correction
mirrors kalman.cc:250-254 (mj_integratePos with the correction velocity).

Update order matches Kalman::Update: measurement update at the current
state, then prediction step (kalman.cc:188-320).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.ops import linalg
from mujoco_mpc_tpu.physics.model import Data, Model


def update_measurement(m: Model, template: Data, state: base.EstimatorState,
                       ctrl: jax.Array, sensor: jax.Array,
                       sensor_slice=None) -> base.EstimatorState:
  nd = base.ndx(m)

  def h(dx):
    qp, qv, a = base.perturb(m, state.qpos, state.qvel, state.act, dx)
    return base.measure(m, template, qp, qv, a, state.time, ctrl,
                        sensor_slice)

  z = jnp.zeros(nd, dtype=state.qpos.dtype)
  pred = h(z)
  c = jax.jacfwd(h)(z)                      # (ns, nd)

  p = state.covariance
  s = c @ p @ c.T + jnp.diag(state.noise_sensor)
  # gain: K = P C' S^{-1} = (S^{-1} C P)'; chol_solve solves along the last
  # axis with leading batch dims, so feed (C P)' of shape (nd, ns)
  chol = linalg.chol_factor(s)
  gain = linalg.chol_solve(chol, (c @ p).T)  # (nd, ns)

  dx = gain @ (sensor - pred)
  qp, qv, a = base.perturb(m, state.qpos, state.qvel, state.act, dx)
  p_new = (jnp.eye(nd, dtype=p.dtype) - gain @ c) @ p
  p_new = 0.5 * (p_new + p_new.T)
  return state.replace(qpos=qp, qvel=qv, act=a, covariance=p_new)


def update_prediction(m: Model, template: Data, state: base.EstimatorState,
                      ctrl: jax.Array) -> base.EstimatorState:
  nd = base.ndx(m)

  qpos_n, qvel_n, act_n, time_n = base.predict(
      m, template, state.qpos, state.qvel, state.act, state.time, ctrl)

  def f(dx):
    qp, qv, a = base.perturb(m, state.qpos, state.qvel, state.act, dx)
    qp2, qv2, a2, _ = base.predict(m, template, qp, qv, a, state.time, ctrl)
    return base.difference(m, qpos_n, qvel_n, act_n, qp2, qv2, a2)

  a_jac = jax.jacfwd(f)(jnp.zeros(nd, dtype=state.qpos.dtype))
  p = a_jac @ state.covariance @ a_jac.T + jnp.diag(state.noise_process)
  p = 0.5 * (p + p.T)
  return state.replace(qpos=qpos_n, qvel=qvel_n, act=act_n, time=time_n,
                       covariance=p)


def update(m: Model, template: Data, state: base.EstimatorState,
           ctrl: jax.Array, sensor: jax.Array,
           sensor_slice=None) -> base.EstimatorState:
  """Full EKF update (measurement then prediction), one control period."""
  state = update_measurement(m, template, state, ctrl, sensor, sensor_slice)
  return update_prediction(m, template, state, ctrl)
