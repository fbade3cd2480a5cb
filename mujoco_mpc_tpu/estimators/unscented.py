"""Unscented Kalman filter.

TPU-native re-design of the reference Unscented estimator
(/root/reference/mjpc/estimators/unscented.cc): 2*ndx+1 sigma points with
alpha=1, beta=2 weights (unscented.h:153-155), propagated through the full
nonlinear step as ONE vmap (the reference steps them serially), joint
state-sensor covariance update, and quaternion-manifold means computed in
the tangent space of the center point (the reference iteratively averages
quaternions; tangent-mean agrees to first order and is branch-free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators import base
from mujoco_mpc_tpu.ops import linalg
from mujoco_mpc_tpu.physics.model import Data, Model

ALPHA = 1.0
BETA = 2.0


def _weights(nd: int, dtype):
  lam = ALPHA * ALPHA * nd - nd
  n_lam = nd + lam
  wm0 = lam / n_lam
  wc0 = lam / n_lam + (1.0 - ALPHA * ALPHA + BETA)
  ws = 1.0 / (2.0 * n_lam)
  return (jnp.asarray(wm0, dtype), jnp.asarray(wc0, dtype),
          jnp.asarray(ws, dtype), jnp.asarray(n_lam, dtype))


def update(m: Model, template: Data, state: base.EstimatorState,
           ctrl: jax.Array, sensor: jax.Array,
           sensor_slice=None) -> base.EstimatorState:
  """Joint UKF update over one control period."""
  nd = base.ndx(m)
  dtype = state.qpos.dtype
  wm0, wc0, ws, n_lam = _weights(nd, dtype)

  # sigma-point deltas: 0, ±sqrt((n+lam) P) columns
  chol = linalg.chol_factor(state.covariance * n_lam)
  deltas = jnp.concatenate(
      [jnp.zeros((1, nd), dtype=dtype), chol.T, -chol.T])  # (2nd+1, nd)

  def propagate(dx):
    qp, qv, a = base.perturb(m, state.qpos, state.qvel, state.act, dx)
    y = base.measure(m, template, qp, qv, a, state.time, ctrl, sensor_slice)
    qp2, qv2, a2, t2 = base.predict(m, template, qp, qv, a, state.time,
                                    ctrl)
    return qp2, qv2, a2, t2, y

  qp_s, qv_s, a_s, t_s, y_s = jax.vmap(propagate)(deltas)

  # means in the tangent space of the center sigma point
  def diff_to_center(qp, qv, a):
    return base.difference(m, qp_s[0], qv_s[0], a_s[0], qp, qv, a)

  dx_s = jax.vmap(diff_to_center)(qp_s, qv_s, a_s)   # (2nd+1, nd)
  wm = jnp.concatenate([wm0[None], jnp.full((2 * nd,), ws, dtype)])
  wc = jnp.concatenate([wc0[None], jnp.full((2 * nd,), ws, dtype)])

  dx_mean = jnp.einsum('s,sd->d', wm, dx_s)
  y_mean = jnp.einsum('s,sy->y', wm, y_s)

  # covariances about the means
  dxc = dx_s - dx_mean[None]
  dyc = y_s - y_mean[None]
  pxx = jnp.einsum('s,sd,se->de', wc, dxc, dxc) + jnp.diag(
      state.noise_process)
  pxy = jnp.einsum('s,sd,sy->dy', wc, dxc, dyc)
  pyy = jnp.einsum('s,sy,sz->yz', wc, dyc, dyc) + jnp.diag(
      state.noise_sensor)

  # gain and correction
  chol_y = linalg.chol_factor(pyy)
  gain = linalg.chol_solve(chol_y, pxy)          # (nd, ns) = Pxy Pyy^-1
  innovation = sensor - y_mean
  dx = dx_mean + gain @ innovation

  qp_new, qv_new, a_new = base.perturb(m, qp_s[0], qv_s[0], a_s[0], dx)
  p_new = pxx - gain @ pyy @ gain.T
  p_new = 0.5 * (p_new + p_new.T)

  return state.replace(qpos=qp_new, qvel=qv_new, act=a_new, time=t_s[0],
                       covariance=p_new)
