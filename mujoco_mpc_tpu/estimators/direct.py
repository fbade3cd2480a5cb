"""Direct trajectory optimizer: estimation over a configuration window.

TPU-native re-design of the reference Direct optimizer
(/root/reference/mjpc/direct/direct.{h,cc}; docs/DIRECT.md). Decision
variables are tangent displacements z_{0:T-1} of the window configurations
(quaternion manifold handled by integrate_pos), minimizing

    sum_t || s(q_t, v_t, a_t) - y_t ||^2_{W_s}   (sensor cost)
  + sum_t || g(q_t, v_t, a_t) - tau_t ||^2_{W_f} (force cost, mj_inverse)
  [+ 0.5 || z - z_prior ||^2_P ]                 (Batch prior)

with v/a by finite differences on the manifold (direct.cc:1863) and g by
inverse dynamics. The reference assembles analytic band Jacobians per step
over a ThreadPool and runs band-Cholesky Gauss-Newton (direct.cc:2372);
here the full residual Jacobian comes from one jacfwd (vmapped over the
window) and the damped Gauss-Newton normal equations are solved densely —
window sizes are <= 64 (batch.h:35), so the (T nv)^2 solve is small; the
band structure is an optimization hook for a Pallas blocked solver.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import inverse as inv_mod
from mujoco_mpc_tpu.physics import sensors as sensors_mod
from mujoco_mpc_tpu.physics import support
from mujoco_mpc_tpu.physics.model import Data, Model


class DirectProblem(NamedTuple):
  """Static problem definition."""
  model: Model
  template: Data
  horizon: int               # T
  sensor_start: int          # index into sensordata
  sensor_dim: int


@struct.dataclass
class DirectData:
  """Window measurements (time-major)."""
  qpos_ref: jax.Array     # (T, nq) reference configurations (initial guess)
  sensor_meas: jax.Array  # (T, ns)
  force_meas: jax.Array   # (T, nv) applied generalized forces tau
  times: jax.Array        # (T,)


@struct.dataclass
class DirectSettings:
  sensor_weight: jax.Array   # (ns,) 1/sigma^2
  force_weight: jax.Array    # (nv,)
  prior_weight: jax.Array    # scalar (0 disables the Batch prior)
  max_iterations: int = struct.field(pytree_node=False, default=10)
  regularization: float = struct.field(pytree_node=False, default=1e-6)


def default_settings(p: DirectProblem, dtype=jnp.float32) -> DirectSettings:
  return DirectSettings(
      sensor_weight=jnp.ones(p.sensor_dim, dtype=dtype),
      force_weight=jnp.ones(p.model.nv, dtype=dtype),
      prior_weight=jnp.zeros((), dtype=dtype))


def _configs(p: DirectProblem, data: DirectData, z: jax.Array) -> jax.Array:
  """Window configurations from tangent displacements (T, nv) -> (T, nq)."""
  return jax.vmap(lambda q, dz: fwd.integrate_pos(p.model, q, dz, 1.0))(
      data.qpos_ref, z.reshape(p.horizon, p.model.nv))


def _vel_acc(p: DirectProblem, qpos: jax.Array, h: jax.Array):
  """Finite-difference velocities/accelerations on the manifold
  (direct.cc:1863: v_t = (q_t - q_{t-1})/h, a_t = (v_{t+1} - v_t)/h)."""
  m = p.model
  vel = jax.vmap(lambda qa, qb: support.state_diff(m, qa, qb))(
      qpos[:-1], qpos[1:]) / h                       # (T-1, nv) => v_{1:T-1}
  acc = (vel[1:] - vel[:-1]) / h                     # (T-2, nv) => a_{1:T-2}
  return vel, acc


def residuals(p: DirectProblem, data: DirectData, z: jax.Array,
              settings: DirectSettings) -> jax.Array:
  """Stacked weighted residual vector over the interior of the window.

  Sensor and force residuals are evaluated at t = 1..T-2 where both v and a
  are defined (the reference does the same, direct.cc sensor/force loops).
  """
  m = p.model
  h = data.times[1] - data.times[0]
  qpos = _configs(p, data, z)
  vel, acc = _vel_acc(p, qpos, h)

  def at(qt, vt, at_, yt, taut):
    d = p.template.replace(qpos=qt, qvel=vt, qacc=at_)
    d = inv_mod.inverse(m, d)
    sd = sensors_mod.sensordata(m, d)
    s = jax.lax.dynamic_slice(sd, (p.sensor_start,), (p.sensor_dim,))
    r_sensor = jnp.sqrt(settings.sensor_weight) * (s - yt)
    r_force = jnp.sqrt(settings.force_weight) * (d.qfrc_smooth - taut)
    return jnp.concatenate([r_sensor, r_force])

  r = jax.vmap(at)(qpos[1:-1], vel[:-1], acc, data.sensor_meas[1:-1],
                   data.force_meas[1:-1])
  return r.reshape(-1)


def cost(p: DirectProblem, data: DirectData, z: jax.Array,
         settings: DirectSettings,
         z_prior: Optional[jax.Array] = None) -> jax.Array:
  r = residuals(p, data, z, settings)
  c = 0.5 * jnp.sum(r * r)
  if z_prior is not None:
    dz = z - z_prior
    c = c + 0.5 * settings.prior_weight * jnp.sum(dz * dz)
  return c


def optimize(p: DirectProblem, data: DirectData, settings: DirectSettings,
             z0: Optional[jax.Array] = None,
             z_prior: Optional[jax.Array] = None) -> Tuple[jax.Array, dict]:
  """Damped Gauss-Newton over the window (reference: Direct::Optimize)."""
  m = p.model
  n = p.horizon * m.nv
  dtype = data.qpos_ref.dtype
  if z0 is None:
    z0 = jnp.zeros(n, dtype=dtype)

  def gn_step(carry, _):
    z, lam = carry
    r = residuals(p, data, z, settings)
    jac = jax.jacfwd(lambda zz: residuals(p, data, zz, settings))(z)
    g = jac.T @ r
    hess = jac.T @ jac
    if z_prior is not None:
      g = g + settings.prior_weight * (z - z_prior)
      hess = hess + settings.prior_weight * jnp.eye(n, dtype=dtype)
    hess = hess + lam * jnp.eye(n, dtype=dtype)
    step = jnp.linalg.solve(hess, g)

    def cost_of(zz):
      return cost(p, data, zz, settings, z_prior)

    c0 = cost_of(z)
    alphas = jnp.array([1.0, 0.5, 0.25, 0.0625, 0.0], dtype=dtype)
    cands = z[None] - alphas[:, None] * step[None]
    costs = jax.vmap(cost_of)(cands)
    best = jnp.argmin(costs)
    improved = costs[best] < c0
    z_new = jnp.where(improved, cands[best], z)
    # Levenberg-Marquardt damping schedule
    lam_new = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-10), lam * 10.0)
    return (z_new, lam_new), costs[best]

  (z, _), cost_trace = jax.lax.scan(
      gn_step, (z0, jnp.asarray(settings.regularization, dtype)), None,
      length=settings.max_iterations)
  qpos = _configs(p, data, z)
  info = {'final_cost': cost_trace[-1], 'cost_trace': cost_trace,
          'qpos': qpos}
  return z, info


def make_problem(model: Model, template: Data, horizon: int,
                 sensor_start_index: int = 0,
                 sensor_count: Optional[int] = None) -> DirectProblem:
  """Build a problem over a model sensor range (estimator_sensor_start
  convention from the task XMLs)."""
  nsensor = len(model.sensor_type)
  if sensor_count is None:
    sensor_count = nsensor - sensor_start_index
  adr0 = model.sensor_adr[sensor_start_index]
  last = sensor_start_index + sensor_count - 1
  dim = model.sensor_adr[last] + model.sensor_dim[last] - adr0
  return DirectProblem(model=model, template=template, horizon=horizon,
                       sensor_start=adr0, sensor_dim=dim)
