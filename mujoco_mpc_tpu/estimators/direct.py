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
here per-step Jacobian blocks come from a vmapped jacfwd over each step's
3*nv-wide stencil and the damped Gauss-Newton normal equations are solved
with a block-pentadiagonal Cholesky (ops/banded.py) — O(T nv^3) instead of
a dense O((T nv)^3) factor, with each block op an MXU matmul.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import banded
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
         z_prior: Optional[jax.Array] = None,
         prior_diag: Optional[jax.Array] = None,
         prior_off1: Optional[jax.Array] = None) -> jax.Array:
  r = residuals(p, data, z, settings)
  c = 0.5 * jnp.sum(r * r)
  if z_prior is not None:
    dz = z - z_prior
    if prior_diag is not None:
      # band-structured prior 0.5 dz' P dz (reference batch.h:162
      # weight_prior_, block-tridiagonal after DenseToBlockBand)
      nv = p.model.nv
      dzb = dz.reshape(p.horizon, nv)
      c = c + 0.5 * jnp.einsum('ti,tij,tj->', dzb, prior_diag, dzb)
      c = c + jnp.einsum('ti,tij,tj->', dzb[1:], prior_off1, dzb[:-1])
    else:
      c = c + 0.5 * settings.prior_weight * jnp.sum(dz * dz)
  return c


def _residual_triple(p: DirectProblem, z3: jax.Array, qref3: jax.Array,
                     y: jax.Array, tau: jax.Array, h: jax.Array,
                     settings: DirectSettings) -> jax.Array:
  """Residual at one interior step from its 3-configuration stencil
  (q_{t-1}, q_t, q_{t+1}); the locality that makes the Hessian banded
  (reference: direct.cc band assembly, nband = 3*nv)."""
  m = p.model
  qs = jax.vmap(lambda q, dz: fwd.integrate_pos(m, q, dz, 1.0))(
      qref3, z3.reshape(3, m.nv))
  v_t = support.state_diff(m, qs[0], qs[1]) / h
  v_n = support.state_diff(m, qs[1], qs[2]) / h
  a_t = (v_n - v_t) / h
  d = p.template.replace(qpos=qs[1], qvel=v_t, qacc=a_t)
  d = inv_mod.inverse(m, d)
  sd = sensors_mod.sensordata(m, d)
  s = jax.lax.dynamic_slice(sd, (p.sensor_start,), (p.sensor_dim,))
  r_sensor = jnp.sqrt(settings.sensor_weight) * (s - y)
  r_force = jnp.sqrt(settings.force_weight) * (d.qfrc_smooth - tau)
  return jnp.concatenate([r_sensor, r_force])


def _banded_normal_equations(p: DirectProblem, data: DirectData,
                             z: jax.Array, settings: DirectSettings):
  """Per-step Jacobian blocks -> block-pentadiagonal Gauss-Newton system.

  Each interior residual touches only (z_{t-1}, z_t, z_{t+1}), so jacfwd
  is over a 3*nv stencil (T-times cheaper than the whole window) and
  J^T J has bandwidth 2 blocks — the structure the reference exploits with
  mju_cholFactorBand (direct.cc:2372)."""
  m = p.model
  nv = m.nv
  T = p.horizon
  h = data.times[1] - data.times[0]

  def r_of(z3, qref3, y, tau):
    return _residual_triple(p, z3, qref3, y, tau, h, settings)

  z_blocks = z.reshape(T, nv)
  z3 = jnp.stack([z_blocks[:-2], z_blocks[1:-1], z_blocks[2:]],
                 axis=1).reshape(T - 2, 3 * nv)
  qref3 = jnp.stack([data.qpos_ref[:-2], data.qpos_ref[1:-1],
                     data.qpos_ref[2:]], axis=1)

  r, jac = jax.vmap(
      lambda zz, qq, y, tau: (r_of(zz, qq, y, tau),
                              jax.jacfwd(r_of)(zz, qq, y, tau)))(
      z3, qref3, data.sensor_meas[1:-1], data.force_meas[1:-1])
  # jac: (Ti, nr, 3*nv) -> per-stencil block products (Ti, 3, 3, nv, nv)
  ti = T - 2
  jb = jac.reshape(ti, -1, 3, nv)
  prod = jnp.einsum('tikm,tiln->tklmn', jb, jb)
  gt = jnp.einsum('tikm,ti->tkm', jb, r)            # (Ti, 3, nv)

  dtype = z.dtype
  diag = jnp.zeros((T, nv, nv), dtype=dtype)
  off1 = jnp.zeros((T - 1, nv, nv), dtype=dtype)
  off2 = jnp.zeros((T - 2, nv, nv), dtype=dtype)
  g = jnp.zeros((T, nv), dtype=dtype)
  for k in range(3):  # stencil offset k contributes at block i + k
    diag = diag.at[k:k + ti].add(prod[:, k, k])
    g = g.at[k:k + ti].add(gt[:, k])
  # off1[j] (block j+1, j): (k=2, l=1) lands at j = i+1; (k=1, l=0) at j = i
  off1 = off1.at[1:1 + ti].add(prod[:, 2, 1])
  off1 = off1.at[0:ti].add(prod[:, 1, 0])
  # off2[j] (block j+2, j): (k=2, l=0) lands at j = i
  off2 = off2.at[0:ti].add(prod[:, 2, 0])
  return diag, off1, off2, g


def optimize(p: DirectProblem, data: DirectData, settings: DirectSettings,
             z0: Optional[jax.Array] = None,
             z_prior: Optional[jax.Array] = None,
             prior_diag: Optional[jax.Array] = None,
             prior_off1: Optional[jax.Array] = None) -> Tuple[jax.Array,
                                                              dict]:
  """Damped Gauss-Newton over the window (reference: Direct::Optimize)."""
  m = p.model
  nv = m.nv
  T = p.horizon
  n = T * nv
  dtype = data.qpos_ref.dtype
  if z0 is None:
    z0 = jnp.zeros(n, dtype=dtype)
  eye = jnp.eye(nv, dtype=dtype)

  def gn_step(carry, _):
    z, lam = carry
    diag, off1, off2, g = _banded_normal_equations(p, data, z, settings)
    gb = g.reshape(T, nv)
    if z_prior is not None:
      dzb = (z - z_prior).reshape(T, nv)
      if prior_diag is not None:
        gb = gb + jnp.einsum('tij,tj->ti', prior_diag, dzb)
        gb = gb.at[1:].add(jnp.einsum('tij,tj->ti', prior_off1, dzb[:-1]))
        gb = gb.at[:-1].add(
            jnp.einsum('tji,tj->ti', prior_off1, dzb[1:]))
        diag = diag + prior_diag
        off1 = off1 + prior_off1
      else:
        gb = gb + settings.prior_weight * dzb
        diag = diag + settings.prior_weight * eye
    diag = diag + lam * eye

    # pad the window to an even block count for superblocking
    if T % 2:
      diag_p = jnp.concatenate([diag, eye[None]], axis=0)
      off1_p = jnp.concatenate(
          [off1, jnp.zeros((1, nv, nv), dtype=dtype)], axis=0)
      off2_p = jnp.concatenate(
          [off2, jnp.zeros((1, nv, nv), dtype=dtype)], axis=0)
      gb_p = jnp.concatenate([gb, jnp.zeros((1, nv), dtype=dtype)], axis=0)
      step = banded.block_pentadiag_solve(diag_p, off1_p, off2_p,
                                          gb_p)[:-1].reshape(-1)
    else:
      step = banded.block_pentadiag_solve(diag, off1, off2, gb).reshape(-1)

    def cost_of(zz):
      return cost(p, data, zz, settings, z_prior, prior_diag, prior_off1)

    c0 = cost_of(z)
    alphas = jnp.array([1.0, 0.5, 0.25, 0.0625, 0.0], dtype=dtype)
    cands = z[None] - alphas[:, None] * step[None]
    # a failed (non-SPD under float32) factor yields NaN candidates: treat
    # them as infinite cost so the LM escalation below retries with more
    # damping (the reference's regularization escalation, direct.cc:2210)
    costs = jnp.nan_to_num(jax.vmap(cost_of)(cands), nan=jnp.inf)
    best = jnp.argmin(costs)
    improved = costs[best] < c0
    z_new = jnp.where(improved, cands[best], z)
    # Levenberg-Marquardt damping schedule
    lam_new = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-10), lam * 10.0)
    return (z_new, lam_new), jnp.where(improved, costs[best], c0)

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


# ---------------------------------------------------------------------------
# Model-parameter estimation (reference: mjpc/direct/model_parameters.{h,cc}
# pluggable ModelParameters hooks; direct.cc ntotal = nv*T + nparam with the
# parameter columns as a dense border of the band matrix).
# ---------------------------------------------------------------------------


class ParameterModel(NamedTuple):
  """Pluggable parameter hook: theta -> modified Model (pure)."""
  apply: 'Callable[[Model, jax.Array], Model]'
  nparam: int


def damping_parameter_model(nv: int) -> ParameterModel:
  """theta scales joint damping (reference ModelParameterTest0 analog)."""
  def apply(m: Model, theta: jax.Array) -> Model:
    return m.replace(dof_damping=m.dof_damping * jnp.exp(theta[0]))
  return ParameterModel(apply=apply, nparam=1)


def site_offset_parameter_model(site_id: int) -> ParameterModel:
  """theta offsets one site position (reference ModelParameterTest1)."""
  def apply(m: Model, theta: jax.Array) -> Model:
    return m.replace(site_pos=m.site_pos.at[site_id].add(theta))
  return ParameterModel(apply=apply, nparam=3)


def optimize_joint(p: DirectProblem, data: DirectData,
                   settings: DirectSettings, pmodel: ParameterModel,
                   theta0: jax.Array, z0: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array, dict]:
  """Joint Gauss-Newton over (configurations z, model parameters theta).

  The GN system is bordered-banded: the banded configuration block is
  solved with the block-pentadiagonal Cholesky and the dense parameter
  border is eliminated by a Schur complement (the reference folds the
  border into one band matrix of width 3*nv + nparam, direct.cc:135-136).
  """
  m = p.model
  nv, T = m.nv, p.horizon
  np_ = pmodel.nparam
  dtype = data.qpos_ref.dtype
  if z0 is None:
    z0 = jnp.zeros(T * nv, dtype=dtype)
  eye = jnp.eye(nv, dtype=dtype)
  h = data.times[1] - data.times[0]

  def r_of(z3, theta, qref3, y, tau):
    p_theta = p._replace(model=pmodel.apply(p.model, theta))
    return _residual_triple(p_theta, z3, qref3, y, tau, h, settings)

  def joint_cost(z, theta):
    p_theta = p._replace(model=pmodel.apply(p.model, theta))
    return cost(p_theta, data, z, settings)

  def gn_step(carry, _):
    z, theta, lam = carry
    z_blocks = z.reshape(T, nv)
    z3 = jnp.stack([z_blocks[:-2], z_blocks[1:-1], z_blocks[2:]],
                   axis=1).reshape(T - 2, 3 * nv)
    qref3 = jnp.stack([data.qpos_ref[:-2], data.qpos_ref[1:-1],
                       data.qpos_ref[2:]], axis=1)

    def per_step(zz, qq, y, tau):
      r = r_of(zz, theta, qq, y, tau)
      jz = jax.jacfwd(r_of, argnums=0)(zz, theta, qq, y, tau)
      jt = jax.jacfwd(r_of, argnums=1)(zz, theta, qq, y, tau)
      return r, jz, jt

    r, jz, jt = jax.vmap(per_step)(z3, qref3, data.sensor_meas[1:-1],
                                   data.force_meas[1:-1])
    ti = T - 2
    jb = jz.reshape(ti, -1, 3, nv)
    prod = jnp.einsum('tikm,tiln->tklmn', jb, jb)
    gt = jnp.einsum('tikm,ti->tkm', jb, r)
    ub = jnp.einsum('tikm,tip->tkmp', jb, jt)        # (Ti, 3, nv, np)

    diag = jnp.zeros((T, nv, nv), dtype=dtype)
    off1 = jnp.zeros((T - 1, nv, nv), dtype=dtype)
    off2 = jnp.zeros((T - 2, nv, nv), dtype=dtype)
    g = jnp.zeros((T, nv), dtype=dtype)
    u = jnp.zeros((T, nv, np_), dtype=dtype)
    for k in range(3):
      diag = diag.at[k:k + ti].add(prod[:, k, k])
      g = g.at[k:k + ti].add(gt[:, k])
      u = u.at[k:k + ti].add(ub[:, k])
    off1 = off1.at[1:1 + ti].add(prod[:, 2, 1])
    off1 = off1.at[0:ti].add(prod[:, 1, 0])
    off2 = off2.at[0:ti].add(prod[:, 2, 0])
    c_mat = jnp.einsum('tip,tiq->pq', jt, jt) + lam * jnp.eye(np_,
                                                              dtype=dtype)
    g_theta = jnp.einsum('tip,ti->p', jt, r)
    diag = diag + lam * eye

    # pad to an even block count
    if T % 2:
      diag = jnp.concatenate([diag, eye[None]], axis=0)
      off1 = jnp.concatenate([off1, jnp.zeros((1, nv, nv), dtype=dtype)], 0)
      off2 = jnp.concatenate([off2, jnp.zeros((1, nv, nv), dtype=dtype)], 0)
      g = jnp.concatenate([g, jnp.zeros((1, nv), dtype=dtype)], axis=0)
      u = jnp.concatenate([u, jnp.zeros((1, nv, np_), dtype=dtype)], 0)
    tp = diag.shape[0]

    sd, sl = banded.pentadiag_to_superblocks(diag, off1, off2)
    ld, ll = banded.block_tridiag_cholesky(sd, sl)

    def band_solve(rhs):  # rhs (Tp, nv)
      return banded.block_tridiag_solve(ld, ll,
                                        rhs.reshape(tp // 2, 2 * nv)
                                        ).reshape(tp, nv)

    y_sol = band_solve(g)
    w_sol = jax.vmap(band_solve, in_axes=-1, out_axes=-1)(u)  # (Tp, nv, np)
    schur = c_mat - jnp.einsum('tnp,tnq->pq', u, w_sol)
    rhs_theta = g_theta - jnp.einsum('tnp,tn->p', u, y_sol)
    dtheta = jnp.linalg.solve(schur, rhs_theta)
    dz = (y_sol - w_sol @ dtheta)[:T].reshape(-1)

    c0 = joint_cost(z, theta)
    alphas = jnp.array([1.0, 0.5, 0.25, 0.0625, 0.0], dtype=dtype)
    cz = z[None] - alphas[:, None] * dz[None]
    ct = theta[None] - alphas[:, None] * dtheta[None]
    costs = jnp.nan_to_num(jax.vmap(joint_cost)(cz, ct), nan=jnp.inf)
    best = jnp.argmin(costs)
    improved = costs[best] < c0
    z_new = jnp.where(improved, cz[best], z)
    theta_new = jnp.where(improved, ct[best], theta)
    lam_new = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-10), lam * 10.0)
    return (z_new, theta_new, lam_new), jnp.where(improved, costs[best], c0)

  (z, theta, _), cost_trace = jax.lax.scan(
      gn_step, (z0, theta0, jnp.asarray(settings.regularization, dtype)),
      None, length=settings.max_iterations)
  info = {'final_cost': cost_trace[-1], 'cost_trace': cost_trace}
  return z, theta, info
