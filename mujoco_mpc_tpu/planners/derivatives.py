"""Trajectory derivatives: exact dynamics/residual Jacobians + GN cost expansion.

TPU-native replacement for the reference's finite-difference derivative stack
(/root/reference/mjpc/planners/model_derivatives.cc via mjd_transitionFD, and
cost_derivatives.cc). Instead of 2*(ndstate+nu) FD dynamics evaluations per
knot fanned over a ThreadPool — with skip+interpolation to afford it — we
compute exact Jacobians with jacfwd of the step function in tangent
coordinates and vmap over all time steps at once. Tangent state is
dx = (dq (nv), dqvel (nv), dact (na)) with dq on the configuration manifold
(quaternions handled by integrate_pos / state_diff).

Cost expansion is Gauss-Newton through the norm library's analytic
gradients/Hessians, with the exponential risk transform's exact chain rule
(reference: cost_derivatives.cc risk corrections).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import norms
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import support
from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.tasks.base import RISK_NEUTRAL_TOLERANCE, TaskParams, TaskSpec


class Trajectory(NamedTuple):
  """Nominal trajectory records (all with leading time axis T)."""
  qpos: jax.Array      # (T, nq)
  qvel: jax.Array      # (T, nv)
  act: jax.Array       # (T, na)
  time: jax.Array      # (T,)
  actions: jax.Array   # (T, nu)
  residuals: jax.Array  # (T, nres)
  costs: jax.Array     # (T,)


class Derivatives(NamedTuple):
  a: jax.Array     # (T-1, ndx, ndx) dynamics state Jacobians
  b: jax.Array     # (T-1, ndx, nu)  dynamics action Jacobians
  cx: jax.Array    # (T, ndx) cost state gradients
  cu: jax.Array    # (T, nu)  cost action gradients
  cxx: jax.Array   # (T, ndx, ndx) GN cost state Hessians
  cxu: jax.Array   # (T, ndx, nu)
  cuu: jax.Array   # (T, nu, nu)


def ndx(m: Model) -> int:
  return 2 * m.nv + m.na


def nominal_trajectory(spec: TaskSpec, d0: Data, actions: jax.Array,
                       params: TaskParams) -> Trajectory:
  """Roll out actions recording states/residuals/costs."""
  m = spec.model

  def body(carry, u):
    t, qp, qv, ac = carry
    # slim scan carry (rollout.py:44): only integrator state threads
    d = d0.replace(time=t, qpos=qp, qvel=qv, act=ac, ctrl=u)
    df = fwd.forward(m, d)
    d_next = fwd.integrate(m, df)
    res = spec.residual_fn(m, df, params.residual_params)
    rec = (qp, qv, ac, t, res)
    return (d_next.time, d_next.qpos, d_next.qvel, d_next.act), rec

  init = (d0.time, d0.qpos, d0.qvel, d0.act)
  _, (qpos, qvel, act, time, residuals) = jax.lax.scan(body, init, actions)
  costs = spec.cost(residuals, params)
  return Trajectory(qpos=qpos, qvel=qvel, act=act, time=time,
                    actions=actions, residuals=residuals, costs=costs)


def _perturbed_data(m: Model, template: Data, qpos, qvel, act, time, dx, du,
                    u):
  qp = fwd.integrate_pos(m, qpos, dx[:m.nv], 1.0)
  qv = qvel + dx[m.nv:2 * m.nv]
  a = act + dx[2 * m.nv:] if m.na else act
  return template.replace(qpos=qp, qvel=qv, act=a, time=time, ctrl=u + du)


def transition_derivs(spec: TaskSpec, template: Data,
                      traj: Trajectory) -> Tuple[jax.Array, jax.Array]:
  """Exact A (T-1, ndx, ndx) and B (T-1, ndx, nu) along the trajectory."""
  m = spec.model
  nv, na = m.nv, m.na
  nd = ndx(m)

  def step_tangent(qpos, qvel, act, time, u, qpos_next, qvel_next, act_next,
                   dxdu):
    dx, du = dxdu[:nd], dxdu[nd:]
    d = _perturbed_data(m, template, qpos, qvel, act, time, dx, du, u)
    d = fwd.step(m, d)
    out = [support.state_diff(m, qpos_next, d.qpos),
           d.qvel - qvel_next]
    if na:
      out.append(d.act - act_next)
    return jnp.concatenate(out)

  def derivs_at(qpos, qvel, act, time, u, qpos_next, qvel_next, act_next):
    z = jnp.zeros(nd + m.nu, dtype=qpos.dtype)
    jac = jax.jacfwd(lambda v: step_tangent(
        qpos, qvel, act, time, u, qpos_next, qvel_next, act_next, v))(z)
    return jac[:, :nd], jac[:, nd:]

  a, b = jax.vmap(derivs_at)(
      traj.qpos[:-1], traj.qvel[:-1], traj.act[:-1], traj.time[:-1],
      traj.actions[:-1], traj.qpos[1:], traj.qvel[1:], traj.act[1:])
  return a, b


def _risk_chain(spec: TaskSpec, params: TaskParams, residual: jax.Array,
                rx: jax.Array, ru: jax.Array):
  """Gauss-Newton cost expansion with exact risk-transform chain rule."""
  # per-term gradients/Hessians of s = sum_k w_k n_k(r_k)
  nd, nu = rx.shape[1], ru.shape[1]
  dtype = residual.dtype
  sx = jnp.zeros(nd, dtype=dtype)
  su = jnp.zeros(nu, dtype=dtype)
  sxx = jnp.zeros((nd, nd), dtype=dtype)
  sxu = jnp.zeros((nd, nu), dtype=dtype)
  suu = jnp.zeros((nu, nu), dtype=dtype)
  s = jnp.zeros((), dtype=dtype)
  offset = 0
  for k in range(spec.num_term):
    dim = spec.term_dims[k]
    r = jax.lax.slice_in_dim(residual, offset, offset + dim)
    jrx = jax.lax.slice_in_dim(rx, offset, offset + dim, axis=0)
    jru = jax.lax.slice_in_dim(ru, offset, offset + dim, axis=0)
    w = params.weights[k]
    p = params.norm_params[k]
    t = spec.norm_types[k]
    s = s + w * norms.norm_value(r, p, t)
    g = w * norms.norm_grad(r, p, t)      # (dim,)
    h = w * norms.norm_hess(r, p, t)      # (dim, dim)
    sx = sx + jrx.T @ g
    su = su + jru.T @ g
    sxx = sxx + jrx.T @ (h @ jrx)
    sxu = sxu + jrx.T @ (h @ jru)
    suu = suu + jru.T @ (h @ jru)
    offset += dim

  risk = params.risk
  neutral = jnp.abs(risk) < RISK_NEUTRAL_TOLERANCE
  rho = jnp.where(neutral, 0.0, risk)
  phi1 = jnp.exp(rho * s)             # phi' ; equals 1 when neutral
  phi2 = rho * phi1                    # phi''; equals 0 when neutral
  cx = phi1 * sx
  cu = phi1 * su
  cxx = phi1 * sxx + phi2 * jnp.outer(sx, sx)
  cxu = phi1 * sxu + phi2 * jnp.outer(sx, su)
  cuu = phi1 * suu + phi2 * jnp.outer(su, su)
  return cx, cu, cxx, cxu, cuu


def cost_derivs(spec: TaskSpec, template: Data, traj: Trajectory,
                params: TaskParams):
  """cx/cu/cxx/cxu/cuu along the trajectory (T, ...)."""
  m = spec.model
  nd = ndx(m)

  def residual_tangent(qpos, qvel, act, time, u, dxdu):
    dx, du = dxdu[:nd], dxdu[nd:]
    d = _perturbed_data(m, template, qpos, qvel, act, time, dx, du, u)
    d = fwd.forward(m, d)
    return spec.residual_fn(m, d, params.residual_params)

  def at(qpos, qvel, act, time, u, residual):
    z = jnp.zeros(nd + m.nu, dtype=qpos.dtype)
    jr = jax.jacfwd(lambda v: residual_tangent(qpos, qvel, act, time, u,
                                               v))(z)
    rx, ru = jr[:, :nd], jr[:, nd:]
    return _risk_chain(spec, params, residual, rx, ru)

  return jax.vmap(at)(traj.qpos, traj.qvel, traj.act, traj.time,
                      traj.actions, traj.residuals)


def compute(spec: TaskSpec, template: Data, traj: Trajectory,
            params: TaskParams) -> Derivatives:
  a, b = transition_derivs(spec, template, traj)
  cx, cu, cxx, cxu, cuu = cost_derivs(spec, template, traj, params)
  return Derivatives(a=a, b=b, cx=cx, cu=cu, cxx=cxx, cxu=cxu, cuu=cuu)


def spline_mapping(times: jax.Array, rollout_times: jax.Array,
                   interp: int) -> jax.Array:
  """Linear operator M (T, P): actions(t_j) = sum_p M[j,p] values[p]
  (per control channel). Reference: gradient/spline_mapping.cc — here it is
  one jacfwd of the (linear) spline sampler."""
  from mujoco_mpc_tpu.ops import spline as spline_mod
  p = times.shape[0]

  def act_of_values(v):
    return spline_mod.sample_many(times, v[:, None], rollout_times,
                                  interp)[:, 0]

  return jax.jacfwd(act_of_values)(jnp.zeros(p, dtype=times.dtype))
