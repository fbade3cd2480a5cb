"""Forward dynamics pipeline and integrators.

The TPU-native analog of MuJoCo's mj_forward / mj_step as used by the
reference rollout engine (/root/reference/mjpc/trajectory.cc:141-180). The
whole pipeline is pure (Model, Data) -> Data, jit/vmap-able, with static
shapes, so `vmap(lax.scan(step))` replaces the reference's
ThreadPool-of-mjData rollout fan-out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import linalg  # noqa: F401 (unbatched fallback)
from mujoco_mpc_tpu.ops import pallas_linalg
from mujoco_mpc_tpu.physics import constraint
from mujoco_mpc_tpu.physics import fluid as fluid_mod
from mujoco_mpc_tpu.physics import kinematics as kin
from mujoco_mpc_tpu.physics import smooth
from mujoco_mpc_tpu.physics.model import Data, IntegratorType, JointType, Model
from mujoco_mpc_tpu.utils import tpu_math as tm


def _solve_m(qm: jax.Array, rhs: jax.Array) -> jax.Array:
  """Solve M x = rhs with dense Cholesky (M is SPD, nv x nv, small).

  Routed through the custom_vmap dispatcher: unbatched calls use the
  unrolled XLA path, vmapped rollouts the fused lane-batched Pallas kernel
  (measured: the unrolled path's ~nv^2 dispatched ops were +148 ms of the
  4096x36 quadruped rollout). custom_linear_solve keeps autodiff on the
  implicit-function rule instead of differentiating the kernel."""
  return jax.lax.custom_linear_solve(
      lambda v: qm @ v, rhs,
      solve=lambda _mv, b: pallas_linalg.solve_spd(qm, b),
      symmetric=True)


def fwd_position(m: Model, d: Data) -> Data:
  d = kin.kinematics(m, d)
  d = kin.com_pos(m, d)
  d = smooth.tendon(m, d)
  d = smooth.transmission(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  d = kin.com_vel(m, d)
  d = smooth.rne(m, d)
  d = smooth.passive(m, d)
  d = fluid_mod.fluid(m, d)
  return d


def fwd_actuation(m: Model, d: Data) -> Data:
  return smooth.actuation(m, d)


def fwd_acceleration(m: Model, d: Data) -> Data:
  if m.nv == 0:   # static scene (raycast/visualization-only models)
    return d
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                 + d.qfrc_applied + smooth.xfrc_accumulate(m, d))
  qfrc = qfrc_smooth + d.qfrc_constraint
  qacc = _solve_m(d.qM, qfrc)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc=qacc)


def forward(m: Model, d: Data) -> Data:
  """Full forward dynamics: positions -> velocities -> forces -> qacc."""
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  d = fwd_actuation(m, d)
  d = smooth.crb(m, d)
  d = d.replace(qfrc_constraint=tm.match_vma(
      jnp.zeros(m.nv, dtype=d.qpos.dtype), d.qpos))
  d = fwd_acceleration(m, d)  # qacc_smooth
  rows, scalar, cone, friction, points = constraint.make_rows_split(m, d)
  d = constraint.solve(m, d, rows, scalar, cone, friction, points)
  if m.opt.noslip_iterations > 0:
    from mujoco_mpc_tpu.physics import noslip
    d = noslip.apply(m, d, m.opt.noslip_iterations)
  return d


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                  dt) -> jax.Array:
  """qpos <- qpos ⊕ qvel * dt on the configuration manifold.

  Vectorized over joints: 1-D coordinates in one scatter-add, quaternion
  blocks in one batched quat_integrate (static maps, structure.py)."""
  from mujoco_mpc_tpu.physics import structure

  if m.njnt == 0:
    return qpos
  sq, sd, _, quat_q, quat_d, qj = structure.joint_coords(
      m.jnt_type, m.jnt_qposadr, m.jnt_dofadr)
  out = qpos
  if len(sq):
    out = out.at[sq].add(qvel[sd] * dt)
  if len(qj):
    newq = tm.quat_integrate(qpos[quat_q], qvel[quat_d], dt)
    out = out.at[quat_q.reshape(-1)].set(newq.reshape(-1))
  return out


def _euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping (analog: mj_Euler)."""
  h = m.opt.timestep
  # implicit damping: (M + h diag(B)) qacc = qfrc_total
  # (qfrc_smooth already contains the explicit -B qvel damping term)
  qm_h = d.qM + h * jnp.diag(m.dof_damping)
  qacc = _solve_m(qm_h, d.qfrc_smooth + d.qfrc_constraint)
  qvel = d.qvel + h * qacc
  qpos = integrate_pos(m, d.qpos, qvel, h)
  act = _clamp_act(m, d.act + h * d.act_dot) if m.na else d.act
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def _clamp_act(m: Model, act: jax.Array) -> jax.Array:
  """Clip activation states to actrange (mj_advance semantics; the
  intvelocity actuator's integrated position lives in act)."""
  return jnp.clip(act, m.act_range[:, 0], m.act_range[:, 1])


def _rk4(m: Model, d: Data) -> Data:
  """Explicit Runge-Kutta 4 (analog: mj_RungeKutta with default tableau)."""
  h = m.opt.timestep
  coefs = (0.5, 0.5, 1.0)
  weights = (1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6)

  d0 = d
  qpos0, qvel0, act0 = d.qpos, d.qvel, d.act

  kq = [d.qacc]
  kv = [d.qvel]
  ka = [d.act_dot]
  for c in coefs:
    di = d0.replace(
        qpos=integrate_pos(m, qpos0, kv[-1], c * h),
        qvel=qvel0 + c * h * kq[-1],
        act=act0 + c * h * ka[-1] if m.na else act0)
    di = forward(m, di)
    kq.append(di.qacc)
    kv.append(di.qvel)
    ka.append(di.act_dot)

  qvel_avg = sum(w * v for w, v in zip(weights, kv))
  qacc_avg = sum(w * a for w, a in zip(weights, kq))
  act_avg = sum(w * a for w, a in zip(weights, ka))
  qpos = integrate_pos(m, qpos0, qvel_avg, h)
  qvel = qvel0 + h * qacc_avg
  act = _clamp_act(m, act0 + h * act_avg) if m.na else act0
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def _implicit(m: Model, d: Data) -> Data:
  """Implicit-in-velocity integration (analog: mj_implicit / implicitfast).

  Solves (M - h * dF/dqvel) * qvel_dot = qfrc_total where dF/dqvel is the
  analytic derivative of passive + actuation + fluid forces w.r.t. qvel,
  computed here with one jacfwd over the velocity-dependent force pipeline —
  exactly the derivative MuJoCo assembles by hand in mjd_smooth_vel.
  """
  h = m.opt.timestep

  def qfrc_of_qvel(qvel):
    di = d.replace(qvel=qvel)
    di = kin.com_vel(m, di)
    di = smooth.rne(m, di)
    di = smooth.passive(m, di)
    di = fluid_mod.fluid(m, di)
    # velocity-dependent actuator force (affine gain/bias use velocity)
    di = di.replace(actuator_velocity=di.actuator_moment @ qvel)
    di = smooth.actuation(m, di)
    return di.qfrc_passive - di.qfrc_bias + di.qfrc_actuator

  deriv = jax.jacfwd(qfrc_of_qvel)(d.qvel)  # (nv, nv)
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  qacc = jnp.linalg.solve(d.qM - h * deriv, qfrc)
  qvel = d.qvel + h * qacc
  qpos = integrate_pos(m, d.qpos, qvel, h)
  act = _clamp_act(m, d.act + h * d.act_dot) if m.na else d.act
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def integrate(m: Model, d: Data) -> Data:
  """Advance post-forward Data by one timestep with the model integrator."""
  if m.opt.integrator == IntegratorType.RK4:
    return _rk4(m, d)
  elif m.opt.integrator in (2, 3):  # implicit / implicitfast
    return _implicit(m, d)
  return _euler(m, d)


def step(m: Model, d: Data) -> Data:
  """One simulation step: forward dynamics + integration (analog: mj_step)."""
  return integrate(m, forward(m, d))
