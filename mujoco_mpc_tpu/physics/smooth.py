"""Smooth (constraint-free) dynamics: mass matrix, bias, passive, actuation.

TPU-native equivalents of the mj_crb / mj_rne / mj_passive / mj_fwdActuation
stages that the reference invokes through mj_step in its rollout hot loop
(/root/reference/mjpc/trajectory.cc:158). The mass matrix is computed DENSE:
planner models have nv ≤ ~60, and a dense (nv,6)x(6,nv) matmul + static
ancestor mask is far friendlier to the MXU than MuJoCo's CSR-style sparse
layout, especially once rollouts are vmapped over thousands of candidates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics.model import (BiasType, Data, DynType, GainType,
                                          JointType, Model, TrnType)
from mujoco_mpc_tpu.utils import tpu_math as tm


def crb(m: Model, d: Data) -> Data:
  """Composite-rigid-body mass matrix, dense (analog: mj_crb)."""
  # backward accumulation of composite inertias
  crb_inert = [d.cinert[b] for b in range(m.nbody)]
  for b in range(m.nbody - 1, 0, -1):
    p = m.body_parentid[b]
    if p > 0:
      crb_inert[p] = crb_inert[p] + crb_inert[b]

  if m.nv == 0:
    return d

  # F[i] = I^C_{body(i)} * cdof[i]
  crb_dof = jnp.stack([crb_inert[m.dof_bodyid[i]] for i in range(m.nv)])
  f = jax.vmap(tm.inert_vec)(crb_dof, d.cdof)  # (nv, 6)

  # M[i, j] = cdof[j] . F[i] for j ancestor-or-self of i; symmetrize
  lower = (f @ d.cdof.T) * m.dof_ancestor_mask
  qm = lower + lower.T - jnp.diag(jnp.diag(lower))
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(qM=qm)


def rne(m: Model, d: Data) -> Data:
  """Bias force C(q,qvel)*qvel + gravity via recursive Newton-Euler (mj_rne)."""
  dtype = d.qpos.dtype
  if m.nv == 0:
    return d

  # frame acceleration: world "accelerates" opposite to gravity
  cacc = [jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])]
  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    a = cacc[p]
    dofadr, dofnum = m.body_dofadr[b], m.body_dofnum[b]
    for i in range(dofadr, dofadr + dofnum):
      a = a + d.cdof_dot[i] * d.qvel[i]
    cacc.append(a)

  # body inertial forces: f = I a + v x* (I v)
  cfrc = []
  for b in range(m.nbody):
    iv = tm.inert_vec(d.cinert[b], d.cvel[b])
    f = tm.inert_vec(d.cinert[b], cacc[b]) + tm.force_cross(d.cvel[b], iv)
    cfrc.append(f)

  # backward accumulation
  for b in range(m.nbody - 1, 0, -1):
    p = m.body_parentid[b]
    if p > 0:
      cfrc[p] = cfrc[p] + cfrc[b]

  qfrc_bias = jnp.stack(
      [jnp.dot(d.cdof[i], cfrc[m.dof_bodyid[i]]) for i in range(m.nv)])
  return d.replace(qfrc_bias=qfrc_bias)


def tendon(m: Model, d: Data) -> Data:
  """Fixed-tendon lengths and velocities (analog: mj_tendon).

  Fixed tendons are linear maps of joint coordinates, so both are single
  matmuls against constant model matrices (reference gets tendons from
  mj_step; the Shadow-hand-class models and the reference humanoid patch
  use them for joint coupling)."""
  if m.ntendon == 0:
    return d
  return d.replace(ten_length=m.ten_qmat @ d.qpos,
                   ten_velocity=m.ten_moment @ d.qvel)


def passive(m: Model, d: Data) -> Data:
  """Spring/damper passive forces (analog: mj_passive, fluid in fluid.py)."""
  dtype = d.qpos.dtype
  qfrc = -m.dof_damping * d.qvel

  # tendon spring (deadband [lo, hi]) + damper forces
  if m.ntendon:
    length = m.ten_qmat @ d.qpos
    vel = m.ten_moment @ d.qvel
    lo = m.tendon_lengthspring[:, 0]
    hi = m.tendon_lengthspring[:, 1]
    displacement = jnp.where(length > hi, hi - length,
                             jnp.where(length < lo, lo - length, 0.0))
    frc = m.tendon_stiffness * displacement - m.tendon_damping * vel
    qfrc = qfrc + m.ten_moment.T @ frc

  for j in range(m.njnt):
    # static skip of zero-stiffness joints keeps the graph small
    stiffness = m.jnt_stiffness[j]
    qadr, dofadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    jtype = m.jnt_type[j]
    if jtype == JointType.FREE:
      dif = d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]
      qfrc = qfrc.at[dofadr:dofadr + 3].add(-stiffness * dif)
      rot = tm.quat_sub(d.qpos[qadr + 3:qadr + 7],
                        m.qpos_spring[qadr + 3:qadr + 7])
      qfrc = qfrc.at[dofadr + 3:dofadr + 6].add(-stiffness * rot)
    elif jtype == JointType.BALL:
      rot = tm.quat_sub(
          jax.lax.dynamic_slice(d.qpos, (qadr,), (4,)),
          jax.lax.dynamic_slice(m.qpos_spring, (qadr,), (4,)))
      qfrc = qfrc.at[dofadr:dofadr + 3].add(-stiffness * rot)
    else:
      dif = d.qpos[qadr] - m.qpos_spring[qadr]
      qfrc = qfrc.at[dofadr].add(-stiffness * dif)

  return d.replace(qfrc_passive=qfrc.astype(dtype))


def _body_jac(m: Model, d: Data, bodyid: int, point: jax.Array):
  """Dense translational/rotational Jacobian of a world point on a body.

  Columns are the body's ancestor dofs; derived from cdof the same way
  MuJoCo's mj_jac composes com-based dofs.
  """
  # static mask of ancestor dofs of this body
  mask = np.zeros((m.nv,), dtype=bool)
  b = bodyid
  while b > 0:
    for i in range(m.body_dofadr[b], m.body_dofadr[b] + m.body_dofnum[b]):
      mask[i] = True
    b = m.body_parentid[b]
  mask = jnp.asarray(mask, dtype=d.qpos.dtype)

  offset = point - d.subtree_com[m.body_rootid[bodyid]]
  jacp = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :]))
  jacr = d.cdof[:, :3]
  return jacp * mask[:, None], jacr * mask[:, None]


def transmission(m: Model, d: Data) -> Data:
  """Actuator lengths, velocities and moment arms (mj_transmission)."""
  dtype = d.qpos.dtype
  if m.nu == 0:
    return d
  lengths, moments = [], []
  for u in range(m.nu):
    trntype = m.actuator_trntype[u]
    gear = m.actuator_gear[u]
    if trntype == TrnType.JOINT:
      j = m.actuator_trnid[u]
      jtype = m.jnt_type[j]
      qadr, dofadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
      if jtype in (JointType.HINGE, JointType.SLIDE):
        lengths.append(d.qpos[qadr] * gear[0])
        moments.append(
            jnp.zeros(m.nv, dtype=dtype).at[dofadr].set(gear[0]))
      elif jtype == JointType.BALL:
        # wrench gear acts on the 3 rotational dofs (local frame)
        lengths.append(jnp.zeros((), dtype=dtype))
        mom = jnp.zeros(m.nv, dtype=dtype)
        for k in range(3):
          mom = mom.at[dofadr + k].set(gear[k])
        moments.append(mom)
      else:  # free
        lengths.append(jnp.zeros((), dtype=dtype))
        mom = jnp.zeros(m.nv, dtype=dtype)
        for k in range(6):
          mom = mom.at[dofadr + k].set(gear[k])
        moments.append(mom)
    elif trntype == TrnType.SITE:
      s = m.actuator_trnid[u]
      bodyid = m.site_bodyid[s]
      jacp, jacr = _body_jac(m, d, bodyid, d.site_xpos[s])
      # wrench specified in site frame
      force = d.site_xmat[s] @ gear[:3]
      torque = d.site_xmat[s] @ gear[3:]
      lengths.append(jnp.zeros((), dtype=dtype))
      moments.append(jacp @ force + jacr @ torque)
    elif trntype == TrnType.TENDON:
      ti = m.actuator_trnid[u]
      lengths.append(d.ten_length[ti] * gear[0])
      moments.append(m.ten_moment[ti] * gear[0])
    else:
      raise NotImplementedError(f'transmission type {trntype}')
  moment = jnp.stack(moments)              # (nu, nv)
  length = jnp.stack(lengths)              # (nu,)
  velocity = moment @ d.qvel
  return d.replace(actuator_length=length, actuator_velocity=velocity,
                   actuator_moment=moment)


def actuation(m: Model, d: Data) -> Data:
  """Actuator forces and activation derivatives (mj_fwdActuation)."""
  dtype = d.qpos.dtype
  if m.nu == 0:
    return d.replace(qfrc_actuator=jnp.zeros(m.nv, dtype=dtype))

  # clamp ctrl
  ctrl = d.ctrl
  limited = jnp.array(m.actuator_ctrllimited, dtype=bool)
  clamped = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                     m.actuator_ctrlrange[:, 1])
  ctrl = jnp.where(limited, clamped, ctrl)

  # activation dynamics
  act_dot = jnp.zeros(m.na, dtype=dtype)
  inputs = []
  for u in range(m.nu):
    dyntype = m.actuator_dyntype[u]
    if dyntype == DynType.NONE:
      inputs.append(ctrl[u])
    else:
      aadr = m.actuator_actadr[u]
      if dyntype == DynType.INTEGRATOR:
        act_dot = act_dot.at[aadr].set(ctrl[u])
      else:  # FILTER / FILTEREXACT
        tau = jnp.maximum(m.actuator_dynprm[u, 0], 1e-8)
        act_dot = act_dot.at[aadr].set((ctrl[u] - d.act[aadr]) / tau)
      inputs.append(d.act[aadr])
  inp = jnp.stack(inputs)

  # gain / bias
  gp, bp = m.actuator_gainprm, m.actuator_biasprm
  gains, biases = [], []
  for u in range(m.nu):
    if m.actuator_gaintype[u] == GainType.FIXED:
      gains.append(gp[u, 0])
    else:
      gains.append(gp[u, 0] + gp[u, 1] * d.actuator_length[u]
                   + gp[u, 2] * d.actuator_velocity[u])
    if m.actuator_biastype[u] == BiasType.NONE:
      biases.append(jnp.zeros((), dtype=dtype))
    else:
      biases.append(bp[u, 0] + bp[u, 1] * d.actuator_length[u]
                    + bp[u, 2] * d.actuator_velocity[u])
  force = jnp.stack(gains) * inp + jnp.stack(biases)

  flimited = jnp.array(m.actuator_forcelimited, dtype=bool)
  fclamped = jnp.clip(force, m.actuator_forcerange[:, 0],
                      m.actuator_forcerange[:, 1])
  force = jnp.where(flimited, fclamped, force)

  qfrc_actuator = d.actuator_moment.T @ force
  return d.replace(ctrl=d.ctrl, actuator_force=force, act_dot=act_dot,
                   qfrc_actuator=qfrc_actuator)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Map per-body applied world wrenches to generalized forces."""
  qfrc = jnp.zeros(m.nv, dtype=d.qpos.dtype)
  for b in range(1, m.nbody):
    jacp, jacr = _body_jac(m, d, b, d.xipos[b])
    qfrc = qfrc + jacp @ d.xfrc_applied[b, :3] + jacr @ d.xfrc_applied[b, 3:]
  return qfrc
