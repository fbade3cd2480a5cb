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
  """Composite-rigid-body mass matrix, dense (analog: mj_crb).

  Subtree inertia accumulation is one matmul against a static ancestor
  mask (physics/structure.py) — the hot loop is dispatch-bound on TPU."""
  from mujoco_mpc_tpu.physics import structure

  if m.nv == 0:
    return d
  dtype = d.qpos.dtype
  d_sub = jnp.asarray(structure.subtree_mask(m.body_parentid), dtype)
  crb_inert = d_sub @ d.cinert                        # (nbody, 10)

  # F[i] = I^C_{body(i)} * cdof[i]
  dof_body = structure.dof_body_gather(m.dof_bodyid)
  f = tm.inert_vec(crb_inert[dof_body], d.cdof)       # (nv, 6)

  # M[i, j] = cdof[j] . F[i] for j ancestor-or-self of i; symmetrize
  lower = (f @ d.cdof.T) * m.dof_ancestor_mask
  qm = lower + lower.T - jnp.diag(jnp.diag(lower))
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(qM=qm)


def rne(m: Model, d: Data) -> Data:
  """Bias force C(q,qvel)*qvel + gravity via recursive Newton-Euler (mj_rne).

  Forward (cacc) and backward (cfrc) tree recursions are matmuls against
  static ancestor/subtree masks (physics/structure.py)."""
  from mujoco_mpc_tpu.physics import structure

  dtype = d.qpos.dtype
  if m.nv == 0:
    return d

  a_body = jnp.asarray(structure.body_ancestor_dof_mask(
      m.body_parentid, m.body_dofadr, m.body_dofnum, m.nv), dtype)
  d_sub = jnp.asarray(structure.subtree_mask(m.body_parentid), dtype)
  dof_body = structure.dof_body_gather(m.dof_bodyid)

  # frame acceleration: world "accelerates" opposite to gravity
  base = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])
  cacc = base + a_body @ (d.cdof_dot * d.qvel[:, None])  # (nbody, 6)

  # body inertial forces f = I a + v x* (I v), then subtree accumulation
  iv = tm.inert_vec(d.cinert, d.cvel)
  cfrc = tm.inert_vec(d.cinert, cacc) + tm.force_cross(d.cvel, iv)
  cfrc_total = d_sub @ cfrc                              # (nbody, 6)

  qfrc_bias = jnp.einsum('ij,ij->i', d.cdof, cfrc_total[dof_body])
  return d.replace(qfrc_bias=qfrc_bias)


def tendon(m: Model, d: Data) -> Data:
  """Tendon lengths, velocities and moment rows (analog: mj_tendon).

  Fixed tendons are linear maps of joint coordinates (single matmuls
  against constant model matrices). Spatial tendons are site-waypoint
  paths: per branch with pulley divisor v, length += |x2-x1|/v and the
  moment row += u^T (Jp2 - Jp1)/v with u the unit segment direction —
  the analytic dL/dq (reference gets tendons from mj_step; Shadow-class
  hand models use them for coupling and actuation)."""
  if m.ntendon == 0:
    return d
  if not any(m.ten_spatial):
    ten_J = tm.match_vma(m.ten_moment, d.qpos)
    return d.replace(ten_length=m.ten_qmat @ d.qpos,
                     ten_velocity=m.ten_moment @ d.qvel,
                     ten_J=ten_J)
  dtype = d.qpos.dtype
  fixed_len = m.ten_qmat @ d.qpos
  lengths, jacs = [], []
  for ti in range(m.ntendon):
    branches = m.ten_spatial[ti]
    if not branches:
      lengths.append(fixed_len[ti])
      jacs.append(tm.match_vma(m.ten_moment[ti], d.qpos))
      continue
    ln_total = jnp.zeros((), dtype=dtype)
    jac = jnp.zeros(m.nv, dtype=dtype)
    for divisor, sites in branches:
      inv = 1.0 / divisor
      for s1, s2 in zip(sites[:-1], sites[1:]):
        x1, x2 = d.site_xpos[s1], d.site_xpos[s2]
        diff = x2 - x1
        ln = jnp.linalg.norm(diff)
        u = diff / jnp.maximum(ln, 1e-12)
        jp1, _ = _body_jac(m, d, m.site_bodyid[s1], x1)
        jp2, _ = _body_jac(m, d, m.site_bodyid[s2], x2)
        ln_total = ln_total + ln * inv
        jac = jac + ((jp2 - jp1) @ u) * inv
    lengths.append(ln_total)
    jacs.append(jac)
  ten_J = jnp.stack(jacs)
  return d.replace(ten_length=jnp.stack(lengths),
                   ten_velocity=ten_J @ d.qvel, ten_J=ten_J)


def passive(m: Model, d: Data) -> Data:
  """Spring/damper passive forces (analog: mj_passive, fluid in fluid.py)."""
  dtype = d.qpos.dtype
  qfrc = -m.dof_damping * d.qvel

  # tendon spring (deadband [lo, hi]) + damper forces. Length/moment come
  # from the tendon stage (fixed or spatial); velocity is recomputed from
  # the current qvel so implicit integration sees the damping derivative.
  if m.ntendon:
    length = d.ten_length
    vel = d.ten_J @ d.qvel
    lo = m.tendon_lengthspring[:, 0]
    hi = m.tendon_lengthspring[:, 1]
    displacement = jnp.where(length > hi, hi - length,
                             jnp.where(length < lo, lo - length, 0.0))
    frc = m.tendon_stiffness * displacement - m.tendon_damping * vel
    qfrc = qfrc + d.ten_J.T @ frc

  # joint springs, vectorized over joints with static coordinate maps
  if m.njnt:
    from mujoco_mpc_tpu.physics import structure
    sq, sd, sj, quat_q, quat_d, qj = structure.joint_coords(
        m.jnt_type, m.jnt_qposadr, m.jnt_dofadr)
    if len(sq):
      dif = d.qpos[sq] - m.qpos_spring[sq]
      qfrc = qfrc.at[sd].add(-m.jnt_stiffness[sj] * dif)
    if len(qj):
      rot = tm.quat_sub(d.qpos[quat_q], m.qpos_spring[quat_q])   # (n, 3)
      qfrc = qfrc.at[quat_d.reshape(-1)].add(
          (-m.jnt_stiffness[qj][:, None] * rot).reshape(-1))

  # body gravity compensation (MJCF body gravcomp, mj_gravcomp semantics):
  # force -gravcomp * mass * gravity applied at each body CoM (reference
  # fingers task floats its bodies with gravcomp="1")
  if m.any_gravcomp:
    from mujoco_mpc_tpu.physics import structure
    a_body = jnp.asarray(structure.body_ancestor_dof_mask(
        m.body_parentid, m.body_dofadr, m.body_dofnum, m.nv), dtype)
    off = d.xipos - d.subtree_com[jnp.array(m.body_rootid)]
    jacp = (d.cdof[None, :, 3:]
            + jnp.cross(d.cdof[None, :, :3], off[:, None, :]))
    f = (-(m.body_gravcomp * m.body_mass)[:, None]
         * m.opt.gravity[None, :])                        # (nbody, 3)
    qfrc = qfrc + jnp.einsum('bi,bi->i', a_body,
                             jnp.einsum('bis,bs->bi', jacp, f))

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

  # fast path: no SITE transmissions -> length/moment are static gathers
  # and a constant selection tensor (dispatch-bound hot loop, see
  # physics/structure.py); SITE needs per-site point Jacobians and keeps
  # the unrolled path below
  if all(t in (TrnType.JOINT, TrnType.TENDON) for t in m.actuator_trntype):
    sel = np.zeros((m.nu, m.nv, 6), dtype=np.float64)   # moment selector
    qadr_arr = np.zeros(m.nu, dtype=np.int32)
    scalar_mask = np.zeros(m.nu, dtype=np.float64)
    ten_sel = np.zeros((m.nu, m.ntendon), dtype=np.float64)
    ten_idx = np.zeros(m.nu, dtype=np.int32)
    ten_mask = np.zeros(m.nu, dtype=np.float64)
    for u in range(m.nu):
      if m.actuator_trntype[u] == TrnType.JOINT:
        j = m.actuator_trnid[u]
        jtype = m.jnt_type[j]
        dofadr = m.jnt_dofadr[j]
        if jtype in (JointType.HINGE, JointType.SLIDE):
          sel[u, dofadr, 0] = 1.0
          qadr_arr[u] = m.jnt_qposadr[j]
          scalar_mask[u] = 1.0
        elif jtype == JointType.BALL:
          for k in range(3):
            sel[u, dofadr + k, k] = 1.0
        else:  # free
          for k in range(6):
            sel[u, dofadr + k, k] = 1.0
      else:  # tendon
        ti = m.actuator_trnid[u]
        ten_sel[u, ti] = 1.0
        ten_idx[u] = ti
        ten_mask[u] = 1.0
    gear = m.actuator_gear                               # (nu, 6)
    moment = jnp.einsum('unk,uk->un', jnp.asarray(sel, dtype=dtype), gear)
    if ten_mask.any():
      moment = moment + (jnp.asarray(ten_sel, dtype=dtype)
                         @ d.ten_J) * gear[:, 0:1]
      length = jnp.where(jnp.asarray(ten_mask, dtype=bool),
                         d.ten_length[ten_idx] * gear[:, 0],
                         d.qpos[qadr_arr] * gear[:, 0]
                         * jnp.asarray(scalar_mask, dtype=dtype))
    else:
      length = (d.qpos[qadr_arr] * gear[:, 0]
                * jnp.asarray(scalar_mask, dtype=dtype))
    velocity = moment @ d.qvel
    # constant-derived leaves must keep the carry's varying-manual-axes
    # type under shard_map (no-op elsewhere)
    moment = tm.match_vma(moment, d.qpos)
    length = tm.match_vma(length, d.qpos)
    return d.replace(actuator_length=length, actuator_velocity=velocity,
                     actuator_moment=moment)

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
      refid = m.actuator_refid[u]
      if refid < 0:
        # wrench specified in site frame, zero length (mj_transmission)
        force = d.site_xmat[s] @ gear[:3]
        torque = d.site_xmat[s] @ gear[3:]
        lengths.append(jnp.zeros((), dtype=dtype))
        moments.append(jacp @ force + jacr @ torque)
      else:
        # site-minus-refsite transmission (intvelocity/position over a
        # Cartesian site pose, reference fingers task): length = gear .
        # [relative translation; rotation residual] in the ref frame.
        # moment = gear . [R_r^T (Jp_s - Jp_r); R_r^T (Jr_s - Jr_r)] —
        # mj_transmission's convention, which treats the ref frame as
        # momentarily FIXED (no w_r x vec rotating-frame term; verified
        # against mjd.actuator_moment + an FD probe of its length)
        rmat = d.site_xmat[refid]
        rjacp, rjacr = _body_jac(m, d, m.site_bodyid[refid],
                                 d.site_xpos[refid])
        vec = d.site_xpos[s] - d.site_xpos[refid]
        trans = rmat.T @ vec
        rot = tm.quat_sub(tm.mat_to_quat(d.site_xmat[s]),
                          tm.mat_to_quat(rmat))
        lengths.append(jnp.dot(gear[:3], trans) + jnp.dot(gear[3:], rot))
        jp_rel = (jacp - rjacp) @ rmat
        jr_rel = (jacr - rjacr) @ rmat                 # (nv, 3) ref frame
        moments.append(jp_rel @ gear[:3] + jr_rel @ gear[3:])
    elif trntype == TrnType.TENDON:
      ti = m.actuator_trnid[u]
      lengths.append(d.ten_length[ti] * gear[0])
      moments.append(d.ten_J[ti] * gear[0])
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

  # activation dynamics (vectorized over actuators with static type masks)
  if m.na:
    aadr = np.asarray(m.actuator_actadr, dtype=np.int32)
    has_act = np.asarray([t != DynType.NONE for t in m.actuator_dyntype])
    is_integ = np.asarray([t == DynType.INTEGRATOR
                           for t in m.actuator_dyntype])
    tau = jnp.maximum(m.actuator_dynprm[:, 0], 1e-8)
    act_u = d.act[np.where(has_act, aadr, 0)]
    dot_u = jnp.where(jnp.asarray(is_integ), ctrl, (ctrl - act_u) / tau)
    act_dot = jnp.zeros(m.na, dtype=dtype)
    act_dot = act_dot.at[aadr[has_act]].set(dot_u[np.nonzero(has_act)[0]])
    inp = jnp.where(jnp.asarray(has_act), act_u, ctrl)
  else:
    act_dot = tm.match_vma(jnp.zeros(m.na, dtype=dtype), d.qpos)
    inp = ctrl

  # gain / bias (static type masks; affine terms vectorized)
  gp, bp = m.actuator_gainprm, m.actuator_biasprm
  gain_affine = jnp.asarray(
      [t != GainType.FIXED for t in m.actuator_gaintype])
  bias_on = jnp.asarray([t != BiasType.NONE for t in m.actuator_biastype])
  affine_g = (gp[:, 0] + gp[:, 1] * d.actuator_length
              + gp[:, 2] * d.actuator_velocity)
  gains = jnp.where(gain_affine, affine_g, gp[:, 0])
  affine_b = (bp[:, 0] + bp[:, 1] * d.actuator_length
              + bp[:, 2] * d.actuator_velocity)
  biases = jnp.where(bias_on, affine_b, 0.0)
  force = gains * inp + biases

  flimited = jnp.array(m.actuator_forcelimited, dtype=bool)
  fclamped = jnp.clip(force, m.actuator_forcerange[:, 0],
                      m.actuator_forcerange[:, 1])
  force = jnp.where(flimited, fclamped, force)

  qfrc_actuator = d.actuator_moment.T @ force
  return d.replace(ctrl=d.ctrl, actuator_force=force, act_dot=act_dot,
                   qfrc_actuator=qfrc_actuator)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Map per-body applied world wrenches to generalized forces.

  Vectorized over bodies: qfrc[i] = sum_b mask[b,i] * (Jp_b[i].f_b +
  Jr_b[i].t_b) with the dense point Jacobians expanded from cdof."""
  from mujoco_mpc_tpu.physics import structure

  dtype = d.qpos.dtype
  if m.nv == 0:
    return jnp.zeros(0, dtype=dtype)
  a_body = jnp.asarray(structure.body_ancestor_dof_mask(
      m.body_parentid, m.body_dofadr, m.body_dofnum, m.nv), dtype)
  off = d.xipos - d.subtree_com[jnp.array(m.body_rootid)]   # (nbody, 3)
  # jacp[b, i, :] = cdof[i, 3:] + cross(cdof[i, :3], off[b])
  jacp = (d.cdof[None, :, 3:]
          + jnp.cross(d.cdof[None, :, :3], off[:, None, :]))
  contrib = (jnp.einsum('bis,bs->bi', jacp, d.xfrc_applied[:, :3])
             + d.xfrc_applied[:, 3:] @ d.cdof[:, :3].T)
  return jnp.einsum('bi,bi->i', a_body, contrib)
