"""Forward kinematics and com-based frame quantities.

Pure-JAX equivalents of the forward-kinematics stage the reference relies on
via MuJoCo's mj_kinematics/mj_comPos (called inside mj_step from
/root/reference/mjpc/trajectory.cc:158). Tree traversal is unrolled in Python
over the static kinematic structure — bodies are topologically ordered
(parent index < child index), so a single in-order pass suffices and XLA sees
straight-line code it can fuse aggressively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics.model import Data, JointType, Model
from mujoco_mpc_tpu.utils import tpu_math as tm


def kinematics(m: Model, d: Data) -> Data:
  """Compute global body/geom/site frames from qpos (analog: mj_kinematics).

  Level-batched: bodies at the same tree depth compose their frames from
  already-computed parent frames in ONE batch of quaternion ops (static
  level plan in physics/structure.py) — the rollout hot loop is
  dispatch-bound on TPU, so op count per step, not FLOPs, is the cost."""
  from mujoco_mpc_tpu.physics import structure

  qpos = d.qpos
  dtype = qpos.dtype

  xpos = jnp.zeros((m.nbody, 3), dtype=dtype)
  xquat = jnp.zeros((m.nbody, 4), dtype=dtype).at[:, 0].set(1.0)
  xanchor = jnp.zeros((m.njnt, 3), dtype=dtype)
  xaxis = jnp.zeros((m.njnt, 3), dtype=dtype)

  plans = structure.kinematic_levels(
      m.body_parentid, m.body_jntadr, m.body_jntnum, m.body_mocapid,
      m.jnt_type, m.jnt_qposadr)

  for plan in plans:
    bodies = plan.bodies
    par = plan.parents
    p_pos = xpos[par]
    p_quat = xquat[par]
    pos = p_pos + tm.quat_rot(p_quat, m.body_pos[bodies])
    quat = tm.quat_mul(p_quat, m.body_quat[bodies])

    if plan.free_pos:
      idx = np.asarray([i for i, _, _ in plan.free_pos], dtype=np.int32)
      jids = np.asarray([j for _, j, _ in plan.free_pos], dtype=np.int32)
      qadr = np.asarray([q for _, _, q in plan.free_pos], dtype=np.int32)
      fpos = qpos[qadr[:, None] + np.arange(3)]          # (F, 3)
      fquat = tm.quat_normalize(qpos[qadr[:, None] + 3 + np.arange(4)])
      pos = pos.at[idx].set(fpos)
      quat = quat.at[idx].set(fquat)
      xanchor = xanchor.at[jids].set(fpos)
      xaxis = xaxis.at[jids].set(m.jnt_axis[jids])

    if plan.mocap:
      idx = np.asarray([i for i, _ in plan.mocap], dtype=np.int32)
      mids = np.asarray([mid for _, mid in plan.mocap], dtype=np.int32)
      pos = pos.at[idx].set(d.mocap_pos[mids])
      quat = quat.at[idx].set(tm.quat_normalize(d.mocap_quat[mids]))

    for slot in plan.slots:
      for jtype, entries in slot.items():
        idx = np.asarray([i for i, _, _ in entries], dtype=np.int32)
        jids = np.asarray([j for _, j, _ in entries], dtype=np.int32)
        qadr = np.asarray([q for _, _, q in entries], dtype=np.int32)
        jpos = m.jnt_pos[jids]                           # (K, 3)
        jaxis = m.jnt_axis[jids]
        q_k = quat[idx]
        anchor = pos[idx] + tm.quat_rot(q_k, jpos)
        axis = tm.quat_rot(q_k, jaxis)
        xanchor = xanchor.at[jids].set(anchor)
        xaxis = xaxis.at[jids].set(axis)

        if jtype == JointType.SLIDE:
          disp = (qpos[qadr] - m.qpos0[qadr])[:, None]
          pos = pos.at[idx].add(axis * disp)
        elif jtype == JointType.HINGE:
          angle = qpos[qadr] - m.qpos0[qadr]
          qloc = tm.axis_angle_to_quat(jaxis, angle)
          q_new = tm.quat_mul(q_k, qloc)
          quat = quat.at[idx].set(q_new)
          pos = pos.at[idx].set(anchor - tm.quat_rot(q_new, jpos))
        elif jtype == JointType.BALL:
          qloc = tm.quat_normalize(qpos[qadr[:, None] + np.arange(4)])
          q_new = tm.quat_mul(q_k, qloc)
          quat = quat.at[idx].set(q_new)
          pos = pos.at[idx].set(anchor - tm.quat_rot(q_new, jpos))
        else:
          raise NotImplementedError(f'joint type {jtype} in level plan')

    xpos = xpos.at[bodies].set(pos)
    xquat = xquat.at[bodies].set(tm.quat_normalize(quat))

  xmat = tm.quat_to_mat(xquat)

  # inertial frames
  xipos = xpos + jax.vmap(tm.quat_rot)(xquat, m.body_ipos)
  ximat = tm.quat_to_mat(jax.vmap(tm.quat_mul)(xquat, m.body_iquat))

  # geoms / sites
  def frame(bodyid, offset_pos, offset_quat):
    bodyid = jnp.asarray(bodyid)
    bp = xpos[bodyid]
    bq = xquat[bodyid]
    gpos = bp + jax.vmap(tm.quat_rot)(bq, offset_pos)
    gmat = tm.quat_to_mat(jax.vmap(tm.quat_mul)(bq, offset_quat))
    return gpos, gmat

  if m.ngeom:
    geom_xpos, geom_xmat = frame(
        jnp.array(m.geom_bodyid), m.geom_pos, m.geom_quat)
  else:
    geom_xpos, geom_xmat = d.geom_xpos, d.geom_xmat
  if m.nsite:
    site_xpos, site_xmat = frame(
        jnp.array(m.site_bodyid), m.site_pos, m.site_quat)
  else:
    site_xpos, site_xmat = d.site_xpos, d.site_xmat

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, d: Data) -> Data:
  """Subtree com, com-based spatial inertias and motion dofs (mj_comPos).

  Fully vectorized: subtree accumulation is one matmul against a static
  ancestor mask, and cdof assembly is a handful of batched gathers (the
  rollout hot loop is dispatch-bound on TPU — see physics/structure.py)."""
  from mujoco_mpc_tpu.physics import structure

  dtype = d.qpos.dtype

  # subtree center of mass: D @ (mass-weighted com)
  d_sub = jnp.asarray(structure.subtree_mask(m.body_parentid), dtype)
  mass_x = m.body_mass[:, None] * d.xipos  # (nbody, 3)
  sub_massx = d_sub @ mass_x
  sub_mass = d_sub @ m.body_mass
  subtree_com = sub_massx / jnp.maximum(sub_mass, 1e-12)[:, None]

  # spatial inertia of each body about the com of its kinematic tree root
  # (quaternion-native: avoids slicing a batched (nbody, 3, 3) tensor,
  # which profiled as the most expensive op of the whole rollout step)
  root_com = subtree_com[jnp.array(m.body_rootid)]
  xiquat = tm.quat_mul(d.xquat, m.body_iquat)
  cinert = tm.inert_from_body_quat(
      m.body_mass, m.body_inertia, xiquat, d.xipos, root_com)

  # motion dofs (cdof), frame origin = subtree_com[rootid(body)]:
  # ang/lin parts gathered from candidate tables with static indices
  if m.nv:
    ang_idx, pt_idx, lin_idx, dof_rootid = structure.cdof_gather(
        m.body_parentid, m.body_rootid, m.body_jntadr, m.body_jntnum,
        m.jnt_type, m.jnt_dofadr, m.jnt_bodyid, m.nv)
    xmat_cols = jnp.swapaxes(d.xmat, -1, -2).reshape(-1, 3)
    zero3 = jnp.zeros((1, 3), dtype=dtype)
    ang = jnp.concatenate([zero3, d.xaxis, xmat_cols], 0)[ang_idx]
    pt = jnp.concatenate([zero3, d.xanchor, d.xpos], 0)[pt_idx]
    linc = jnp.concatenate([zero3, d.xaxis,
                            jnp.eye(3, dtype=dtype)], 0)[lin_idx]
    origin = subtree_com[dof_rootid]
    cdof = jnp.concatenate([ang, jnp.cross(ang, origin - pt) + linc], -1)
  else:
    cdof = jnp.zeros((0, 6), dtype=dtype)

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
  """Body spatial velocities and cdof time-derivatives (mj_comVel).

  cvel and the per-dof velocity entering cdof_dot are matmuls against
  static ancestor masks (ordering semantics in structure.dof_vel_mask)."""
  from mujoco_mpc_tpu.physics import structure

  dtype = d.qpos.dtype
  if m.nv == 0:
    return d.replace(cvel=jnp.zeros((m.nbody, 6), dtype=dtype),
                     cdof_dot=jnp.zeros((0, 6), dtype=dtype))
  a_body = jnp.asarray(structure.body_ancestor_dof_mask(
      m.body_parentid, m.body_dofadr, m.body_dofnum, m.nv), dtype)
  v_dof = jnp.asarray(structure.dof_vel_mask(
      m.body_parentid, m.body_jntadr, m.body_jntnum, m.jnt_type,
      m.jnt_dofadr, m.nv), dtype)
  cdof_qvel = d.cdof * d.qvel[:, None]     # (nv, 6)
  cvel = a_body @ cdof_qvel                # (nbody, 6)
  v_at = v_dof @ cdof_qvel                 # (nv, 6)
  cdof_dot = tm.motion_cross(v_at, d.cdof)
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)
