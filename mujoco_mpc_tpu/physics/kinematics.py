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

from mujoco_mpc_tpu.physics.model import Data, JointType, Model
from mujoco_mpc_tpu.utils import tpu_math as tm


def kinematics(m: Model, d: Data) -> Data:
  """Compute global body/geom/site frames from qpos (analog: mj_kinematics)."""
  qpos = d.qpos

  xpos = [jnp.zeros(3, dtype=qpos.dtype)]
  xquat = [jnp.array([1.0, 0, 0, 0], dtype=qpos.dtype)]
  xanchor = [None] * m.njnt
  xaxis = [None] * m.njnt

  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    jntadr, jntnum = m.body_jntadr[b], m.body_jntnum[b]
    mocapid = m.body_mocapid[b]

    if jntnum == 1 and m.jnt_type[jntadr] == JointType.FREE:
      # free joint: position fully from qpos
      qadr = m.jnt_qposadr[jntadr]
      pos = qpos[qadr:qadr + 3]
      quat = tm.quat_normalize(qpos[qadr + 3:qadr + 7])
      xanchor[jntadr] = pos
      xaxis[jntadr] = m.jnt_axis[jntadr]
    else:
      if mocapid >= 0:
        # mocap body: frame set directly from mocap arrays
        pos = d.mocap_pos[mocapid]
        quat = tm.quat_normalize(d.mocap_quat[mocapid])
      else:
        pos = xpos[p] + tm.quat_rot(xquat[p], m.body_pos[b])
        quat = tm.quat_mul(xquat[p], m.body_quat[b])

      for j in range(jntadr, jntadr + jntnum):
        qadr = m.jnt_qposadr[j]
        jtype = m.jnt_type[j]
        anchor = pos + tm.quat_rot(quat, m.jnt_pos[j])
        axis = tm.quat_rot(quat, m.jnt_axis[j])
        xanchor[j] = anchor
        xaxis[j] = axis

        if jtype == JointType.BALL:
          qloc = tm.quat_normalize(
              jax.lax.dynamic_slice(qpos, (qadr,), (4,)))
          quat = tm.quat_mul(quat, qloc)
          # keep the anchor point fixed under the rotation
          pos = anchor - tm.quat_rot(quat, m.jnt_pos[j])
        elif jtype == JointType.SLIDE:
          pos = pos + axis * (qpos[qadr] - m.qpos0[qadr])
        elif jtype == JointType.HINGE:
          angle = qpos[qadr] - m.qpos0[qadr]
          qloc = tm.axis_angle_to_quat(m.jnt_axis[j], angle)
          quat = tm.quat_mul(quat, qloc)
          pos = anchor - tm.quat_rot(quat, m.jnt_pos[j])

    xpos.append(pos)
    xquat.append(tm.quat_normalize(quat))

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
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

  xanchor_arr = (jnp.stack(xanchor) if m.njnt
                 else jnp.zeros((0, 3), dtype=qpos.dtype))
  xaxis_arr = (jnp.stack(xaxis) if m.njnt
               else jnp.zeros((0, 3), dtype=qpos.dtype))

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor_arr, xaxis=xaxis_arr,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, d: Data) -> Data:
  """Subtree com, com-based spatial inertias and motion dofs (mj_comPos)."""
  dtype = d.qpos.dtype

  # subtree center of mass: backward accumulation of mass-weighted com
  mass_x = m.body_mass[:, None] * d.xipos  # (nbody, 3)
  sub_massx = [mass_x[b] for b in range(m.nbody)]
  sub_mass = [m.body_mass[b] for b in range(m.nbody)]
  for b in range(m.nbody - 1, 0, -1):
    p = m.body_parentid[b]
    sub_massx[p] = sub_massx[p] + sub_massx[b]
    sub_mass[p] = sub_mass[p] + sub_mass[b]
  subtree_com = jnp.stack(
      [sub_massx[b] / jnp.maximum(sub_mass[b], 1e-12)
       for b in range(m.nbody)])

  # spatial inertia of each body about the com of its kinematic tree root
  root_com = subtree_com[jnp.array(m.body_rootid)]
  cinert = jax.vmap(tm.inert_from_body)(
      m.body_mass, m.body_inertia, d.ximat, d.xipos, root_com)

  # motion dofs (cdof), frame origin = subtree_com[rootid(body)]
  cdof = []
  for j in range(m.njnt):
    b = m.jnt_bodyid[j]
    origin = subtree_com[m.body_rootid[b]]
    jtype = m.jnt_type[j]
    if jtype == JointType.FREE:
      for k in range(3):
        e = jnp.zeros(3, dtype=dtype).at[k].set(1.0)
        cdof.append(jnp.concatenate([jnp.zeros(3, dtype=dtype), e]))
      # rotational dofs about the body frame origin, axes = body frame axes
      offset = origin - d.xpos[b]
      for k in range(3):
        ax = d.xmat[b, :, k]
        cdof.append(jnp.concatenate([ax, jnp.cross(ax, offset)]))
    elif jtype == JointType.BALL:
      offset = origin - d.xanchor[j]
      for k in range(3):
        ax = d.xmat[b, :, k]
        cdof.append(jnp.concatenate([ax, jnp.cross(ax, offset)]))
    elif jtype == JointType.SLIDE:
      cdof.append(jnp.concatenate([jnp.zeros(3, dtype=dtype), d.xaxis[j]]))
    else:  # hinge
      offset = origin - d.xanchor[j]
      ax = d.xaxis[j]
      cdof.append(jnp.concatenate([ax, jnp.cross(ax, offset)]))
  cdof = (jnp.stack(cdof) if cdof
          else jnp.zeros((0, 6), dtype=dtype))

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
  """Body spatial velocities and cdof time-derivatives (mj_comVel)."""
  dtype = d.qpos.dtype
  cvel = [jnp.zeros(6, dtype=dtype)]
  cdof_dot = [None] * m.nv

  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    v = cvel[p]
    dofadr, dofnum = m.body_dofadr[b], m.body_dofnum[b]
    # process this body's dofs in order, accumulating velocity
    j = m.body_jntadr[b]
    i = dofadr
    while i < dofadr + dofnum:
      jtype = m.jnt_type[m.dof_jntid[i]]
      if jtype == JointType.FREE:
        # translation dofs: cdof constant, cdof_dot = 0
        for k in range(3):
          cdof_dot[i + k] = jnp.zeros(6, dtype=dtype)
        v = v + d.cdof[i] * d.qvel[i] + d.cdof[i + 1] * d.qvel[i + 1] \
            + d.cdof[i + 2] * d.qvel[i + 2]
        # rotation dofs: d/dt cdof = v x cdof (v: velocity incl. translation)
        for k in range(3, 6):
          cdof_dot[i + k] = tm.motion_cross(v, d.cdof[i + k])
        for k in range(3, 6):
          v = v + d.cdof[i + k] * d.qvel[i + k]
        i += 6
      elif jtype == JointType.BALL:
        for k in range(3):
          cdof_dot[i + k] = tm.motion_cross(v, d.cdof[i + k])
        for k in range(3):
          v = v + d.cdof[i + k] * d.qvel[i + k]
        i += 3
      else:  # hinge / slide: single dof
        cdof_dot[i] = tm.motion_cross(v, d.cdof[i])
        v = v + d.cdof[i] * d.qvel[i]
        i += 1
    cvel.append(v)

  cvel = jnp.stack(cvel)
  cdof_dot = (jnp.stack(cdof_dot) if m.nv
              else jnp.zeros((0, 6), dtype=dtype))
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)
