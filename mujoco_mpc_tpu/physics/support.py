"""Support queries over Data: object velocities, state get/set, state diff.

Equivalents of the utilities the reference residuals/estimators rely on
(mj_objectVelocity, SensorByName-backed framepos/framelinvel,
utilities.cc StateDiff on the quaternion manifold).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import Data, JointType, Model
from mujoco_mpc_tpu.utils import tpu_math as tm


def point_velocity(m: Model, d: Data, bodyid: int,
                   point: jax.Array) -> jax.Array:
  """World-frame linear velocity of a point attached to a body."""
  origin = d.subtree_com[m.body_rootid[bodyid]]
  w = d.cvel[bodyid, :3]
  return d.cvel[bodyid, 3:] + jnp.cross(w, point - origin)


def site_linvel(m: Model, d: Data, siteid: int) -> jax.Array:
  """Linear velocity of a site (analog: framelinvel sensor)."""
  return point_velocity(m, d, m.site_bodyid[siteid], d.site_xpos[siteid])


def body_angvel(m: Model, d: Data, bodyid: int) -> jax.Array:
  return d.cvel[bodyid, :3]


def subtree_linvel(m: Model, d: Data, bodyid: int) -> jax.Array:
  """Mass-weighted average linear velocity of a body subtree
  (analog: subtreelinvel sensor)."""
  total_mass = 0.0
  momentum = jnp.zeros(3, dtype=d.qpos.dtype)
  for b in range(bodyid, m.nbody):
    # descendant test: walk up the parent chain (static structure)
    anc = b
    while anc > 0 and anc != bodyid:
      anc = m.body_parentid[anc]
    if anc != bodyid and b != bodyid:
      continue
    v = point_velocity(m, d, b, d.xipos[b])
    momentum = momentum + m.body_mass[b] * v
    total_mass = total_mass + m.body_mass[b]
  return momentum / jnp.maximum(total_mass, 1e-12)


def _descendants(m: Model, bodyid: int):
  """Static list of bodies in the subtree rooted at bodyid."""
  out = []
  for b in range(bodyid, m.nbody):
    anc = b
    while anc > 0 and anc != bodyid:
      anc = m.body_parentid[anc]
    if anc == bodyid or b == bodyid:
      out.append(b)
  return out


def subtree_mass(m: Model, bodyid: int) -> jax.Array:
  total = jnp.zeros((), dtype=m.body_mass.dtype)
  for b in _descendants(m, bodyid):
    total = total + m.body_mass[b]
  return total


def subtree_angmom(m: Model, d: Data, bodyid: int) -> jax.Array:
  """Angular momentum of a subtree about its center of mass
  (analog: subtreeangmom sensor / mj_subtreeVel, used by the quadruped
  and humanoid Angmom cost terms, reference quadruped.cc)."""
  bodies = _descendants(m, bodyid)
  com = jnp.zeros(3, dtype=d.qpos.dtype)
  total = jnp.zeros((), dtype=d.qpos.dtype)
  for b in bodies:
    com = com + m.body_mass[b] * d.xipos[b]
    total = total + m.body_mass[b]
  com = com / jnp.maximum(total, 1e-12)
  h = jnp.zeros(3, dtype=d.qpos.dtype)
  for b in bodies:
    v = point_velocity(m, d, b, d.xipos[b])
    w = d.cvel[b, :3]
    # orbital term: m * (r - com) x v
    h = h + m.body_mass[b] * jnp.cross(d.xipos[b] - com, v)
    # spin term: R * I_body * R^T * w  (inertia in the ximat frame)
    inertia = jnp.asarray(m.body_inertia[b], dtype=d.qpos.dtype)
    R = d.ximat[b]
    h = h + R @ (inertia * (R.T @ w))
  return h


def get_state(d: Data) -> jax.Array:
  """Concatenated physics state (qpos, qvel, act), reference State order."""
  return jnp.concatenate([d.qpos, d.qvel, d.act])


def set_state(m: Model, d: Data, state: jax.Array) -> Data:
  qpos = state[:m.nq]
  qvel = state[m.nq:m.nq + m.nv]
  act = state[m.nq + m.nv:m.nq + m.nv + m.na]
  return d.replace(qpos=qpos, qvel=qvel, act=act)


def state_diff(m: Model, qpos1: jax.Array, qpos2: jax.Array) -> jax.Array:
  """Velocity-space difference (qpos2 ⊖ qpos1) / 1, handling quaternions
  (analog: mj_differentiatePos; used by iLQG feedback and estimators)."""
  out = jnp.zeros(m.nv, dtype=qpos1.dtype)
  for j in range(m.njnt):
    jtype = m.jnt_type[j]
    qadr, dofadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    if jtype == JointType.FREE:
      out = out.at[dofadr:dofadr + 3].set(
          qpos2[qadr:qadr + 3] - qpos1[qadr:qadr + 3])
      phi = tm.quat_sub(
          jax.lax.dynamic_slice(qpos2, (qadr + 3,), (4,)),
          jax.lax.dynamic_slice(qpos1, (qadr + 3,), (4,)))
      out = jax.lax.dynamic_update_slice(out, phi, (dofadr + 3,))
    elif jtype == JointType.BALL:
      phi = tm.quat_sub(
          jax.lax.dynamic_slice(qpos2, (qadr,), (4,)),
          jax.lax.dynamic_slice(qpos1, (qadr,), (4,)))
      out = jax.lax.dynamic_update_slice(out, phi, (dofadr,))
    else:
      out = out.at[dofadr].set(qpos2[qadr] - qpos1[qadr])
  return out


def integrate_state(m: Model, qpos: jax.Array, dq: jax.Array,
                    scale=1.0) -> jax.Array:
  """qpos ⊕ scale * dq (analog: mj_integratePos with dt=scale)."""
  return fwd.integrate_pos(m, qpos, dq, scale)


def _static_geoms(m: Model, group: int = 0):
  """Geoms in `group` on bodies with no dofs anywhere in their ancestor
  chain (the terrain/scene; analog of the reference Ground() raycast over
  group-0 static geoms, utilities.cc:538-556)."""
  out = []
  for g in range(m.ngeom):
    if m.geom_group[g] != group:
      continue
    b = m.geom_bodyid[g]
    static = True
    while b > 0:
      if m.body_dofnum[b]:
        static = False
        break
      b = m.body_parentid[b]
    if static:
      out.append(g)
  return tuple(out)


def _ray_geom(m: Model, d: Data, g: int, origin: jax.Array,
              dirn: jax.Array) -> jax.Array:
  """Ray-geom intersection distance (analog: mj_rayGeom); big on miss.

  Static per-geom dispatch over plane / sphere / ellipsoid / capsule /
  cylinder / box / mesh-hull; hfield is handled by the caller's
  specialized path. `dirn` must be unit length."""
  dtype = origin.dtype
  big = jnp.asarray(1e9, dtype=dtype)
  gtype = m.geom_type[g]
  gpos, gmat, size = d.geom_xpos[g], d.geom_xmat[g], m.geom_size[g]

  def quadratic(b, c):
    """Smallest positive root of t^2 + 2 b t + c = 0, big if none."""
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0, t1 = -b - sq, -b + sq
    t = jnp.where(t0 > 0, t0, jnp.where(t1 > 0, t1, big))
    return jnp.where(disc >= 0, t, big)

  if gtype == 0:                        # plane (one-sided, +z normal)
    n = gmat[:, 2]
    denom = jnp.dot(n, dirn)
    t = jnp.dot(n, gpos - origin) / jnp.where(
        jnp.abs(denom) < 1e-12, 1e-12, denom)
    return jnp.where(t > 0, t, big)
  if gtype == 2:                        # sphere
    oc = origin - gpos
    return quadratic(jnp.dot(oc, dirn), jnp.dot(oc, oc) - size[0] ** 2)
  if gtype == 4:                        # ellipsoid: scale to unit sphere
    o = (gmat.T @ (origin - gpos)) / size
    v = (gmat.T @ dirn) / size
    vv = jnp.dot(v, v)
    b = jnp.dot(o, v) / vv
    t = quadratic(b, (jnp.dot(o, o) - 1.0) / vv)
    # t is in scaled parameterization of the same line: x = o + t*v, and
    # world distance = t (v is not unit; fold |v| back in)
    return jnp.where(t < big, t, big)
  if gtype in (3, 5):                   # capsule / cylinder
    o = gmat.T @ (origin - gpos)
    v = gmat.T @ dirn
    r, h = size[0], size[1]
    # side surface: project out the axis (z)
    vv = v[0] ** 2 + v[1] ** 2
    vv_safe = jnp.maximum(vv, 1e-12)
    b = (o[0] * v[0] + o[1] * v[1]) / vv_safe
    c = (o[0] ** 2 + o[1] ** 2 - r * r) / vv_safe
    t_side = quadratic(b, c)
    z_at = o[2] + t_side * v[2]
    t_side = jnp.where(
        jnp.logical_and(vv > 1e-12, jnp.abs(z_at) <= h), t_side, big)
    if gtype == 3:                      # capsule: spherical end caps
      ts = [t_side]
      for zc in (-1.0, 1.0):
        cap = jnp.array([0.0, 0.0, zc], dtype) * h
        oc = o - cap
        t_cap = quadratic(jnp.dot(oc, v), jnp.dot(oc, oc) - r * r)
        zrel = o[2] + t_cap * v[2] - zc * h
        ts.append(jnp.where(zc * zrel >= 0, t_cap, big))
      return jnp.min(jnp.stack(ts))
    # cylinder: flat end discs
    ts = [t_side]
    vz = jnp.where(jnp.abs(v[2]) < 1e-12, 1e-12, v[2])
    for zc in (-1.0, 1.0):
      t_disc = (zc * h - o[2]) / vz
      x = o[0] + t_disc * v[0]
      y = o[1] + t_disc * v[1]
      ok = jnp.logical_and(t_disc > 0, x * x + y * y <= r * r)
      ts.append(jnp.where(ok, t_disc, big))
    return jnp.min(jnp.stack(ts))
  if gtype == 6:                        # box: slab test
    o = gmat.T @ (origin - gpos)
    v = gmat.T @ dirn
    v = jnp.where(jnp.abs(v) < 1e-12, 1e-12, v)
    t1 = (-size - o) / v
    t2 = (size - o) / v
    tmin = jnp.max(jnp.minimum(t1, t2))
    tmax = jnp.min(jnp.maximum(t1, t2))
    hit = jnp.logical_and(tmax >= jnp.maximum(tmin, 0.0), tmax > 0)
    return jnp.where(hit, jnp.where(tmin > 0, tmin, tmax), big)
  if gtype == 7 and g in m.geom_mesh:   # convex hull: halfspace slabs
    from mujoco_mpc_tpu.physics import collision
    _, n_w, b_w = collision._hull_world(m, d, g)
    num = -(n_w @ origin + b_w)                     # (F,)
    den = n_w @ dirn
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    t = num / den
    tmin = jnp.max(jnp.where(den < 0, t, -big))     # entering faces
    tmax = jnp.min(jnp.where(den > 0, t, big))      # exiting faces
    hit = jnp.logical_and(tmax >= jnp.maximum(tmin, 0.0), tmax > 0)
    return jnp.where(hit, jnp.where(tmin > 0, tmin, tmax), big)
  return big


def raycast(m: Model, d: Data, origin: jax.Array, dirn: jax.Array,
            exclude_body: int = -1) -> jax.Array:
  """Nearest intersection distance of a world ray against all geoms
  (analog: mj_ray; used by the rangefinder sensor). Skips geoms on
  `exclude_body` and non-colliding visual-only geoms; returns -1 on no
  hit (the rangefinder convention)."""
  dtype = origin.dtype
  big = jnp.asarray(1e9, dtype=dtype)
  dirn = dirn / jnp.maximum(jnp.linalg.norm(dirn), 1e-12)
  dists = [big]
  for g in range(m.ngeom):
    if exclude_body >= 0 and m.geom_bodyid[g] == exclude_body:
      continue
    if m.geom_contype[g] == 0 and m.geom_conaffinity[g] == 0 and \
       m.geom_type[g] != 0:
      continue                          # visual-only decoration
    dists.append(_ray_geom(m, d, g, origin, dirn))
  t = jnp.min(jnp.stack(dists))
  return jnp.where(t < big, t, jnp.asarray(-1.0, dtype=dtype))


def ground_height(m: Model, d: Data, pos: jax.Array) -> jax.Array:
  """Terrain height under world position `pos` (x, y): a vertical
  downward raycast against the static group-0 geoms (planes, boxes,
  spheres), TPU-native analog of the reference `Ground()` mj_ray query.
  Returns the z of the nearest surface; falls back to z=0 on no hit."""
  dtype = d.qpos.dtype
  geoms = _static_geoms(m)
  z0 = pos[2] + 0.5                     # start above in case of penetration
  origin = jnp.stack([pos[0], pos[1], z0])
  big = jnp.asarray(1e9, dtype=dtype)

  dists = []
  for g in geoms:
    gtype = m.geom_type[g]
    gpos = d.geom_xpos[g]
    gmat = d.geom_xmat[g]
    size = m.geom_size[g]
    if gtype == 0:      # plane: z = gpos_z - (n.(p - gpos))/n_z with n = R e_z
      n = gmat[:, 2]
      denom = jnp.where(jnp.abs(n[2]) < 1e-9, 1e-9, n[2])
      zs = gpos[2] + (n[0] * (gpos[0] - origin[0])
                      + n[1] * (gpos[1] - origin[1])) / denom
      dist = z0 - zs
    elif gtype == 2:    # sphere
      oc = origin - gpos
      # |oc - t e_z|^2 = r^2  ->  t^2 - 2 oc_z t + |oc|^2 - r^2 = 0
      b = oc[2]
      c = oc @ oc - size[0] * size[0]
      disc = b * b - c
      t = b - jnp.sqrt(jnp.maximum(disc, 0.0))
      dist = jnp.where(jnp.logical_and(disc >= 0, t > 0), t, big)
    elif gtype == 6:    # oriented box: slab test in the box frame
      o = gmat.T @ (origin - gpos)
      dd = gmat.T @ jnp.asarray([0.0, 0.0, -1.0], dtype=dtype)
      dd = jnp.where(jnp.abs(dd) < 1e-12, 1e-12, dd)
      t1 = (-size - o) / dd
      t2 = (size - o) / dd
      tmin = jnp.max(jnp.minimum(t1, t2))
      tmax = jnp.min(jnp.maximum(t1, t2))
      hit = jnp.logical_and(tmax >= tmin, tmax > 0)
      dist = jnp.where(hit, jnp.maximum(tmin, 0.0), big)
    elif gtype == 1:    # height field: piecewise-planar surface sample
      from mujoco_mpc_tpu.physics import collision
      lc = gmat.T @ (origin - gpos)
      z, _, inside = collision._hfield_surface(m, g, lc[0], lc[1])
      # vertical ray down from origin: hit at local z (hfield frames in
      # practice are axis-aligned; general tilts fall back to the z-axis
      # approximation)
      dist = jnp.where(inside, lc[2] - z, big)
    else:
      continue
    dists.append(jnp.asarray(dist, dtype=dtype))

  if not dists:
    return jnp.zeros((), dtype=dtype)
  dist = jnp.min(jnp.stack(dists))
  return jnp.where(dist < big, z0 - dist, jnp.zeros((), dtype=dtype))
