"""Collision narrowphase: fixed-size candidate contacts from static pairs.

TPU-native analog of MuJoCo's collision stage as used inside the rollout
hot loop. The candidate pair list is computed once at model-compile time
(contype/conaffinity + parent filtering, model.py collision_pairs); the
narrowphase emits a FIXED number of candidate contact points per pair —
inactive points are masked by distance, so shapes are static and the whole
stage vmaps over rollout batches.

Supported primitive pairs (round 1): plane-{sphere, capsule, box},
sphere-{sphere, capsule, box}, capsule-capsule. Contact frames follow
mju_makeFrame's tangent construction; parameter combination (friction max,
solref/solimp solmix average, priority override) follows mj_contactParam.
Golden-tested against mujoco in tests/test_contacts.py.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data, GeomType, Model

_BIG = 1e10


class ContactPoint(NamedTuple):
  dist: jax.Array    # scalar; _BIG when the candidate is invalid
  pos: jax.Array     # (3,)
  normal: jax.Array  # (3,) from geom1 towards geom2


def _make_frame(n: jax.Array):
  """Tangent basis matching mju_makeFrame."""
  an = jnp.abs(n)
  # axis with the smallest |n_i|
  e = jnp.where(jnp.logical_and(an[0] <= an[1], an[0] <= an[2])[None],
                jnp.array([1.0, 0.0, 0.0], n.dtype),
                jnp.where((an[1] <= an[2])[None],
                          jnp.array([0.0, 1.0, 0.0], n.dtype),
                          jnp.array([0.0, 0.0, 1.0], n.dtype)))
  t1 = jnp.cross(n, e)
  t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
  t2 = jnp.cross(n, t1)
  return t1, t2


def _make_frames(n: jax.Array):
  """Batched tangent bases for (P, 3) normals (mju_makeFrame semantics)."""
  an = jnp.abs(n)
  ex = jnp.array([1.0, 0.0, 0.0], n.dtype)
  ey = jnp.array([0.0, 1.0, 0.0], n.dtype)
  ez = jnp.array([0.0, 0.0, 1.0], n.dtype)
  m01 = jnp.logical_and(an[:, 0] <= an[:, 1], an[:, 0] <= an[:, 2])
  m12 = an[:, 1] <= an[:, 2]
  e = jnp.where(m01[:, None], ex, jnp.where(m12[:, None], ey, ez))
  t1 = jnp.cross(n, e)
  t1 = t1 / jnp.maximum(
      jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
  t2 = jnp.cross(n, t1)
  return t1, t2


def _plane_sphere(pp, pn, c, r):
  dist = jnp.dot(pn, c - pp) - r
  pos = c - pn * (r + 0.5 * dist)
  return [ContactPoint(dist, pos, pn)]


def _plane_capsule(pp, pn, c, axis, half, r):
  pts = []
  for s in (-1.0, 1.0):
    e = c + s * half * axis
    pts.extend(_plane_sphere(pp, pn, e, r))
  return pts


def _plane_box(pp, pn, c, mat, size):
  pts = []
  for sx in (-1.0, 1.0):
    for sy in (-1.0, 1.0):
      for sz in (-1.0, 1.0):
        corner = c + mat @ (jnp.stack([sx * size[0], sy * size[1],
                                       sz * size[2]]))
        dist = jnp.dot(pn, corner - pp)
        pos = corner - 0.5 * dist * pn
        pts.append(ContactPoint(dist, pos, pn))
  return pts


def _sphere_sphere(c1, r1, c2, r2):
  d = c2 - c1
  ln = jnp.linalg.norm(d)
  n = d / jnp.maximum(ln, 1e-12)
  dist = ln - r1 - r2
  pos = c1 + n * (r1 + 0.5 * dist)
  return [ContactPoint(dist, pos, n)]


def _closest_on_segment(p, c, axis, half):
  t = jnp.clip(jnp.dot(p - c, axis), -half, half)
  return c + t * axis


def _segment_closest(c1, a1, h1, c2, a2, h2):
  """Closest points between two segments (standard clamped solve)."""
  r = c1 - c2
  a = 1.0
  e = 1.0
  b = jnp.dot(a1, a2)
  cdot = jnp.dot(a1, r)
  f = jnp.dot(a2, r)
  denom = jnp.maximum(a * e - b * b, 1e-12)
  s = jnp.clip((b * f - cdot * e) / denom, -h1, h1)
  t = jnp.clip((f + s * b) / e, -h2, h2)
  s = jnp.clip((t * b - cdot), -h1, h1)
  return c1 + s * a1, c2 + t * a2


def _sphere_box(c, r, bc, bmat, bsize):
  """Sphere vs box: closest surface point (shallow) only."""
  local = bmat.T @ (c - bc)
  clamped = jnp.clip(local, -bsize, bsize)
  inside = jnp.all(jnp.abs(local) < bsize)
  # shallow: vector from closest box point to sphere center
  delta = local - clamped
  ln = jnp.linalg.norm(delta)
  n_local_shallow = delta / jnp.maximum(ln, 1e-12)
  # deep: push out along the axis of least penetration
  depth = bsize - jnp.abs(local)
  k = jnp.argmin(depth)
  sign = jnp.sign(local[k])
  n_local_deep = jnp.zeros(3, dtype=c.dtype).at[k].set(sign)
  n_local = jnp.where(inside, n_local_deep, n_local_shallow)
  dist = jnp.where(inside, -(depth[k] + r), ln - r)
  surface_local = jnp.where(inside,
                            local + n_local * depth[k], clamped)
  n = bmat @ n_local
  surface = bc + bmat @ surface_local
  pos = surface + 0.5 * dist * n
  # normal points from box (geom1) to sphere? caller orients
  return [ContactPoint(dist, pos, n)]


def narrowphase(m: Model, d: Data, g1: int, g2: int) -> List[ContactPoint]:
  """Candidate contacts for one geom pair; normal from g1 towards g2."""
  t1, t2 = m.geom_type[g1], m.geom_type[g2]
  p1, p2 = d.geom_xpos[g1], d.geom_xpos[g2]
  m1, m2 = d.geom_xmat[g1], d.geom_xmat[g2]
  s1, s2 = m.geom_size[g1], m.geom_size[g2]

  if t1 == GeomType.PLANE:
    pn = m1[:, 2]
    if t2 == GeomType.SPHERE:
      return _plane_sphere(p1, pn, p2, s2[0])
    if t2 == GeomType.CAPSULE:
      return _plane_capsule(p1, pn, p2, m2[:, 2], s2[1], s2[0])
    if t2 == GeomType.BOX:
      return _plane_box(p1, pn, p2, m2, s2)
    if t2 == GeomType.CYLINDER or t2 == GeomType.ELLIPSOID:
      # approximate with bounding sphere (round 1)
      return _plane_sphere(p1, pn, p2, jnp.min(s2[:2]))
    return []
  if t1 == GeomType.SPHERE:
    if t2 == GeomType.SPHERE:
      return _sphere_sphere(p1, s1[0], p2, s2[0])
    if t2 == GeomType.CAPSULE:
      cp = _closest_on_segment(p1, p2, m2[:, 2], s2[1])
      return _sphere_sphere(p1, s1[0], cp, s2[0])
    if t2 == GeomType.BOX:
      pts = _sphere_box(p1, s1[0], p2, m2, s2)
      # _sphere_box normal points box->sphere = g2->g1; flip
      return [ContactPoint(c.dist, c.pos, -c.normal) for c in pts]
    return []
  if t1 == GeomType.BOX and t2 == GeomType.BOX:
    # corner-point approximation: each box's vertices tested against the
    # other box (sufficient for stacking/insertion between axis-scale
    # boxes; full SAT clipping is a follow-up)
    pts = []
    corners = jnp.array([[sx, sy, sz] for sx in (-1., 1.)
                         for sy in (-1., 1.) for sz in (-1., 1.)],
                        dtype=p1.dtype)
    for c in corners:
      v2 = p2 + m2 @ (c * s2)           # corner of box2 in world
      sub = _sphere_box(v2, 0.0, p1, m1, s1)
      pts.extend(sub)                   # normal already points box1->corner
      v1 = p1 + m1 @ (c * s1)           # corner of box1 in world
      sub = _sphere_box(v1, 0.0, p2, m2, s2)
      pts.extend(ContactPoint(q.dist, q.pos, -q.normal) for q in sub)
    return pts
  if t1 == GeomType.CAPSULE:
    if t2 == GeomType.CAPSULE:
      q1, q2 = _segment_closest(p1, m1[:, 2], s1[1], p2, m2[:, 2], s2[1])
      return _sphere_sphere(q1, s1[0], q2, s2[0])
    if t2 == GeomType.BOX:
      # approximate capsule by its two end spheres (round 1)
      pts = []
      for s in (-1.0, 1.0):
        e = p1 + s * s1[1] * m1[:, 2]
        sub = _sphere_box(e, s1[0], p2, m2, s2)
        pts.extend(ContactPoint(c.dist, c.pos, -c.normal) for c in sub)
      return pts
    return []
  return []


class PairParams(NamedTuple):
  """Combined contact parameters for a pair (mj_contactParam rules)."""
  friction: jax.Array      # (3,) sliding, torsional, rolling friction
  solref: jax.Array        # (2,)
  solimp: jax.Array        # (5,)
  includemargin: jax.Array  # margin - gap
  condim: int
  invweight: jax.Array     # translational invweight sum


def pair_params(m: Model, g1: int, g2: int) -> PairParams:
  p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
  b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
  invweight = (m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
  margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
  gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])
  if p1 != p2:
    g = g1 if p1 > p2 else g2
    return PairParams(
        friction=m.geom_friction[g], solref=m.geom_solref[g],
        solimp=m.geom_solimp[g], includemargin=margin - gap,
        condim=m.geom_condim[g], invweight=invweight)
  mix1, mix2 = m.geom_solmix[g1], m.geom_solmix[g2]
  wsum = jnp.maximum(mix1 + mix2, 1e-12)
  w1 = jnp.where(jnp.logical_and(mix1 < 1e-12, mix2 < 1e-12), 0.5,
                 mix1 / wsum)
  w2 = 1.0 - w1
  solref = jnp.where(
      jnp.logical_and(m.geom_solref[g1, 0] > 0, m.geom_solref[g2, 0] > 0),
      w1 * m.geom_solref[g1] + w2 * m.geom_solref[g2],
      jnp.minimum(m.geom_solref[g1], m.geom_solref[g2]))
  solimp = w1 * m.geom_solimp[g1] + w2 * m.geom_solimp[g2]
  # element-wise max over (sliding, torsional, rolling)
  friction = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
  return PairParams(
      friction=friction, solref=solref, solimp=solimp,
      includemargin=margin - gap,
      condim=max(m.geom_condim[g1], m.geom_condim[g2]),
      invweight=invweight)
