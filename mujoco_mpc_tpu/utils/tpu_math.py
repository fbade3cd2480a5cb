"""Quaternion / spatial-algebra math for the TPU physics pipeline.

All functions are pure jnp, shape-static, and safe under jit/vmap. Quaternion
convention is (w, x, y, z), matching MuJoCo. Spatial vectors are 6D with the
angular part first: v = (omega, v_lin), f = (torque, force) — Featherstone
convention, which is also what MuJoCo's com-based cdof/cinert use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small epsilon used to guard normalizations; double precision not assumed.
_EPS = 1e-12


def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
  """Normalize a vector, guarding against zero norm."""
  n = jnp.linalg.norm(v, axis=axis, keepdims=True)
  return v / jnp.maximum(n, _EPS)


def quat_normalize(q: jax.Array) -> jax.Array:
  return normalize(q, axis=-1)


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
  """Hamilton product u ∘ v for (w,x,y,z) quaternions."""
  return jnp.stack([
      u[..., 0] * v[..., 0] - u[..., 1] * v[..., 1]
      - u[..., 2] * v[..., 2] - u[..., 3] * v[..., 3],
      u[..., 0] * v[..., 1] + u[..., 1] * v[..., 0]
      + u[..., 2] * v[..., 3] - u[..., 3] * v[..., 2],
      u[..., 0] * v[..., 2] - u[..., 1] * v[..., 3]
      + u[..., 2] * v[..., 0] + u[..., 3] * v[..., 1],
      u[..., 0] * v[..., 3] + u[..., 1] * v[..., 2]
      - u[..., 2] * v[..., 1] + u[..., 3] * v[..., 0],
  ], axis=-1)


def quat_conj(q: jax.Array) -> jax.Array:
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rot(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by quaternion q (active rotation)."""
  # v' = v + 2 * r x (r x v + w v), with r = (x,y,z)
  r = q[..., 1:]
  w = q[..., 0:1]
  t = 2.0 * jnp.cross(r, v)
  return v + w * t + jnp.cross(r, t)


def quat_rot_inv(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by the inverse of quaternion q."""
  return quat_rot(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Quaternion to 3x3 rotation matrix."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  return jnp.stack([
      jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)], axis=-1),
      jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)], axis=-1),
      jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)], axis=-1),
  ], axis=-2)


def mat_to_quat(R: jax.Array) -> jax.Array:
  """Rotation matrix to unit quaternion (branchless Shepperd: all four
  candidate quats computed, the best-conditioned one selected)."""
  tr = R[0, 0] + R[1, 1] + R[2, 2]
  cand = jnp.stack([
      jnp.stack([1.0 + tr, R[2, 1] - R[1, 2],
                 R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]),
      jnp.stack([R[2, 1] - R[1, 2], 1.0 + 2.0 * R[0, 0] - tr,
                 R[0, 1] + R[1, 0], R[0, 2] + R[2, 0]]),
      jnp.stack([R[0, 2] - R[2, 0], R[0, 1] + R[1, 0],
                 1.0 + 2.0 * R[1, 1] - tr, R[1, 2] + R[2, 1]]),
      jnp.stack([R[1, 0] - R[0, 1], R[0, 2] + R[2, 0],
                 R[1, 2] + R[2, 1], 1.0 + 2.0 * R[2, 2] - tr]),
  ])                                                   # (4, 4)
  pivots = jnp.stack([1.0 + tr, 1.0 + 2.0 * R[0, 0] - tr,
                      1.0 + 2.0 * R[1, 1] - tr, 1.0 + 2.0 * R[2, 2] - tr])
  q = cand[jnp.argmax(pivots)]
  q = q * jnp.where(q[0] < 0, -1.0, 1.0)
  return q / jnp.maximum(jnp.linalg.norm(q), _EPS)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Unit-axis + angle to quaternion."""
  half = 0.5 * angle
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_exp(phi: jax.Array) -> jax.Array:
  """Exponential map: rotation vector phi (3,) -> quaternion.

  Safe at phi = 0 including second-order jvps: everything near zero is a
  polynomial in sum(phi^2) (norm() itself has a NaN gradient at 0, which
  nested jvps — e.g. the equality-constraint Jdot@qvel bias — would hit).
  """
  sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
  small = sq < 1e-16
  angle = jnp.sqrt(jnp.where(small, 1.0, sq))
  half = 0.5 * angle
  w = jnp.where(small, 1.0 - sq / 8.0 + sq * sq / 384.0, jnp.cos(half))
  k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
  return jnp.concatenate([w, phi * k], axis=-1)


def quat_integrate(q: jax.Array, omega_local: jax.Array,
                   dt: jax.Array) -> jax.Array:
  """Integrate quaternion by local-frame angular velocity over dt.

  Matches MuJoCo's mj_integratePos semantics for ball/free joints:
  q_next = q ∘ exp(omega_local * dt).
  """
  return quat_normalize(quat_mul(q, quat_exp(omega_local * dt)))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity (rotation vector, local frame) taking qb to qa.

  Matches MuJoCo's mju_subQuat: returns phi with qa = qb ∘ exp(phi).
  """
  dq = quat_mul(quat_conj(qb), qa)
  # log map
  sin_half = jnp.linalg.norm(dq[..., 1:], axis=-1, keepdims=True)
  cos_half = dq[..., 0:1]
  angle = 2.0 * jnp.arctan2(sin_half, cos_half)
  # wrap to (-pi, pi]
  angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
  axis = dq[..., 1:] / jnp.maximum(sin_half, _EPS)
  return jnp.where(sin_half < 1e-10, jnp.zeros_like(dq[..., 1:]),
                   axis * angle)


def skew(v: jax.Array) -> jax.Array:
  """3-vector to skew-symmetric matrix."""
  zero = jnp.zeros_like(v[..., 0])
  return jnp.stack([
      jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
      jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
      jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
  ], axis=-2)


# ---------------------------------------------------------------------------
# Spatial algebra (angular-first 6-vectors, com-based global frame)
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
  """Spatial motion cross product v ×m u (both 6D, angular first)."""
  ang = jnp.cross(v[..., :3], u[..., :3])
  lin = jnp.cross(v[..., :3], u[..., 3:]) + jnp.cross(v[..., 3:], u[..., :3])
  return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial force cross product v ×f f (dual of motion_cross)."""
  ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
  lin = jnp.cross(v[..., :3], f[..., 3:])
  return jnp.concatenate([ang, lin], axis=-1)


def inert_vec(ci: jax.Array, v: jax.Array) -> jax.Array:
  """Multiply spatial inertia (10-vector cinert layout) by motion vector.

  cinert layout matches MuJoCo: [I11 I22 I33 I12 I13 I23, h(3), m] where I is
  the 3x3 inertia about the frame origin and h = m * (com - origin).
  f_ang = I w + h × v_lin ; f_lin = m v_lin - h × w.
  """
  i11, i22, i33, i12, i13, i23 = (ci[..., 0], ci[..., 1], ci[..., 2],
                                  ci[..., 3], ci[..., 4], ci[..., 5])
  h = ci[..., 6:9]
  m = ci[..., 9:10]
  w = v[..., :3]
  vl = v[..., 3:]
  iw = jnp.stack([
      i11 * w[..., 0] + i12 * w[..., 1] + i13 * w[..., 2],
      i12 * w[..., 0] + i22 * w[..., 1] + i23 * w[..., 2],
      i13 * w[..., 0] + i23 * w[..., 1] + i33 * w[..., 2],
  ], axis=-1)
  f_ang = iw + jnp.cross(h, vl)
  f_lin = m * vl - jnp.cross(h, w)
  return jnp.concatenate([f_ang, f_lin], axis=-1)


def inert_from_body_quat(mass: jax.Array, diag_inertia: jax.Array,
                         xiquat: jax.Array, xipos: jax.Array,
                         origin: jax.Array) -> jax.Array:
  """cinert 10-vector like inert_from_body, but quaternion-native.

  Never materializes a (..., 3, 3) rotation matrix: the 6 unique world-
  frame inertia components are scalar expressions in the quaternion
  components, so the whole thing is ONE elementwise fusion. (Profiled on
  TPU: slicing io[..., a, b] out of a batched (B, nbody, 3, 3) tensor was
  the single most expensive op of the rollout step — 28% of device time —
  because the tiny trailing dims tile as (1, 128).)
  """
  w, x, y, z = (xiquat[..., 0], xiquat[..., 1], xiquat[..., 2],
                xiquat[..., 3])
  d1, d2, d3 = (diag_inertia[..., 0], diag_inertia[..., 1],
                diag_inertia[..., 2])
  # rotation matrix elements R[a][k] (row a, column k)
  r00 = 1 - 2 * (y * y + z * z)
  r01 = 2 * (x * y - w * z)
  r02 = 2 * (x * z + w * y)
  r10 = 2 * (x * y + w * z)
  r11 = 1 - 2 * (x * x + z * z)
  r12 = 2 * (y * z - w * x)
  r20 = 2 * (x * z - w * y)
  r21 = 2 * (y * z + w * x)
  r22 = 1 - 2 * (x * x + y * y)
  # I_c = R diag(d) R^T, unique components
  i11 = d1 * r00 * r00 + d2 * r01 * r01 + d3 * r02 * r02
  i22 = d1 * r10 * r10 + d2 * r11 * r11 + d3 * r12 * r12
  i33 = d1 * r20 * r20 + d2 * r21 * r21 + d3 * r22 * r22
  i12 = d1 * r00 * r10 + d2 * r01 * r11 + d3 * r02 * r12
  i13 = d1 * r00 * r20 + d2 * r01 * r21 + d3 * r02 * r22
  i23 = d1 * r10 * r20 + d2 * r11 * r21 + d3 * r12 * r22
  # parallel axis to origin: I_o = I_c + m (d'd 1 - d d')
  dv = xipos - origin
  dx, dy, dz = dv[..., 0], dv[..., 1], dv[..., 2]
  dd = dx * dx + dy * dy + dz * dz
  i11 = i11 + mass * (dd - dx * dx)
  i22 = i22 + mass * (dd - dy * dy)
  i33 = i33 + mass * (dd - dz * dz)
  i12 = i12 - mass * dx * dy
  i13 = i13 - mass * dx * dz
  i23 = i23 - mass * dy * dz
  h = mass[..., None] * dv
  return jnp.concatenate([
      jnp.stack([i11, i22, i33, i12, i13, i23], axis=-1), h,
      mass[..., None]], axis=-1)


def inert_from_body(mass: jax.Array, diag_inertia: jax.Array,
                    ximat: jax.Array, xipos: jax.Array,
                    origin: jax.Array) -> jax.Array:
  """Build cinert 10-vector: body inertia expressed at `origin` (world frame).

  mass: scalar; diag_inertia: (3,) principal inertia; ximat: (3,3) rotation of
  the inertial frame; xipos: (3,) world com; origin: (3,) frame origin.
  """
  d = xipos - origin
  # rotate principal inertia to world: I_c = R diag(i) R'
  ic = ximat @ (diag_inertia[..., None] * jnp.swapaxes(ximat, -1, -2))
  # parallel axis to origin: I_o = I_c + m (d'd 1 - d d')
  dd = jnp.sum(d * d, axis=-1)
  io = ic + mass * (dd * jnp.eye(3, dtype=ic.dtype)
                    - d[..., :, None] * d[..., None, :])
  h = mass * d
  return jnp.concatenate([
      jnp.stack([io[..., 0, 0], io[..., 1, 1], io[..., 2, 2],
                 io[..., 0, 1], io[..., 0, 2], io[..., 1, 2]], axis=-1),
      h,
      mass[..., None] if mass.ndim == d.ndim - 1 else jnp.atleast_1d(mass),
  ], axis=-1)


def match_vma(x, ref):
  """Give x the varying-manual-axes type of ref.

  Inside shard_map, freshly created constants are 'invariant' while data
  derived from sharded inputs is 'varying'; mixing them in a while_loop
  carry is a type error. No-op outside shard_map or when ref is invariant.
  """
  try:
    vma = frozenset(jax.typeof(ref).vma)
    have = frozenset(jax.typeof(x).vma)
  except AttributeError:
    return x
  missing = vma - have
  if missing:
    return jax.lax.pcast(x, tuple(missing), to='varying')
  return x
