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


def _wrap_2d(a2, b2, r, side2, has_side, dtype):
  """Circle wrap in 2D (mju_wrap's core): tangent path from a2 around the
  radius-r circle at the origin to b2.

  Returns (t0, t1, arc_len, wrapped): the two tangent touch points, the
  arc length between them, and whether the path wraps at all. With a
  sidesite the tendon is constrained to pass on its side: the path
  wraps whenever the straight chord intersects the circle OR passes on
  the opposite side of the center from the sidesite (and always when
  the sidesite is inside the geom); the arc is taken on the sidesite's
  side. Without one, wrap requires chord-circle intersection and takes
  the shorter arc. No wrap when an endpoint is inside the circle
  (tangency undefined)."""
  eps = 1e-12
  da = jnp.linalg.norm(a2)
  db = jnp.linalg.norm(b2)
  # chord-circle clearance (closest point of segment a->b to origin)
  ab = b2 - a2
  denom = jnp.maximum(ab @ ab, eps)
  tstar = jnp.clip(-(a2 @ ab) / denom, 0.0, 1.0)
  foot = a2 + tstar * ab
  dmin = jnp.linalg.norm(foot)
  # sidesite inside the geom forces permanent wrap (MuJoCo semantics)
  force = jnp.logical_and(has_side, jnp.linalg.norm(side2) < r)
  # chord passing opposite the sidesite violates the side constraint
  off_side = jnp.logical_and(has_side, (foot @ side2) < 0.0)
  wrapped = jnp.logical_and(
      jnp.logical_and(da > r * (1.0 + 1e-9), db > r * (1.0 + 1e-9)),
      jnp.logical_or(dmin < r, jnp.logical_or(force, off_side)))

  alpha_a = jnp.arctan2(a2[1], a2[0])
  alpha_b = jnp.arctan2(b2[1], b2[0])
  ha = jnp.arccos(jnp.clip(r / jnp.maximum(da, r + eps), 0.0, 1.0))
  hb = jnp.arccos(jnp.clip(r / jnp.maximum(db, r + eps), 0.0, 1.0))

  def arc_for(sgn):
    th_a = alpha_a + sgn * ha          # touch point leaving a
    th_b = alpha_b - sgn * hb          # touch point arriving at b
    delta = jnp.mod(sgn * (th_b - th_a), 2.0 * jnp.pi)
    return th_a, th_b, delta

  th_a_p, th_b_p, d_p = arc_for(jnp.asarray(1.0, dtype))
  th_a_m, th_b_m, d_m = arc_for(jnp.asarray(-1.0, dtype))

  def touch_score(th_a, th_b, sn):
    """Alignment of the two tangent touch points with the sidesite."""
    return (jnp.cos(th_a) + jnp.cos(th_b)) * sn[0] + \
        (jnp.sin(th_a) + jnp.sin(th_b)) * sn[1]

  # side choice: the two candidate wraps touch the circle on opposite
  # sides; with a sidesite pick the side whose TOUCH POINTS align with
  # it (an arc-midpoint criterion ties when both midpoints coincide,
  # which happens whenever the two arcs share a bisector), else the
  # shorter arc
  sn = side2 / jnp.maximum(jnp.linalg.norm(side2), eps)
  use_p = jnp.where(
      has_side,
      touch_score(th_a_p, th_b_p, sn) >= touch_score(th_a_m, th_b_m, sn),
      d_p <= d_m)
  th_a = jnp.where(use_p, th_a_p, th_a_m)
  th_b = jnp.where(use_p, th_b_p, th_b_m)
  delta = jnp.where(use_p, d_p, d_m)
  t0 = r * jnp.stack([jnp.cos(th_a), jnp.sin(th_a)])
  t1 = r * jnp.stack([jnp.cos(th_b), jnp.sin(th_b)])
  return t0, t1, r * delta, wrapped


def _wrap_geom(m: Model, d: Data, x1, x2, g: int, kind: int, side: int):
  """Tangent points + arc length of the path x1 -> (wrap geom g) -> x2
  (analog: mju_wrap). Returns (t1_w, t2_w, arc, wrapped) in world frame;
  when not wrapped the caller's straight-segment fallback applies."""
  dtype = x1.dtype
  gpos, gmat = d.geom_xpos[g], d.geom_xmat[g]
  r = m.geom_size[g][0]
  p1 = gmat.T @ (x1 - gpos)
  p2 = gmat.T @ (x2 - gpos)
  if side >= 0:
    s_loc = gmat.T @ (d.site_xpos[side] - gpos)
    has_side = jnp.asarray(True)
  else:
    s_loc = jnp.ones(3, dtype)
    has_side = jnp.asarray(False)

  if kind == 1:
    # cylinder: wrap in the local xy-plane; z rides the developed
    # (unrolled) surface, on which the path is a straight line
    a2, b2 = p1[:2], p2[:2]
    t0_2, t1_2, arc2, wrapped = _wrap_2d(a2, b2, r, s_loc[:2], has_side,
                                         dtype)
    la = jnp.linalg.norm(a2 - t0_2)
    lb = jnp.linalg.norm(b2 - t1_2)
    l2d = jnp.maximum(la + arc2 + lb, 1e-12)
    dz = p2[2] - p1[2]
    z0 = p1[2] + dz * la / l2d
    z1 = p1[2] + dz * (la + arc2) / l2d
    t0_l = jnp.concatenate([t0_2, z0[None]])
    t1_l = jnp.concatenate([t1_2, z1[None]])
    arc = jnp.sqrt(arc2 * arc2 + (z1 - z0) ** 2)
  else:
    # sphere: wrap in the plane through p1, p2 and the center; the
    # sidesite defines the plane when p1 x p2 degenerates
    n = jnp.cross(p1, p2)
    n_side = jnp.cross(p1, s_loc)
    use_alt = jnp.linalg.norm(n) < 1e-9
    n = jnp.where(use_alt, jnp.where(jnp.linalg.norm(n_side) > 1e-9,
                                     n_side, jnp.asarray([0., 0., 1.],
                                                         dtype)), n)
    ez = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
    ex = p1 - (p1 @ ez) * ez
    ex = ex / jnp.maximum(jnp.linalg.norm(ex), 1e-12)
    ey = jnp.cross(ez, ex)
    to2 = lambda p: jnp.stack([p @ ex, p @ ey])
    a2, b2 = to2(p1), to2(p2)
    t0_2, t1_2, arc, wrapped = _wrap_2d(a2, b2, r, to2(s_loc), has_side,
                                        dtype)
    t0_l = t0_2[0] * ex + t0_2[1] * ey
    t1_l = t1_2[0] * ex + t1_2[1] * ey
  t0_w = gpos + gmat @ t0_l
  t1_w = gpos + gmat @ t1_l
  return t0_w, t1_w, arc, wrapped


def tendon(m: Model, d: Data) -> Data:
  """Tendon lengths, velocities and moment rows (analog: mj_tendon).

  Fixed tendons are linear maps of joint coordinates (single matmuls
  against constant model matrices). Spatial tendons are paths over site
  waypoints and sphere/cylinder wrap surfaces: per branch with pulley
  divisor v, length += path_len/v and the moment row is the analytic
  dL/dq — straight segments contribute u^T (Jp2 - Jp1)/v, and a wrap
  contributes through its two tangent segments with the tangent points
  attached to the wrap geom's body (the arc's own derivative vanishes:
  tangency makes L stationary w.r.t. touch-point sliding, and the arc
  between material touch points is invariant under rigid geom motion).
  The no-wrap case degenerates exactly to the straight segment by
  placing both tangent points at the segment midpoint. (Reference gets
  tendons from mj_step; Shadow-class hand models use them for coupling
  and actuation.)"""
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
    for divisor, elems in branches:
      inv = 1.0 / divisor
      # walk site-to-site gaps, each optionally through one wrap geom
      i = 0
      while i + 1 < len(elems):
        assert elems[i][0] == 's', 'tendon path must start gaps at a site'
        s1 = elems[i][1]
        if elems[i + 1][0] == 'g':
          _, g, kind, sideid = elems[i + 1]
          s2 = elems[i + 2][1]
          i += 2
        else:
          g, kind, sideid = -1, 0, -1
          s2 = elems[i + 1][1]
          i += 1
        x1, x2 = d.site_xpos[s1], d.site_xpos[s2]
        jp1, _ = _body_jac(m, d, m.site_bodyid[s1], x1)
        jp2, _ = _body_jac(m, d, m.site_bodyid[s2], x2)
        if g < 0:
          diff = x2 - x1
          ln = jnp.linalg.norm(diff)
          u = diff / jnp.maximum(ln, 1e-12)
          ln_total = ln_total + ln * inv
          jac = jac + ((jp2 - jp1) @ u) * inv
          continue
        t1, t2, arc, wrapped = _wrap_geom(m, d, x1, x2, g, kind, sideid)
        midpt = 0.5 * (x1 + x2)
        t1 = jnp.where(wrapped, t1, midpt)
        t2 = jnp.where(wrapped, t2, midpt)
        arc = jnp.where(wrapped, arc, 0.0)
        d1 = t1 - x1
        d2 = x2 - t2
        l1 = jnp.linalg.norm(d1)
        l2 = jnp.linalg.norm(d2)
        u1 = d1 / jnp.maximum(l1, 1e-12)
        u2 = d2 / jnp.maximum(l2, 1e-12)
        jg1, _ = _body_jac(m, d, m.geom_bodyid[g], t1)
        jg2, _ = _body_jac(m, d, m.geom_bodyid[g], t2)
        ln_total = ln_total + (l1 + arc + l2) * inv
        jac = jac + (((jg1 - jp1) @ u1) + ((jp2 - jg2) @ u2)) * inv
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
