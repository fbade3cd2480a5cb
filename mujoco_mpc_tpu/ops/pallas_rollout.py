"""Fused whole-rollout Pallas kernel for small smooth (contact-free) models.

The sampling-planner hot loop on smooth models (Cartpole headline,
Particle, Acrobot) is `vmap(lax.scan(step))`: ~100 sequential scan
iterations whose per-step tensors are a few KB — profiled on TPU the cost
is loop/dispatch overhead, not FLOPs (docs/PERF.md). This kernel runs the
ENTIRE horizon for 128 candidates per Pallas program: the carry
(qpos, qvel) lives in VMEM with candidates in lanes, every step is
straight-line VPU code, and HBM traffic is one read of the action tensor
plus one write of the state trajectory.

The step is the physics pipeline re-expressed in LANE FORM (the same
idiom as ops/pallas_newton.py): every scalar of FK / CRB / RNE /
actuation / the joint-limit Newton / semi-implicit Euler is a
(128,)-lane vector over candidates, every model constant is a baked-in
Python float (Pallas kernels may not capture non-scalar traced
constants), and the tree recursions are unrolled over the static model
structure. The math mirrors physics/{kinematics,smooth}.py +
constraint._limit_rows_scalar + forward._euler and is pinned to the XLA
path by tests/test_pallas_rollout.py.

Residual/cost evaluation happens OUTSIDE (planners/rollout.py): the
kernel returns pre-integration states (x_t, the state at which u_t is
applied — reference semantics trajectory.cc:141-180) and the caller
re-runs the batched forward over all (B, T) states at once, where XLA
dead-code-eliminates every stage the task residual does not read.
Static (mocap/world-attached) bodies carry no dofs, so the kernel skips
them entirely — they only matter to residuals.

Gated off by default until validated on hardware: set
MJPC_TPU_FUSED_ROLLOUT=1 to enable on TPU. Reference for the replaced
loop: Trajectory::Rollout + ThreadPool fan-out
(/root/reference/mjpc/trajectory.cc:92-210, threadpool.cc:51-80).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mujoco_mpc_tpu.physics.model import JointType, Model

LANES = 128
MAX_NV = 8
_DAMP = 1e-10
_ALPHAS = (0.0, 1.0, 0.5, 0.25, 0.0625)
_MIN_IMP, _MAX_IMP = 0.0001, 0.9999

# test hook: force the kernel path in interpret mode regardless of
# platform/env (tests/test_pallas_rollout.py)
FORCE_INTERPRET = False


def _concrete(x) -> bool:
  try:
    np.asarray(x)
    return True
  except Exception:
    return False


def eligible(m: Model) -> bool:
  """Static model eligibility for the fused rollout kernel."""
  # mocap / static bodies are fine: they carry no dofs and do not enter
  # the smooth dynamics; residuals see them via the XLA phase outside
  if not (0 < m.nv <= MAX_NV) or m.na:
    return False
  if m.collision_pairs or m.ntendon or m.neq:
    return False
  if m.opt.integrator != 0:   # Euler only
    return False
  if m.any_gravcomp:
    return False
  if any(t not in (int(JointType.SLIDE), int(JointType.HINGE))
         for t in m.jnt_type):
    return False
  if m.nu and any(t != 0 for t in np.asarray(m.actuator_trntype)):
    return False              # joint transmissions only
  if m.nu and any(int(t) not in (0,) for t in
                  np.asarray(m.actuator_dyntype)):
    return False              # no activation dynamics
  # fluid forces / options gate on concrete leaves; a traced model
  # (passed as a jit argument rather than closed over) is ineligible
  for leaf in (m.opt.density, m.opt.viscosity, m.opt.gravity,
               m.opt.timestep, m.body_pos, m.jnt_range):
    if not _concrete(leaf):
      return False
  if float(np.asarray(m.opt.density)) != 0.0 or \
     float(np.asarray(m.opt.viscosity)) != 0.0:
    return False
  return True


def enabled() -> bool:
  return os.environ.get('MJPC_TPU_FUSED_ROLLOUT', '') == '1'


def _on_tpu() -> bool:
  try:
    return jax.default_backend() == 'tpu' or any(
        d.platform == 'tpu' for d in jax.devices())
  except RuntimeError:
    return False


# ---------------------------------------------------------------------------
# lane algebra: vec3 = [x, y, z] of (L,) arrays (or Python floats for
# constants); mat3 = 3x3 nested list. Model constants stay Python floats.
# ---------------------------------------------------------------------------


def _np_mat_from_quat(q):
  w, x, y, z = [float(v) for v in q]
  return [[1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
          [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
          [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]]


def _matmul3(a, b):
  return [[sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]


def _matvec3(a, v):
  return [sum(a[i][k] * v[k] for k in range(3)) for i in range(3)]


def _cross3(a, b):
  return [a[1] * b[2] - a[2] * b[1],
          a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]]


def _add3(a, b):
  return [a[i] + b[i] for i in range(3)]


def _sub3(a, b):
  return [a[i] - b[i] for i in range(3)]


def _scale3(a, s):
  return [a[i] * s for i in range(3)]


def _dot6(a, b):
  return sum(a[i] * b[i] for i in range(6))


def _motion_cross(v, u):
  """Spatial motion cross (angular first), 6-lists."""
  ang = _cross3(v[:3], u[:3])
  lin = _add3(_cross3(v[:3], u[3:]), _cross3(v[3:], u[:3]))
  return ang + lin


def _force_cross(v, f):
  ang = _add3(_cross3(v[:3], f[:3]), _cross3(v[3:], f[3:]))
  lin = _cross3(v[:3], f[3:])
  return ang + lin


def _inert_vec(ci, v):
  """cinert = (i6 list, h3 list, mass float); v 6-list.
  f_ang = I w + h x v_lin; f_lin = m v_lin - h x w (tpu_math.inert_vec)."""
  i6, h, mass = ci
  i11, i22, i33, i12, i13, i23 = i6
  w, vl = v[:3], v[3:]
  iw = [i11 * w[0] + i12 * w[1] + i13 * w[2],
        i12 * w[0] + i22 * w[1] + i23 * w[2],
        i13 * w[0] + i23 * w[1] + i33 * w[2]]
  f_ang = _add3(iw, _cross3(h, vl))
  f_lin = _sub3(_scale3(vl, mass), _cross3(h, w))
  return f_ang + f_lin


def _chol_solve_lists(h, g, n):
  """Cholesky solve with h list-of-lists of lanes, g list of lanes
  (the ops/pallas_newton.py kernel idiom)."""
  eps = 1e-30
  col = [[None] * n for _ in range(n)]
  inv_diag = [None] * n
  for j in range(n):
    s = h[j][j]
    for k in range(j):
      s = s - col[j][k] * col[j][k]
    ljj = jnp.sqrt(jnp.maximum(s, eps))
    col[j][j] = ljj
    inv = 1.0 / ljj
    inv_diag[j] = inv
    for i in range(j + 1, n):
      s = h[i][j]
      for k in range(j):
        s = s - col[i][k] * col[j][k]
      col[i][j] = s * inv
  y = [None] * n
  for i in range(n):
    s = g[i]
    for k in range(i):
      s = s - col[i][k] * y[k]
    y[i] = s * inv_diag[i]
  x = [None] * n
  for i in reversed(range(n)):
    s = y[i]
    for k in range(i + 1, n):
      s = s - col[k][i] * x[k]
    x[i] = s * inv_diag[i]
  return x


def _kbi_scalar(solref, solimp, pos):
  """constraint.kbi with float solref/solimp and a lane pos."""
  d0, dw, width, mid, power = [float(v) for v in solimp]
  x = jnp.clip(jnp.abs(pos) / max(width, 1e-12), 0.0, 1.0)
  mid = min(max(mid, 1e-6), 1 - 1e-6)
  power = max(power, 1.0)
  y_lo = (x / mid) ** power * mid
  y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** power * (1.0 - mid)
  y = jnp.where(x <= mid, y_lo, y_hi)
  imp = jnp.clip(d0 + y * (dw - d0), _MIN_IMP, _MAX_IMP)
  dmax = min(max(max(d0, dw), _MIN_IMP), _MAX_IMP)
  timeconst, dampratio = float(solref[0]), float(solref[1])
  if timeconst <= 0 and dampratio <= 0:   # direct form
    k = -timeconst / max(dmax * dmax, 1e-12)
    b = -dampratio / max(dmax, 1e-12)
  else:
    k = 1.0 / max(dmax * dmax * timeconst * timeconst
                  * dampratio * dampratio, 1e-12)
    b = 2.0 / max(dmax * timeconst, 1e-12)
  return k, b, imp


# ---------------------------------------------------------------------------
# the lane-form step, generated from the static model structure
# ---------------------------------------------------------------------------


def _model_tables(m: Model):
  """Static host-side tables driving the unrolled step."""
  f = lambda x: np.asarray(x, dtype=np.float64)
  t = {}
  t['nv'] = m.nv
  t['nbody'] = m.nbody
  t['parent'] = [int(p) for p in m.body_parentid]
  t['body_pos'] = f(m.body_pos)
  t['body_rot'] = [_np_mat_from_quat(q) for q in f(m.body_quat)]
  t['body_ipos'] = f(m.body_ipos)
  t['body_irot'] = [_np_mat_from_quat(q) for q in f(m.body_iquat)]
  t['mass'] = [float(v) for v in f(m.body_mass)]
  t['diag_inertia'] = f(m.body_inertia)
  t['rootid'] = [int(r) for r in m.body_rootid]
  t['qpos0'] = [float(v) for v in f(m.qpos0)]
  # joints per body, in declaration order
  t['body_joints'] = [
      [(int(m.jnt_type[j]), j, int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j]),
        [float(v) for v in f(m.jnt_axis)[j]],
        [float(v) for v in f(m.jnt_pos)[j]])
       for j in range(m.body_jntadr[b],
                      m.body_jntadr[b] + m.body_jntnum[b])]
      for b in range(m.nbody)]
  # dynamic bodies: every body of a kinematic tree that carries any dof
  # (welded/jointless children still contribute mass and inertia; purely
  # static trees — mocap markers, visual frames — are skipped: they do
  # not enter the smooth dynamics)
  has_dof = [bool(t['body_joints'][b]) for b in range(m.nbody)]
  tree_has_dof = set()
  for b in range(1, m.nbody):
    if has_dof[b]:
      tree_has_dof.add(t['rootid'][b])
  t['dynamic_bodies'] = [b for b in range(1, m.nbody)
                         if t['rootid'][b] in tree_has_dof]
  # ancestor-or-self dof lists per body
  body_dofs = [[] for _ in range(m.nbody)]
  for b in range(m.nbody):
    for (_, j, qadr, dofadr, _, _) in t['body_joints'][b]:
      body_dofs[b].append(dofadr)
  anc_dofs = [[] for _ in range(m.nbody)]
  for b in range(1, m.nbody):
    chain = []
    c = b
    while c > 0:
      chain = body_dofs[c] + chain
      c = t['parent'][c]
    anc_dofs[b] = chain
  t['anc_dofs'] = anc_dofs
  t['body_dofs'] = body_dofs
  # dof_vel 'seen' lists (structure.dof_vel_mask, scalar joints only):
  # ancestor-body dofs plus same-body dofs already processed
  seen_lists = [[] for _ in range(m.nv)]
  for b in range(1, m.nbody):
    anc = []
    c = t['parent'][b]
    while c > 0:
      anc = body_dofs[c] + anc
      c = t['parent'][c]
    seen = list(anc)
    for (_, j, qadr, dofadr, _, _) in t['body_joints'][b]:
      seen_lists[dofadr] = list(seen)
      seen.append(dofadr)
  t['dof_seen'] = seen_lists
  # subtree body sets
  sub = [set([b]) for b in range(m.nbody)]
  for b in range(m.nbody - 1, 0, -1):
    sub[t['parent'][b]] |= sub[b]
  t['subtree'] = [sorted(s) for s in sub]
  # ancestor-or-self dof mask pairs for M: (i, j) with j in anc-or-self(i)
  t['damping'] = [float(v) for v in f(m.dof_damping)]
  t['armature'] = [float(v) for v in f(m.dof_armature)]
  t['gravity'] = [float(v) for v in f(m.opt.gravity)]
  t['timestep'] = float(np.asarray(m.opt.timestep))
  t['jnt_stiffness'] = [float(v) for v in f(m.jnt_stiffness)]
  t['qpos_spring'] = [float(v) for v in f(m.qpos_spring)]
  # actuators (joint transmission, scalar joints, no act dynamics)
  acts = []
  for u in range(m.nu):
    j = int(m.actuator_trnid[u]) if np.ndim(m.actuator_trnid[u]) == 0 \
        else int(np.asarray(m.actuator_trnid)[u])
    acts.append(dict(
        dof=int(m.jnt_dofadr[j]), qadr=int(m.jnt_qposadr[j]),
        gear=float(f(m.actuator_gear)[u, 0]),
        gaintype=int(np.asarray(m.actuator_gaintype)[u]),
        gainprm=[float(v) for v in f(m.actuator_gainprm)[u, :3]],
        biastype=int(np.asarray(m.actuator_biastype)[u]),
        biasprm=[float(v) for v in f(m.actuator_biasprm)[u, :3]],
        ctrllimited=bool(np.asarray(m.actuator_ctrllimited)[u]),
        ctrlrange=[float(v) for v in f(m.actuator_ctrlrange)[u]],
        forcelimited=bool(np.asarray(m.actuator_forcelimited)[u]),
        forcerange=[float(v) for v in f(m.actuator_forcerange)[u]]))
  t['actuators'] = acts
  # joint limits (scalar joints)
  lims = []
  for j in range(m.njnt):
    if m.jnt_limited[j]:
      lims.append(dict(
          qadr=int(m.jnt_qposadr[j]), dof=int(m.jnt_dofadr[j]),
          lo=float(f(m.jnt_range)[j, 0]), hi=float(f(m.jnt_range)[j, 1]),
          margin=float(f(m.jnt_margin)[j]),
          solref=[float(v) for v in f(m.jnt_solref)[j]],
          solimp=[float(v) for v in f(m.jnt_solimp)[j]],
          invw=float(f(m.dof_invweight0)[int(m.jnt_dofadr[j])])))
  t['limits'] = lims
  return t


def _lane_step(t, qp, qv, u, cap):
  """One physics step in lane form. qp/qv: lists of nv (L,) lanes;
  u: list of nu lanes. Returns (qp', qv')."""
  nv = t['nv']
  nbody = t['nbody']

  # ---- forward kinematics (physics/kinematics.kinematics) ----
  zero = jnp.zeros_like(qp[0])
  one = jnp.ones_like(qp[0])
  R = [None] * nbody
  P = [None] * nbody
  R[0] = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
  P[0] = [zero, zero, zero]
  jaxis_w = {}
  janchor_w = {}
  for b in t['dynamic_bodies']:
    par = t['parent'][b]
    Rp, Pp = R[par], P[par]
    off = [float(v) for v in t['body_pos'][b]]
    Rb = _matmul3(Rp, t['body_rot'][b])
    Pb = _add3(Pp, _matvec3(Rp, off))
    for (jtype, j, qadr, dofadr, axis_l, jpos_l) in t['body_joints'][b]:
      axis_w = _matvec3(Rb, axis_l)
      anchor = _add3(Pb, _matvec3(Rb, jpos_l))
      dq = qp[qadr] - t['qpos0'][qadr]
      if jtype == int(JointType.SLIDE):
        Pb = _add3(Pb, _scale3(axis_w, dq))
      else:  # hinge: R <- R @ Rloc(axis_local, dq); P = anchor - R' jpos
        c = jnp.cos(dq)
        s = jnp.sin(dq)
        ax, ay, az = axis_l
        omc = 1.0 - c
        rloc = [[c + ax * ax * omc, ax * ay * omc - az * s,
                 ax * az * omc + ay * s],
                [ay * ax * omc + az * s, c + ay * ay * omc,
                 ay * az * omc - ax * s],
                [az * ax * omc - ay * s, az * ay * omc + ax * s,
                 c + az * az * omc]]
        Rb = _matmul3(Rb, rloc)
        Pb = _sub3(anchor, _matvec3(Rb, jpos_l))
      jaxis_w[dofadr] = axis_w
      janchor_w[dofadr] = anchor
      # a second joint on the same body sees the updated frame
      axis_w = None
    R[b], P[b] = Rb, Pb

  # ---- com quantities (kinematics.com_pos) ----
  xipos = {}
  irot = {}
  for b in t['dynamic_bodies']:
    xipos[b] = _add3(P[b], _matvec3(R[b], [float(v)
                                           for v in t['body_ipos'][b]]))
    irot[b] = _matmul3(R[b], t['body_irot'][b])
  # subtree com of each root (mass-weighted over its DYNAMIC subtree)
  root_com = {}
  for b in t['dynamic_bodies']:
    r = t['rootid'][b]
    if r in root_com:
      continue
    tot = 0.0
    acc = [zero, zero, zero]
    for c in t['subtree'][r]:
      if c in xipos:
        mc = t['mass'][c]
        tot += mc
        acc = _add3(acc, _scale3(xipos[c], mc))
    root_com[r] = _scale3(acc, 1.0 / max(tot, 1e-12))

  # cinert per dynamic body: (i6 lanes, h3 lanes, mass float) about the
  # root subtree com (tpu_math.inert_from_body)
  cinert = {}
  for b in t['dynamic_bodies']:
    Ri = irot[b]
    di = [float(v) for v in t['diag_inertia'][b]]
    mass = t['mass'][b]
    # I_c = R diag R^T
    ic = [[sum(di[k] * Ri[a][k] * Ri[bb][k] for k in range(3))
           for bb in range(3)] for a in range(3)]
    d3 = _sub3(xipos[b], root_com[t['rootid'][b]])
    dd = d3[0] * d3[0] + d3[1] * d3[1] + d3[2] * d3[2]
    i6 = [ic[0][0] + mass * (dd - d3[0] * d3[0]),
          ic[1][1] + mass * (dd - d3[1] * d3[1]),
          ic[2][2] + mass * (dd - d3[2] * d3[2]),
          ic[0][1] - mass * d3[0] * d3[1],
          ic[0][2] - mass * d3[0] * d3[2],
          ic[1][2] - mass * d3[1] * d3[2]]
    cinert[b] = (i6, _scale3(d3, mass), mass)

  # cdof per dof (kinematics.com_pos cdof assembly)
  dof_body = [None] * nv
  for b in t['dynamic_bodies']:
    for (jtype, j, qadr, dofadr, _, _) in t['body_joints'][b]:
      dof_body[dofadr] = (b, jtype)
  cdof = [None] * nv
  for i in range(nv):
    b, jtype = dof_body[i]
    origin = root_com[t['rootid'][b]]
    if jtype == int(JointType.SLIDE):
      cdof[i] = [zero, zero, zero] + jaxis_w[i]
    else:
      ang = jaxis_w[i]
      lin = _cross3(ang, _sub3(origin, janchor_w[i]))
      cdof[i] = ang + lin

  # ---- velocities (kinematics.com_vel) ----
  cvel = {}
  for b in t['dynamic_bodies']:
    v6 = [zero] * 6
    for i in t['anc_dofs'][b]:
      v6 = [v6[k] + cdof[i][k] * qv[i] for k in range(6)]
    cvel[b] = v6
  cdof_dot = [None] * nv
  for i in range(nv):
    v6 = [zero] * 6
    for jd in t['dof_seen'][i]:
      v6 = [v6[k] + cdof[jd][k] * qv[jd] for k in range(6)]
    cdof_dot[i] = _motion_cross(v6, cdof[i])

  # ---- CRB mass matrix (smooth.crb) ----
  crb_i = {}
  for b in t['dynamic_bodies']:
    i6 = [zero] * 6
    h3 = [zero] * 3
    mass = 0.0
    for c in t['subtree'][b]:
      if c in cinert:
        ci6, ch3, cm = cinert[c]
        i6 = [i6[k] + ci6[k] for k in range(6)]
        h3 = _add3(h3, ch3)
        mass += cm
    crb_i[b] = (i6, h3, mass)
  fmat = [None] * nv
  for i in range(nv):
    b, _ = dof_body[i]
    fmat[i] = _inert_vec(crb_i[b], cdof[i])
  M = [[None] * nv for _ in range(nv)]
  for i in range(nv):
    bi, _ = dof_body[i]
    anc = set(t['anc_dofs'][bi])
    for j in range(i + 1):
      if j in anc:
        mij = _dot6(cdof[j], fmat[i])
        M[i][j] = mij
        M[j][i] = mij
  for i in range(nv):
    for j in range(nv):
      if M[i][j] is None:
        M[i][j] = zero
    M[i][i] = M[i][i] + t['armature'][i]

  # ---- RNE bias (smooth.rne) ----
  g3 = t['gravity']
  base = [zero, zero, zero, -g3[0] * one, -g3[1] * one, -g3[2] * one]
  qfrc_bias = [None] * nv
  fC = {}
  fbody = {}
  for b in t['dynamic_bodies']:
    cacc = list(base)
    for i in t['anc_dofs'][b]:
      cacc = [cacc[k] + cdof_dot[i][k] * qv[i] for k in range(6)]
    iv = _inert_vec(cinert[b], cvel[b])
    fbody[b] = [a + c for a, c in zip(_inert_vec(cinert[b], cacc),
                                      _force_cross(cvel[b], iv))]
  for b in t['dynamic_bodies']:
    tot = [zero] * 6
    for c in t['subtree'][b]:
      if c in fbody:
        tot = [tot[k] + fbody[c][k] for k in range(6)]
    fC[b] = tot
  for i in range(nv):
    b, _ = dof_body[i]
    qfrc_bias[i] = _dot6(cdof[i], fC[b])

  # ---- passive (smooth.passive) ----
  qfrc_passive = [-t['damping'][i] * qv[i] for i in range(nv)]
  for b in t['dynamic_bodies']:
    for (jtype, j, qadr, dofadr, _, _) in t['body_joints'][b]:
      k = t['jnt_stiffness'][j]
      if k:
        qfrc_passive[dofadr] = qfrc_passive[dofadr] - k * (
            qp[qadr] - t['qpos_spring'][qadr])

  # ---- actuation (smooth.transmission + smooth.actuation) ----
  qfrc_act = [zero] * nv
  for uu, a in enumerate(t['actuators']):
    ctrl = u[uu]
    if a['ctrllimited']:
      ctrl = jnp.clip(ctrl, a['ctrlrange'][0], a['ctrlrange'][1])
    length = a['gear'] * qp[a['qadr']]
    vel = a['gear'] * qv[a['dof']]
    gp = a['gainprm']
    gain = (gp[0] + gp[1] * length + gp[2] * vel) if a['gaintype'] \
        else gp[0]
    bp = a['biasprm']
    bias = (bp[0] + bp[1] * length + bp[2] * vel) if a['biastype'] else 0.0
    force = gain * ctrl + bias
    if a['forcelimited']:
      force = jnp.clip(force, a['forcerange'][0], a['forcerange'][1])
    qfrc_act[a['dof']] = qfrc_act[a['dof']] + a['gear'] * force

  qfrc_smooth = [qfrc_passive[i] - qfrc_bias[i] + qfrc_act[i]
                 for i in range(nv)]
  qacc_smooth = _chol_solve_lists(M, qfrc_smooth, nv)

  # ---- joint limits (constraint._limit_rows_scalar + scalar Newton) ----
  qfrc_con = [zero] * nv
  lims = t['limits']
  if lims:
    rows = []      # (dof, sign, aref lane, dvec lane)
    for lm in lims:
      for sign, pos in ((1.0, qp[lm['qadr']] - lm['lo'] - lm['margin']),
                        (-1.0, lm['hi'] - qp[lm['qadr']] - lm['margin'])):
        k, bcoef, imp = _kbi_scalar(lm['solref'], lm['solimp'], pos)
        vv = sign * qv[lm['dof']]
        aref = -bcoef * vv - k * imp * pos
        dvec = imp / (1.0 - imp) / max(lm['invw'], 1e-12)
        dvec = jnp.where(pos < 0, dvec, 0.0)
        rows.append((lm['dof'], sign, aref, dvec))
    nr = len(rows)
    h_damp = [[M[i][j] + (_DAMP if i == j else 0.0) for j in range(nv)]
              for i in range(nv)]

    def body(_, carry):
      qacc = carry[:nv]
      jar = carry[nv:]
      me = [sum(M[i][k] * (qacc[k] - qacc_smooth[k]) for k in range(nv))
            for i in range(nv)]
      w = [jnp.where(jar[r] < 0, rows[r][3], 0.0) for r in range(nr)]
      g = list(me)
      h = [list(hr) for hr in h_damp]
      for r, (dof, sign, aref, dvec) in enumerate(rows):
        g[dof] = g[dof] + sign * (w[r] * jar[r])
        h[dof][dof] = h[dof][dof] + w[r]
      step = _chol_solve_lists(h, g, nv)
      js = [rows[r][1] * step[rows[r][0]] for r in range(nr)]
      sme = sum(step[i] * me[i] for i in range(nv))
      sms = sum(step[i] * sum(M[i][k] * step[k] for k in range(nv))
                for i in range(nv))
      eme = sum((qacc[i] - qacc_smooth[i]) * me[i] for i in range(nv))
      best_cost = None
      best_alpha = None
      for a in _ALPHAS:
        c = 0.5 * eme - a * sme + 0.5 * a * a * sms
        for r in range(nr):
          jc = jar[r] - a * js[r]
          pc = jnp.where(jc < 0, rows[r][3], 0.0)
          c = c + 0.5 * pc * jc * jc
        if best_cost is None:
          best_cost, best_alpha = c, a * one
        else:
          better = c < best_cost
          best_cost = jnp.where(better, c, best_cost)
          best_alpha = jnp.where(better, a, best_alpha)
      qacc = [qacc[i] - best_alpha * step[i] for i in range(nv)]
      jar = [jar[r] - best_alpha * js[r] for r in range(nr)]
      return tuple(qacc) + tuple(jar)

    jar0 = [rows[r][1] * qacc_smooth[rows[r][0]] - rows[r][2]
            for r in range(nr)]
    carry = jax.lax.fori_loop(0, cap, body,
                              tuple(qacc_smooth) + tuple(jar0))
    jar = carry[nv:]
    for r, (dof, sign, aref, dvec) in enumerate(rows):
      f = jnp.where(jar[r] < 0, -dvec * jar[r], 0.0)
      qfrc_con[dof] = qfrc_con[dof] + sign * f

  # ---- semi-implicit Euler with implicit joint damping (fwd._euler) ----
  h = t['timestep']
  mh = [[M[i][j] + (h * t['damping'][i] if i == j else 0.0)
         for j in range(nv)] for i in range(nv)]
  rhs = [qfrc_smooth[i] + qfrc_con[i] for i in range(nv)]
  qacc = _chol_solve_lists(mh, rhs, nv)
  qv_new = [qv[i] + h * qacc[i] for i in range(nv)]
  qp_new = [qp[i] + h * qv_new[i] for i in range(nv)]
  return qp_new, qv_new


# ---------------------------------------------------------------------------
# the kernel: whole horizon in VMEM, candidates in lanes
# ---------------------------------------------------------------------------


SUBLANES = 8         # full f32 vreg tile is (8, 128)


def _pick_sublanes(b: int) -> int:
  """Batch-tile sublane count S (samples per program = S * 128): per-
  candidate scalars become (S, 128) tiles — S=8 fills the whole f32
  vreg, ~8x the VPU throughput of a 1-sublane (128,) lane vector.
  MJPC_TPU_ROLLOUT_SUBLANES=0 forces the legacy lane layout."""
  env = os.environ.get('MJPC_TPU_ROLLOUT_SUBLANES')
  if env is not None:
    return int(env)
  s = min(SUBLANES, b // LANES)
  while s > 1 and (b // LANES) % s:
    s -= 1
  return s


def rollout_states(m: Model, d0, qpos0, qvel0, actions,
                   cap: int = 6, interpret: bool = False,
                   sublanes: int | None = None):
  """(qpos0 (nq,), qvel0 (nv,), actions (B, T, nu)) ->
  (qpos (B, T, nq), qvel (B, T, nv)) pre-integration states.

  B must be a multiple of 128 (the caller pads). Every model constant is
  baked into the kernel as a Python float. sublanes: batch-tile sublane
  count S (see _pick_sublanes); 0 = legacy lane layout."""
  b, t_steps, nu = actions.shape
  assert b % LANES == 0, b
  nq, nv = m.nq, m.nv
  assert nq == nv, (nq, nv)   # hinge/slide only
  dtype = actions.dtype
  if sublanes is None:
    sublanes = _pick_sublanes(b)
  s = max(1, sublanes)
  tiled = bool(sublanes)

  tables = _model_tables(m)

  def kernel(actions_ref, qpos0_ref, qvel0_ref, qpos_out, qvel_out):
    def body(i, carry):
      qp = list(carry[:nv])
      qv = list(carry[nv:])
      if tiled:
        qpos_out[0, pl.ds(i, 1)] = jnp.stack(qp)[None]
        qvel_out[0, pl.ds(i, 1)] = jnp.stack(qv)[None]
        act = actions_ref[0, pl.ds(i, 1)][0]
      else:
        qpos_out[pl.ds(i, 1)] = jnp.stack(qp)[None]
        qvel_out[pl.ds(i, 1)] = jnp.stack(qv)[None]
        act = actions_ref[pl.ds(i, 1)][0]
      u = [act[k] for k in range(nu)]
      qp2, qv2 = _lane_step(tables, qp, qv, u, cap)
      return tuple(qp2) + tuple(qv2)

    q0 = qpos0_ref[...]
    v0 = qvel0_ref[...]
    init = tuple(q0[i] for i in range(nq)) + tuple(v0[i] for i in range(nv))
    jax.lax.fori_loop(0, t_steps, body, init)

  if tiled:
    # tile layout: (B, ...) -> (G, ..., S, L); per-candidate scalars are
    # (S, L) vreg tiles inside the kernel
    g = b // (s * LANES)
    acts_l = jnp.transpose(
        actions.reshape(g, s, LANES, t_steps, nu), (0, 3, 4, 1, 2))
    qpos0_l = jnp.broadcast_to(
        qpos0[:, None, None], (nq, s, LANES)).astype(dtype)
    qvel0_l = jnp.broadcast_to(
        qvel0[:, None, None], (nv, s, LANES)).astype(dtype)
    grid = (g,)
    in_specs = [
        pl.BlockSpec((1, t_steps, nu, s, LANES),
                     lambda i: (i, 0, 0, 0, 0)),
        pl.BlockSpec((nq, s, LANES), lambda i: (0, 0, 0)),
        pl.BlockSpec((nv, s, LANES), lambda i: (0, 0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, t_steps, nq, s, LANES),
                     lambda i: (i, 0, 0, 0, 0)),
        pl.BlockSpec((1, t_steps, nv, s, LANES),
                     lambda i: (i, 0, 0, 0, 0)),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((g, t_steps, nq, s, LANES), dtype),
        jax.ShapeDtypeStruct((g, t_steps, nv, s, LANES), dtype))
    qpos_t, qvel_t = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(acts_l, qpos0_l, qvel0_l)
    qpos_b = jnp.transpose(qpos_t, (0, 3, 4, 1, 2)).reshape(
        b, t_steps, nq)
    qvel_b = jnp.transpose(qvel_t, (0, 3, 4, 1, 2)).reshape(
        b, t_steps, nv)
    return qpos_b, qvel_b

  grid = (b // LANES,)
  out_shape = (jax.ShapeDtypeStruct((t_steps, nq, b), dtype),
               jax.ShapeDtypeStruct((t_steps, nv, b), dtype))
  acts_l = jnp.transpose(actions, (1, 2, 0))           # (T, nu, B)
  qpos0_l = jnp.broadcast_to(qpos0[:, None], (nq, b)).astype(dtype)
  qvel0_l = jnp.broadcast_to(qvel0[:, None], (nv, b)).astype(dtype)
  qpos_t, qvel_t = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((t_steps, nu, LANES), lambda i: (0, 0, i)),
          pl.BlockSpec((nq, LANES), lambda i: (0, i)),
          pl.BlockSpec((nv, LANES), lambda i: (0, i)),
      ],
      out_specs=[
          pl.BlockSpec((t_steps, nq, LANES), lambda i: (0, 0, i)),
          pl.BlockSpec((t_steps, nv, LANES), lambda i: (0, 0, i)),
      ],
      out_shape=out_shape,
      interpret=interpret,
  )(acts_l, qpos0_l, qvel0_l)
  return (jnp.transpose(qpos_t, (2, 0, 1)),
          jnp.transpose(qvel_t, (2, 0, 1)))


def usable(m: Model, num_candidates: int, dtype) -> bool:
  """Dispatch gate for planners/rollout.batched_returns."""
  if not eligible(m) or num_candidates < LANES:
    return False
  if FORCE_INTERPRET:
    return True
  if not enabled():
    return False
  return dtype == jnp.float32 and _on_tpu()
