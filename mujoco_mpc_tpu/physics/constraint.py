"""Soft-constraint rows and the primal Newton solver.

TPU-native equivalent of MuJoCo's constraint pipeline (mj_makeConstraint +
the Newton solver) that the reference relies on for joint limits and
contacts inside mj_step (/root/reference/mjpc/trajectory.cc:158).

Design: constraint rows are FIXED-SIZE arrays sized by the static model
structure (2 rows per limited scalar joint + rows per collision pair), with
an activity mask — no dynamic shapes, so the whole solve vmaps over
thousands of candidate rollouts. The solver minimizes MuJoCo's primal cost

    0.5 (qacc - qacc_smooth)' M (qacc - qacc_smooth) + 0.5 sum_i D_i jar_i^2

where jar_i = J_i qacc - aref_i and inequality rows only contribute when
jar_i < 0 (equivalently f_i = -D_i jar_i >= 0). The cost is piecewise
quadratic and strictly convex; a handful of damped Newton steps with dense
Cholesky solves reaches machine precision for the row counts planner models
have. Constants (K, B, impedance, D = imp/(1-imp)/invweight0) were validated
numerically against mj_forward.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.ops import linalg
from mujoco_mpc_tpu.ops.pallas_newton import PYRAMID_FACETS
from mujoco_mpc_tpu.physics.model import Data, JointType, Model

_MIN_IMP, _MAX_IMP = 0.0001, 0.9999


class ScalarRows(NamedTuple):
  """One-hot constraint rows (joint limits): J row = sign * e_dof.

  Kept OUT of the dense row matrix so the solver handles them with
  gathers/scatters instead of matmuls — profiled on TPU, broadcasting the
  static limit Jacobian into the per-step row concat cost ~13 ms of the
  4096x36 quadruped plan. dof/sign are host numpy constants."""
  dof: np.ndarray    # (R,) int, static
  sign: np.ndarray   # (R,) float, static
  pos: jax.Array     # (R,)
  margin: jax.Array  # (R,)
  aref: jax.Array    # (R,)
  d: jax.Array       # (R,)
  active: jax.Array  # (R,) bool


class FrictionRows(NamedTuple):
  """Joint-dof frictionloss rows (mjCNSTR_FRICTION_DOF): J row = e_dof,
  pos = 0, with a two-sided Huber cost — quadratic 0.5 d jar^2 while
  |d jar| <= loss, linear loss|jar| - loss^2/(2d) beyond; force =
  -clip(d jar, -loss, +loss) (verified vs the C oracle, see
  tests/test_frictionloss.py). One-hot like ScalarRows: the solver uses
  gathers/scatters, never a dense J block."""
  dof: np.ndarray    # (F,) int, static
  aref: jax.Array    # (F,)
  d: jax.Array       # (F,)
  loss: jax.Array    # (F,) frictionloss bound (force units)


class Rows(NamedTuple):
  """A block of constraint rows (fixed size)."""
  j: jax.Array       # (n, nv) Jacobian
  pos: jax.Array     # (n,) constraint violation (negative = violated)
  margin: jax.Array  # (n,)
  aref: jax.Array    # (n,) reference acceleration
  d: jax.Array       # (n,) penalty weight D
  active: jax.Array  # (n,) bool
  equality: jax.Array  # (n,) bool: two-sided row (force for any jar sign)


def impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """MuJoCo constraint impedance d(pos) in (0,1).

  The endpoints d0/dwidth are clamped to [mjMINIMP, mjMAXIMP] BEFORE
  interpolation (mj_assignImpedance semantics): solimp d0=0 configs (e.g.
  dm_control humanoid solimplimit) yield imp = 1e-4 + y*(dw - 1e-4), not
  y*dw — observable in efc_D at the 2e-3 level (humanoid parity)."""
  d0, dw, width, mid, power = (solimp[..., 0], solimp[..., 1],
                               solimp[..., 2], solimp[..., 3], solimp[..., 4])
  d0 = jnp.clip(d0, _MIN_IMP, _MAX_IMP)
  dw = jnp.clip(dw, _MIN_IMP, _MAX_IMP)
  x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
  mid = jnp.clip(mid, 1e-6, 1 - 1e-6)
  power = jnp.maximum(power, 1.0)
  y_lo = (x / mid) ** power * mid
  y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** power * (1.0 - mid)
  y = jnp.where(x <= mid, y_lo, y_hi)
  return jnp.clip(d0 + y * (dw - d0), _MIN_IMP, _MAX_IMP)


def kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array):
  """Stiffness K, damping B, impedance I for a constraint row."""
  imp = impedance(solimp, pos)
  dmax = jnp.clip(jnp.maximum(solimp[..., 0], solimp[..., 1]),
                  _MIN_IMP, _MAX_IMP)
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  # standard (positive solref) reference
  k_std = 1.0 / jnp.maximum(
      dmax * dmax * timeconst * timeconst * dampratio * dampratio, 1e-12)
  b_std = 2.0 / jnp.maximum(dmax * timeconst, 1e-12)
  # direct form: solref = (-stiffness, -damping)
  k_dir = -solref[..., 0] / jnp.maximum(dmax * dmax, 1e-12)
  b_dir = -solref[..., 1] / jnp.maximum(dmax, 1e-12)
  direct = jnp.logical_and(solref[..., 0] <= 0, solref[..., 1] <= 0)
  return (jnp.where(direct, k_dir, k_std),
          jnp.where(direct, b_dir, b_std), imp)


def _limit_rows_scalar(m: Model, d: Data) -> ScalarRows | None:
  """Joint-limit rows in one-hot form (see ScalarRows)."""
  from mujoco_mpc_tpu.physics import structure

  ids, qadr, dofadr = structure.scalar_joint_limits(
      m.jnt_limited, m.jnt_type, m.jnt_qposadr, m.jnt_dofadr)
  nl = len(ids)
  if nl == 0:
    return None
  q = d.qpos[qadr]
  v = d.qvel[dofadr]
  rng = m.jnt_range[ids]
  margin = m.jnt_margin[ids]
  pos = (jnp.concatenate([q - rng[:, 0], rng[:, 1] - q])
         - jnp.tile(margin, 2))
  vv = jnp.concatenate([v, -v])
  solref = jnp.tile(m.jnt_solref[ids], (2, 1))
  solimp = jnp.tile(m.jnt_solimp[ids], (2, 1))
  k, b, imp = kbi(solref, solimp, pos)
  aref = -b * vv - k * imp * pos
  iw = jnp.tile(m.dof_invweight0[dofadr], 2)
  dd = imp / (1.0 - imp) / jnp.maximum(iw, 1e-12)
  dof2 = np.concatenate([dofadr, dofadr])
  sign = np.concatenate([np.ones(nl), -np.ones(nl)])
  return ScalarRows(dof2, sign, pos, jnp.tile(margin, 2), aref, dd,
                    pos < 0.0)


def _friction_rows(m: Model, d: Data) -> FrictionRows | None:
  """Joint frictionloss rows (see FrictionRows). D comes from the dof's
  solimpfriction impedance AT pos=0 over dof_invweight0; aref = -B v with
  B from solreffriction (MuJoCo friction rows carry no position term)."""
  if not m.friction_dof:
    return None
  dofs = np.asarray(m.friction_dof, dtype=np.int32)
  v = d.qvel[dofs]
  zero = jnp.zeros_like(v)
  k, b, imp = kbi(m.dof_friction_solref, m.dof_friction_solimp, zero)
  del k  # pos = 0: no stiffness term
  iw = m.dof_invweight0[dofs]
  dd = imp / (1.0 - imp) / jnp.maximum(iw, 1e-12)
  return FrictionRows(dofs, -b * v, dd, m.dof_frictionloss)


def _limit_rows(m: Model, d: Data) -> Rows | None:
  """Joint-limit rows: 2 per limited scalar joint (lower, upper).

  Vectorized: rows = [all lower sides; all upper sides], Jacobian is a
  static +/-1 one-hot matrix (the hot loop is dispatch-bound on TPU)."""
  from mujoco_mpc_tpu.physics import structure

  ids, qadr, dofadr = structure.scalar_joint_limits(
      m.jnt_limited, m.jnt_type, m.jnt_qposadr, m.jnt_dofadr)
  nl = len(ids)
  if nl == 0:
    return None
  dtype = d.qpos.dtype

  q = d.qpos[qadr]                              # (L,)
  v = d.qvel[dofadr]
  rng = m.jnt_range[ids]                        # (L, 2)
  margin = m.jnt_margin[ids]
  pos = (jnp.concatenate([q - rng[:, 0], rng[:, 1] - q])
         - jnp.tile(margin, 2))                 # (2L,)
  vv = jnp.concatenate([v, -v])
  solref = jnp.tile(m.jnt_solref[ids], (2, 1))
  solimp = jnp.tile(m.jnt_solimp[ids], (2, 1))
  k, b, imp = kbi(solref, solimp, pos)
  aref = -b * vv - k * imp * pos
  iw = jnp.tile(m.dof_invweight0[dofadr], 2)
  dd = imp / (1.0 - imp) / jnp.maximum(iw, 1e-12)

  jac_np = np.zeros((2 * nl, m.nv), dtype=np.float64)
  jac_np[np.arange(nl), dofadr] = 1.0
  jac_np[nl + np.arange(nl), dofadr] = -1.0
  return Rows(jnp.asarray(jac_np, dtype=dtype), pos, jnp.tile(margin, 2),
              aref, dd, pos < 0.0, jnp.zeros(2 * nl, dtype=bool))


def _tendon_limit_rows(m: Model, d: Data) -> Rows | None:
  """Tendon-limit rows: 2 per limited tendon (analog of joint limits;
  reference humanoid patch uses limited fixed tendons for hamstrings)."""
  limited = [ti for ti in range(m.ntendon) if m.tendon_limited[ti]]
  if not limited:
    return None
  dtype = d.qpos.dtype
  js, poss, margins, arefs, ds, actives = [], [], [], [], [], []
  length = d.ten_length
  vel_all = d.ten_velocity
  for ti in limited:
    for side in (0, 1):
      if side == 0:
        pos = length[ti] - m.tendon_range[ti, 0]
        jac = d.ten_J[ti]
        v = vel_all[ti]
      else:
        pos = m.tendon_range[ti, 1] - length[ti]
        jac = -d.ten_J[ti]
        v = -vel_all[ti]
      pos = pos - m.tendon_margin[ti]
      k, b, imp = kbi(m.tendon_solref_lim[ti], m.tendon_solimp_lim[ti], pos)
      aref = -b * v - k * imp * pos
      dd = imp / (1.0 - imp) / jnp.maximum(m.tendon_invweight0[ti], 1e-12)
      js.append(jac.astype(dtype))
      poss.append(pos)
      margins.append(m.tendon_margin[ti])
      arefs.append(aref)
      ds.append(dd)
      actives.append(pos < 0.0)
  return Rows(jnp.stack(js), jnp.stack(poss), jnp.stack(margins),
              jnp.stack(arefs), jnp.stack(ds), jnp.stack(actives),
              jnp.zeros(len(js), dtype=bool))


def _equality_rows(m: Model, d: Data) -> Rows | None:
  """Equality-constraint rows (mjEQ_CONNECT / WELD / JOINT / TENDON).

  Two-sided soft constraints: same K/B/impedance machinery as limits but
  the penalty applies for either sign of jar (reference relies on mj_step
  for these; menagerie hand models use joint couplings, task scenes use
  connect/weld attachments)."""
  from mujoco_mpc_tpu.physics import smooth

  if m.neq == 0:
    return None
  dtype = d.qpos.dtype
  js, poss, arefs, ds = [], [], [], []
  # residual functions (qpos, kinematics-Data) -> row-ordered vector, used
  # to get the velocity bias Jdot@qvel via a nested jvp (MuJoCo folds
  # -Jdot@qvel into connect/weld aref but NOT into joint/tendon polynomial
  # couplings; verified numerically vs efc_aref)
  res_fns = []
  bias_mask = []  # per-row: subtract the Jdot@qvel bias for this row
  # rows of the equality currently being assembled; impedance is shared
  # across a constraint's rows and computed from the norm of its full
  # residual vector (matches mj efc_D equal across connect/weld rows)
  pending = []

  def add(jac, pos, invweight, e):
    pending.append((jac.astype(dtype), pos, invweight, e))

  def flush():
    if not pending:
      return
    e = pending[0][3]
    pos_norm = jnp.sqrt(sum(p * p for (_, p, _, _) in pending))
    k, b, imp = kbi(m.eq_solref[e], m.eq_solimp[e], pos_norm)
    for jac, pos, invweight, _ in pending:
      vel = jac @ d.qvel
      js.append(jac)
      poss.append(pos)
      arefs.append(-b * vel - k * imp * pos)
      ds.append(imp / (1.0 - imp) / jnp.maximum(invweight, 1e-12))
    pending.clear()

  for e in range(m.neq):
    if not m.eq_active0[e]:
      continue
    etype = m.eq_type[e]
    data = m.eq_data[e]
    if etype == 0:  # connect
      b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
      anchor1, anchor2 = data[0:3], data[3:6]
      pos1 = d.xpos[b1] + d.xmat[b1] @ anchor1
      pos2 = d.xpos[b2] + d.xmat[b2] @ anchor2
      jacp1, _ = smooth._body_jac(m, d, b1, pos1)
      jacp2, _ = smooth._body_jac(m, d, b2, pos2)
      cpos = pos1 - pos2
      jac = (jacp1 - jacp2).T                    # (3, nv)
      iw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
      for r in range(3):
        add(jac[r], cpos[r], iw, e)

      def res_connect(qpos, dk, b1=b1, b2=b2, a1=anchor1, a2=anchor2):
        return (dk.xpos[b1] + dk.xmat[b1] @ a1
                - dk.xpos[b2] - dk.xmat[b2] @ a2)
      res_fns.append(res_connect)
      bias_mask += [True] * 3
    elif etype == 1:  # weld
      from mujoco_mpc_tpu.utils import tpu_math as tm
      b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
      anchor1, anchor2 = data[0:3], data[3:6]
      relpose, torquescale = data[6:10], data[10]
      # position part: anchor of body2 expressed in body1 vs body2 world
      pos1 = d.xpos[b1] + d.xmat[b1] @ anchor2
      pos2 = d.xpos[b2] + d.xmat[b2] @ anchor1
      jacp1, jacr1 = smooth._body_jac(m, d, b1, pos1)
      jacp2, jacr2 = smooth._body_jac(m, d, b2, pos2)
      cpos = pos1 - pos2
      jacp = (jacp1 - jacp2).T
      iw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
      for r in range(3):
        add(jacp[r], cpos[r], iw, e)
      # orientation part: quat error q = conj(q2 * relpose) * q1,
      # residual = torquescale * vec(q); Jacobian via the angular
      # velocity difference mapped through 0.5 * G(q)
      quat1 = d.xquat[b1]
      quat2 = tm.quat_mul(d.xquat[b2], relpose)
      crot = tm.quat_mul(tm.quat_conj(quat2), quat1)  # error quat
      cpos_rot = torquescale * crot[1:]
      # d(vec(conj(q2r) q1))/dt = 0.5 * [mapping] (w1 - w2) in body frames;
      # exact linearization: J = torquescale * 0.5 * Vmat @ (R? jacr1-jacr2)
      # build via quaternion product derivative matrices
      # vec part of conj(q2) * q1 differentiated w.r.t. world ang vels:
      # dq1/dt = 0.5 * q1 * (0, w1_local); w_local = R1^T w_world
      def dvec(jacr_cols, quat_fixed_conj, quat_var, xmat_var, sign):
        # derivative of vec(quat_fixed_conj * quat_var) wrt world angvel
        # dquat_var/dt = 0.5 * (0, w_world) * quat_var  (world convention)
        out = []
        for k in range(3):
          w = jnp.zeros(3, dtype=dtype).at[k].set(1.0)
          dq = 0.5 * tm.quat_mul(jnp.concatenate([jnp.zeros(1, dtype=dtype),
                                                  w]), quat_var)
          out.append(sign * tm.quat_mul(quat_fixed_conj, dq)[1:])
        return jnp.stack(out)  # (3 axes, 3 vec) d vec / d w_axis
      dv1 = dvec(None, tm.quat_conj(quat2), quat1, None, 1.0)   # (3,3)
      dv2_full = []
      for k in range(3):
        w = jnp.zeros(3, dtype=dtype).at[k].set(1.0)
        dq2 = 0.5 * tm.quat_mul(
            jnp.concatenate([jnp.zeros(1, dtype=dtype), w]), quat2)
        dv2_full.append(tm.quat_mul(tm.quat_conj(dq2), quat1)[1:])
      dv2 = jnp.stack(dv2_full)
      jrot = torquescale * (jacr1 @ dv1 + jacr2 @ dv2).T  # (3, nv)
      iwr = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
      for r in range(3):
        add(jrot[r], cpos_rot[r], iwr, e)

      def res_weld(qpos, dk, b1=b1, b2=b2, a1=anchor1, a2=anchor2,
                   relpose=relpose, torquescale=torquescale):
        trans = (dk.xpos[b1] + dk.xmat[b1] @ a2
                 - dk.xpos[b2] - dk.xmat[b2] @ a1)
        q2 = tm.quat_mul(dk.xquat[b2], relpose)
        rot = torquescale * tm.quat_mul(tm.quat_conj(q2), dk.xquat[b1])[1:]
        return jnp.concatenate([trans, rot])
      res_fns.append(res_weld)
      bias_mask += [True] * 6
    elif etype == 2:  # joint coupling: q1 - q1_0 = poly(q2 - q2_0)
      j1, j2 = m.eq_obj1id[e], m.eq_obj2id[e]
      qadr1, dof1 = m.jnt_qposadr[j1], m.jnt_dofadr[j1]
      poly = data[0:5]
      if j2 >= 0:
        qadr2, dof2 = m.jnt_qposadr[j2], m.jnt_dofadr[j2]
        dif = d.qpos[qadr2] - m.qpos0[qadr2]
        p = (poly[0] + poly[1] * dif + poly[2] * dif ** 2
             + poly[3] * dif ** 3 + poly[4] * dif ** 4)
        dp = (poly[1] + 2 * poly[2] * dif + 3 * poly[3] * dif ** 2
              + 4 * poly[4] * dif ** 3)
        pos = d.qpos[qadr1] - m.qpos0[qadr1] - p
        jac = jnp.zeros(m.nv, dtype=dtype).at[dof1].set(1.0)
        jac = jac.at[dof2].add(-dp)
        iw = m.dof_invweight0[dof1] + m.dof_invweight0[dof2]
      else:
        pos = d.qpos[qadr1] - m.qpos0[qadr1] - poly[0]
        jac = jnp.zeros(m.nv, dtype=dtype).at[dof1].set(1.0)
        iw = m.dof_invweight0[dof1]
      add(jac, pos, iw, e)

      def res_joint(qpos, dk, qadr1=qadr1, j2=j2, poly=poly, e=e):
        r = qpos[qadr1] - m.qpos0[qadr1]
        if j2 >= 0:
          dif = qpos[m.jnt_qposadr[j2]] - m.qpos0[m.jnt_qposadr[j2]]
          r = r - (poly[0] + poly[1] * dif + poly[2] * dif ** 2
                   + poly[3] * dif ** 3 + poly[4] * dif ** 4)
        else:
          r = r - poly[0]
        return r[None]
      res_fns.append(res_joint)
      bias_mask.append(False)
    elif etype == 3:  # tendon coupling: L1 - L1_0 = poly(L2 - L2_0)
      t1_, t2_ = m.eq_obj1id[e], m.eq_obj2id[e]
      poly = data[0:5]
      # fixed tendons only (put_model rejects spatial tendons here)
      length = d.ten_length
      length0 = m.ten_length0
      if t2_ >= 0:
        dif = length[t2_] - length0[t2_]
        p = (poly[0] + poly[1] * dif + poly[2] * dif ** 2
             + poly[3] * dif ** 3 + poly[4] * dif ** 4)
        dp = (poly[1] + 2 * poly[2] * dif + 3 * poly[3] * dif ** 2
              + 4 * poly[4] * dif ** 3)
        pos = length[t1_] - length0[t1_] - p
        jac = d.ten_J[t1_] - dp * d.ten_J[t2_]
        iw = m.tendon_invweight0[t1_] + m.tendon_invweight0[t2_]
      else:
        pos = length[t1_] - length0[t1_] - poly[0]
        jac = d.ten_J[t1_]
        iw = m.tendon_invweight0[t1_]
      add(jac, pos, iw, e)

      def res_tendon(qpos, dk, t1_=t1_, t2_=t2_, poly=poly):
        length = m.ten_qmat @ qpos
        length0 = m.ten_qmat @ m.qpos0
        r = length[t1_] - length0[t1_]
        if t2_ >= 0:
          dif = length[t2_] - length0[t2_]
          r = r - (poly[0] + poly[1] * dif + poly[2] * dif ** 2
                   + poly[3] * dif ** 3 + poly[4] * dif ** 4)
        else:
          r = r - poly[0]
        return r[None]
      res_fns.append(res_tendon)
      bias_mask.append(False)
    else:
      raise NotImplementedError(f'equality type {etype}')
    flush()

  if not js:
    return None

  # velocity bias: aref -= Jdot @ qvel, computed as the second derivative
  # of the residual along the constant-qvel configuration path (qacc = 0
  # along integrate_pos, so d2r/dt2 = Jdot @ qvel exactly)
  from mujoco_mpc_tpu.physics import forward as fwd_mod
  from mujoco_mpc_tpu.physics import kinematics as kin

  needs_kin = any(m.eq_type[e] in (0, 1) for e in range(m.neq)
                  if m.eq_active0[e])

  def res_all(t):
    qpos = fwd_mod.integrate_pos(m, d.qpos, d.qvel, t)
    dk = kin.kinematics(m, d.replace(qpos=qpos)) if needs_kin else d
    return jnp.concatenate([fn(qpos, dk) for fn in res_fns])

  t0 = jnp.zeros((), dtype=dtype)
  one = jnp.ones((), dtype=dtype)
  rdot = lambda t: jax.jvp(res_all, (t,), (one,))[1]
  bias = jax.jvp(rdot, (t0,), (one,))[1]          # (n,) Jdot @ qvel
  bias = jnp.where(jnp.asarray(bias_mask), bias, 0.0)

  n = len(js)
  return Rows(jnp.stack(js), jnp.stack(poss),
              jnp.zeros(n, dtype=dtype), jnp.stack(arefs) - bias,
              jnp.stack(ds),
              jnp.ones(n, dtype=bool), jnp.ones(n, dtype=bool))


class ContactBlock(NamedTuple):
  """One condim group of contact points: constraint rows + the metadata
  needed to decode pyramidal facet forces back to contact wrenches."""
  rows: Rows
  condim: int
  nrep: int           # facet rows per point
  pos: jax.Array      # (P, 3) world contact points
  frame: jax.Array    # (P, 3, 3) rows (normal, t1, t2); normal g1 -> g2
  mu: jax.Array       # (P, 3) (sliding, torsional, rolling)
  b1: np.ndarray      # (P,) static body ids
  b2: np.ndarray


class PointRows(NamedTuple):
  """Pyramidal contact rows in FACTORED point-direction form (the
  hot-path representation): jd[p,d,n] = (g[p,d] . cdofc[n]) * dmask[p,n]
  (see ops/pallas_newton.materialize_jd). Neither the (P, ndirs, nv)
  direction Jacobians nor the (nrep*P, nv) facet rows are ever
  materialized on the hot path: the fused Newton kernel builds the facet
  columns from (g, cdofc, dmask) once in VMEM. dmask (the ancestor-mask
  difference of the two contact bodies) is a host constant."""
  g: jax.Array      # (P, ndirs, 6) direction factors (normal, t1,
                    # t2[, rn, rt1, rt2]): [pos3 x dir, dir] trans,
                    # [dir, 0] rot
  cdofc: jax.Array  # (nv, 6) world-origin-anchored dof axes (shared
                    # across groups; same traced value in each)
  dmask: np.ndarray  # (P, nv) float32 in {-1, 0, 1}, STATIC
  aref: jax.Array   # (nrep, P) per-facet reference acceleration
  dvec: jax.Array   # (P,) penalty weight, 0 when the contact is inactive
  mu: jax.Array     # (3, P) (sliding, torsional, rolling)
  condim: int       # static


def _contact_capacity(m: Model, total: int) -> int:
  """Static cap on dynamically selected contact rows per condim-1
  cluster: the model's `contact_cap` custom numeric when set, else the
  MJPC_TPU_CONTACT_CAP env default (read at trace time)."""
  import os
  if m.contact_cap:
    return min(m.contact_cap, total)
  cap = int(os.environ.get('MJPC_TPU_CONTACT_CAP', '256'))
  return min(cap, total)


def _pair_param_arrays(m: Model, pairs, dtype):
  """Per-pair contact parameters stacked to (K, ...) device constants."""
  from mujoco_mpc_tpu.physics import collision
  params = [collision.pair_params(m, g1, g2) for (g1, g2) in pairs]
  import numpy as np
  return {
      'solref': jnp.stack([p.solref for p in params]),
      'solimp': jnp.stack([p.solimp for p in params]),
      'mu': jnp.stack([p.friction for p in params]),
      'invw': jnp.stack([jnp.asarray(p.invweight, dtype=dtype)
                         for p in params]),
      'margin': jnp.stack([jnp.asarray(p.includemargin, dtype=dtype)
                           for p in params]),
      'b1': np.asarray([m.geom_bodyid[g1] for (g1, _) in pairs],
                       dtype=np.int32),
      'b2': np.asarray([m.geom_bodyid[g2] for (_, g2) in pairs],
                       dtype=np.int32),
  }


def _contact_groups(m: Model, d: Data):
  """Stack narrowphase output per condim (static structure).

  Per-pair narrowphase output is appended as per-pair (n, ...) arrays
  and concatenated once — EVERY downstream quantity (tangent frames,
  K/B/impedance, point Jacobians) is computed batched: the hot loop is
  dispatch-bound on TPU, and per-point Jacobian assembly was the largest
  op-count contributor in contact-rich models. Same-shape hull pairs
  (collision.contact_clusters) skip the unrolled path entirely:
  sphere-mesh clusters emit statically ordered batched candidates here;
  condim-1 mesh-mesh clusters go through dynamic top-k selection and are
  returned separately (second return value) because their body indices
  are traced (see _dyn_contact_rows)."""
  from mujoco_mpc_tpu.physics import collision

  groups = {1: None, 3: None, 4: None, 6: None}
  dtype = d.qpos.dtype

  def _group(c):
    if groups[c] is None:
      groups[c] = {k: [] for k in
                   ('pos3', 'normal', 'tangent', 'dist', 'margin',
                    'solref', 'solimp', 'mu', 'invw', 'b1', 'b2')}
    return groups[c]

  mm, sm, pm, bm, cm, clustered = collision.contact_clusters(m)

  def _append_cluster(pairs, dist, pos, normal, points_per_pair):
    """Stack one batched-narrowphase cluster's points into its condim
    group, repeating per-pair params per emitted point (pair-major
    order, matching the narrowphase reshape)."""
    condim = collision.pair_params(m, *pairs[0]).condim
    if condim not in (1, 3, 4, 6):
      raise NotImplementedError(f'contact condim {condim}')
    pp = _pair_param_arrays(m, pairs, dtype)
    g = _group(condim)
    g['pos3'].append(pos)
    g['normal'].append(normal)
    g['tangent'].append(jnp.zeros_like(normal))
    g['dist'].append(dist)
    reps = points_per_pair
    for key in ('margin', 'solref', 'solimp', 'mu', 'invw'):
      v = pp[key]
      g[key].append(jnp.repeat(v, reps, axis=0) if reps > 1 else v)
    for key in ('b1', 'b2'):
      v = pp[key]
      g[key].append(np.repeat(v, reps) if reps > 1 else v)

  for cl in sm:
    dist, pos, normal = collision.sphere_mesh_batched(m, d, cl)
    _append_cluster(cl, dist, pos, normal, 1)
  for cl in cm:
    dist, pos, normal = collision.capsule_mesh_batched(m, d, cl)
    _append_cluster(cl, dist, pos, normal, 2)
  for cl in pm:
    dist, pos, normal = collision.plane_mesh_batched(m, d, cl)
    _append_cluster(cl, dist, pos, normal, 4)
  for cl in bm:
    # box_mesh_batched emits two pair-major halves (corners-in-hull,
    # verts-in-box); params repeat within each half
    dist, pos, normal = collision.box_mesh_batched(m, d, cl)
    half = dist.shape[0] // 2
    for sl in (slice(0, half), slice(half, None)):
      _append_cluster(cl, dist[sl], pos[sl], normal[sl], 4)

  dyn = []
  for cl in mm:
    dist, pos, normal, pair_idx = collision.mesh_mesh_batched(m, d, cl)
    pp = _pair_param_arrays(m, cl, dtype)
    margin_pt = pp['margin'][pair_idx]
    cap = _contact_capacity(m, dist.shape[0])
    # keep the `cap` deepest candidates: every physically active contact
    # survives as long as <= cap are active at once; the rest are
    # inactive (dist > margin) rows the solver would zero anyway
    _, sel = jax.lax.top_k(-(dist - margin_pt), cap)
    pidx = jnp.asarray(pair_idx, dtype=jnp.int32)[sel]
    dyn.append({
        'condim': 1,
        'pos3': pos[sel], 'normal': normal[sel], 'dist': dist[sel],
        'margin': pp['margin'][pidx], 'solref': pp['solref'][pidx],
        'solimp': pp['solimp'][pidx], 'mu': pp['mu'][pidx],
        'invw': pp['invw'][pidx],
        'b1': jnp.asarray(pp['b1'], dtype=jnp.int32)[pidx],
        'b2': jnp.asarray(pp['b2'], dtype=jnp.int32)[pidx],
    })

  for (g1, g2) in m.collision_pairs:
    if (g1, g2) in clustered:
      continue
    params = collision.pair_params(m, g1, g2)
    points = collision.narrowphase(m, d, g1, g2)
    if not points:
      continue
    b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
    condim = params.condim
    if condim not in (1, 3, 4, 6):
      raise NotImplementedError(f'contact condim {condim}')
    g = _group(condim)
    n = len(points)
    g['pos3'].append(jnp.stack([cp.pos for cp in points]))
    g['normal'].append(jnp.stack([cp.normal for cp in points]))
    g['tangent'].append(jnp.stack([
        jnp.zeros(3, dtype=cp.normal.dtype) if cp.tangent is None
        else cp.tangent for cp in points]))
    g['dist'].append(jnp.stack([cp.dist for cp in points]))
    g['margin'].append(jnp.broadcast_to(params.includemargin, (n,)))
    g['solref'].append(jnp.broadcast_to(params.solref[None], (n, 2)))
    g['solimp'].append(jnp.broadcast_to(params.solimp[None], (n, 5)))
    g['mu'].append(jnp.broadcast_to(params.friction[None], (n, 3)))
    g['invw'].append(jnp.broadcast_to(params.invweight, (n,)))
    g['b1'].append(np.full(n, b1, dtype=np.int32))
    g['b2'].append(np.full(n, b2, dtype=np.int32))
  return groups, dyn


class _Stacked:
  """Concatenated view of one condim group's accumulated arrays."""

  def __init__(self, g):
    self.pos3 = jnp.concatenate(g['pos3'])            # (P, 3)
    self.normal = jnp.concatenate(g['normal'])
    self.tangent = jnp.concatenate(g['tangent'])
    self.dist = jnp.concatenate(g['dist'])
    self.margin = jnp.concatenate(g['margin'])
    self.solref = jnp.concatenate(g['solref'])
    self.solimp = jnp.concatenate(g['solimp'])
    self.mu = jnp.concatenate(g['mu'])
    self.invw = jnp.concatenate(g['invw'])
    self.b1 = np.concatenate(g['b1'])
    self.b2 = np.concatenate(g['b2'])


def contact_blocks(m: Model, d: Data, condims=(1, 3, 4, 6)):
  """Contact constraint rows, one ContactBlock per condim group.

  Pyramidal friction (MuJoCo default cone): a condim-c contact contributes
  2*(c-1) one-sided facet rows J = Jn ± mu_i * J_i over the friction
  dimensions (tangents t1,t2; torsion about the normal for condim>=4;
  rolling about t1,t2 for condim 6), with diagApprox
  invweight * 2*mu1^2*(1+mu1^2) (mu1 = sliding friction); frictionless
  (condim 1) contributes the normal row with diagApprox = invweight.
  Validated numerically against mjd.efc_* (tests/test_contacts.py).

  Assembly is point-stacked: per-point normal/tangent Jacobians are
  stacked into (P, nv) tensors FIRST and the facet rows are expanded with
  broadcast ops. Building rows one-by-one leaves ~rows separate
  (batch, 1, nv) temporaries alive inside the Newton while_loop, each
  padded to (8, 128) tiles — a 146x memory expansion that OOMed the
  Shadow-hand planner at 8192 samples.
  """
  from mujoco_mpc_tpu.physics import collision, structure

  if not m.collision_pairs:
    return []
  dtype = d.qpos.dtype
  groups, _ = _contact_groups(m, d)

  a_body = np.asarray(structure.body_ancestor_dof_mask(
      m.body_parentid, m.body_dofadr, m.body_dofnum, m.nv))
  rootid = np.asarray(m.body_rootid, dtype=np.int32)

  blocks = []
  for condim, g in groups.items():
    if g is None or condim not in condims:
      continue
    s = _Stacked(g)
    pos3, normal, tan_hint = s.pos3, s.normal, s.tangent
    dist, margin = s.dist, s.margin
    solref, solimp, mu, invw = s.solref, s.solimp, s.mu, s.invw
    b1_arr, b2_arr = s.b1, s.b2

    pos = dist - margin
    k, b, imp = kbi(solref, solimp, pos)             # (P,) each
    if condim == 1:
      dapprox = invw
    else:
      dapprox = invw * 2.0 * mu[:, 0] ** 2 * (1.0 + mu[:, 0] ** 2)

    def batch_jac(bodies):
      off = pos3 - d.subtree_com[rootid[bodies]]     # (P, 3)
      jp = (d.cdof[None, :, 3:]
            + jnp.cross(d.cdof[None, :, :3], off[:, None, :]))
      mask = jnp.asarray(a_body[bodies], dtype=dtype)[:, :, None]
      return jp * mask, d.cdof[None, :, :3] * mask   # (P, nv, 3) each

    jp1, jr1 = batch_jac(b1_arr)
    jp2, jr2 = batch_jac(b2_arr)
    jp = jp2 - jp1                                   # (P, nv, 3)
    jn = jnp.einsum('pns,ps->pn', jp, normal)        # (P, nv)

    if condim == 1:
      t1, t2 = collision._make_frames(normal, tan_hint)
      jmat, nrep = jn, 1
    else:
      t1, t2 = collision._make_frames(normal, tan_hint)
      mus = mu[:, 0:1]
      jt1 = jnp.einsum('pns,ps->pn', jp, t1)
      jt2 = jnp.einsum('pns,ps->pn', jp, t2)
      facets = [jn + mus * jt1, jn - mus * jt1,
                jn + mus * jt2, jn - mus * jt2]
      if condim >= 4:
        jr = jr2 - jr1
        mut = mu[:, 1:2]
        jrn = jnp.einsum('pns,ps->pn', jr, normal)
        facets += [jn + mut * jrn, jn - mut * jrn]
        if condim == 6:
          mur = mu[:, 2:3]
          jrt1 = jnp.einsum('pns,ps->pn', jr, t1)
          jrt2 = jnp.einsum('pns,ps->pn', jr, t2)
          facets += [jn + mur * jrt1, jn - mur * jrt1,
                     jn + mur * jrt2, jn - mur * jrt2]
      jmat = jnp.concatenate(facets)                 # (nrep*P, nv)
      nrep = len(facets)

    posr = jnp.tile(pos, nrep)
    vel = jmat @ d.qvel
    rows = Rows(
        jmat, posr, jnp.tile(margin, nrep),
        -jnp.tile(b, nrep) * vel - jnp.tile(k * imp, nrep) * posr,
        jnp.tile(imp / (1.0 - imp) / jnp.maximum(dapprox, 1e-12), nrep),
        posr < 0.0, jnp.zeros_like(posr, dtype=bool))
    frame = jnp.stack([normal, t1, t2], axis=1)      # (P, 3, 3)
    blocks.append(ContactBlock(rows=rows, condim=condim, nrep=nrep,
                               pos=pos3, frame=frame, mu=mu,
                               b1=b1_arr, b2=b2_arr))
  return blocks


def _contact_rows(m: Model, d: Data) -> Rows | None:
  """Contact rows as one dense block (see contact_blocks)."""
  return _concat_rows([b.rows for b in contact_blocks(m, d)]
                      + [_dyn_contact_rows(m, d)])


def _dyn_contact_rows(m: Model, d: Data) -> Rows | None:
  """Dense normal rows for dynamically selected cluster contacts.

  Same-hull condim-1 pair clusters (collision.contact_clusters — the
  interlocked cube's 310 cubelet pairs) produce up to 4 candidates per
  pair; only the `contact capacity` deepest per sample survive
  (_contact_groups top-k), so body indices are traced and the ancestor
  dof masks are gathered instead of baked (contrast contact_blocks'
  static b1/b2). Row count is static = the cap, independent of the
  pair count."""
  from mujoco_mpc_tpu.physics import structure
  if not m.collision_pairs:
    return None
  _, dyn = _contact_groups(m, d)
  if not dyn:
    return None
  dtype = d.qpos.dtype
  a_body = jnp.asarray(np.asarray(structure.body_ancestor_dof_mask(
      m.body_parentid, m.body_dofadr, m.body_dofnum, m.nv)), dtype=dtype)
  rootid = jnp.asarray(np.asarray(m.body_rootid, dtype=np.int32))
  parts = []
  for g in dyn:
    pos3, normal = g['pos3'], g['normal']
    pos = g['dist'] - g['margin']
    k, b, imp = kbi(g['solref'], g['solimp'], pos)

    def jac(bodies, pos3=pos3):
      off = pos3 - d.subtree_com[rootid[bodies]]     # (P, 3)
      jp = (d.cdof[None, :, 3:]
            + jnp.cross(d.cdof[None, :, :3], off[:, None, :]))
      return jp * a_body[bodies][:, :, None]         # (P, nv, 3)

    jp = jac(g['b2']) - jac(g['b1'])
    jn = jnp.einsum('pns,ps->pn', jp, normal)        # (P, nv)
    vel = jn @ d.qvel
    parts.append(Rows(
        jn, pos, g['margin'],
        -b * vel - k * imp * pos,
        imp / (1.0 - imp) / jnp.maximum(g['invw'], 1e-12),
        pos < 0.0, jnp.zeros_like(pos, dtype=bool)))
  return _concat_rows(parts)


def dof_anchored_axes(m: Model, d: Data) -> jax.Array:
  """cdofc (nv, 6): each dof's motion axis re-anchored at the world
  origin, [ang, lin - cross(ang, subtree_com[root_of_dof])].

  For any body whose ancestor mask selects dof n, the translational
  point Jacobian is cdofc_lin[n] + cross(cdofc_ang[n], point) — the
  per-body subtree-com anchor folds into a per-DOF constant because a
  masked dof always lives in the same kinematic tree as the body."""
  root_of_dof = np.asarray(m.body_rootid, dtype=np.int32)[
      np.asarray(m.dof_bodyid, dtype=np.int32)]
  ang = d.cdof[:, :3]
  lin = d.cdof[:, 3:] - jnp.cross(ang, d.subtree_com[root_of_dof])
  return jnp.concatenate([ang, lin], axis=-1)


def _capped_point_rows(m: Model, d: Data, s, condim: int, cap: int,
                       a_body: np.ndarray) -> Rows:
  """Dense facet rows for the `cap` deepest points of a stacked condim
  group (traced top-k selection; body indices become traced gathers).

  Many-candidate models (the hand+cube 'Cube Solving' task stacks ~460
  condim-3 candidate points: 130 fingertip-sphere x cubelet, 104 floor x
  cubelet, 208 palm x cubelet, ...) would otherwise materialize a
  (batch, ~1850, nv) facet Jacobian inside the Newton loop — 372 MB at
  512 samples on the round-4 profile — while only dozens of points can
  physically touch at once. Selection by penetration depth keeps every
  active contact as long as <= cap are active; the dropped rows are
  inactive (dist > margin) rows the solver would zero anyway. The
  reference's collision stage prunes to active contacts dynamically on
  CPU (engine_collision_driver.c); this is the static-shape analog."""
  from mujoco_mpc_tpu.physics import collision

  dtype = d.qpos.dtype
  pos_all = s.dist - s.margin
  _, sel = jax.lax.top_k(-pos_all, cap)
  pos3, normal = s.pos3[sel], s.normal[sel]
  tan_hint = s.tangent[sel]
  dist, margin = s.dist[sel], s.margin[sel]
  solref, solimp = s.solref[sel], s.solimp[sel]
  mu, invw = s.mu[sel], s.invw[sel]
  b1 = jnp.asarray(s.b1, dtype=jnp.int32)[sel]
  b2 = jnp.asarray(s.b2, dtype=jnp.int32)[sel]

  pos = dist - margin
  k, b, imp = kbi(solref, solimp, pos)
  if condim == 1:
    dapprox = invw
  else:
    dapprox = invw * 2.0 * mu[:, 0] ** 2 * (1.0 + mu[:, 0] ** 2)

  a_body_j = jnp.asarray(a_body, dtype=dtype)
  rootid_j = jnp.asarray(np.asarray(m.body_rootid, dtype=np.int32))

  def batch_jac(bodies):
    off = pos3 - d.subtree_com[rootid_j[bodies]]     # (cap, 3)
    jp = (d.cdof[None, :, 3:]
          + jnp.cross(d.cdof[None, :, :3], off[:, None, :]))
    mask = a_body_j[bodies][:, :, None]
    return jp * mask, d.cdof[None, :, :3] * mask     # (cap, nv, 3)

  jp1, jr1 = batch_jac(b1)
  jp2, jr2 = batch_jac(b2)
  jp = jp2 - jp1
  jn = jnp.einsum('pns,ps->pn', jp, normal)          # (cap, nv)

  t1, t2 = collision._make_frames(normal, tan_hint)
  if condim == 1:
    jmat, nrep = jn, 1
  else:
    mus = mu[:, 0:1]
    jt1 = jnp.einsum('pns,ps->pn', jp, t1)
    jt2 = jnp.einsum('pns,ps->pn', jp, t2)
    facets = [jn + mus * jt1, jn - mus * jt1,
              jn + mus * jt2, jn - mus * jt2]
    if condim >= 4:
      jr = jr2 - jr1
      mut = mu[:, 1:2]
      jrn = jnp.einsum('pns,ps->pn', jr, normal)
      facets += [jn + mut * jrn, jn - mut * jrn]
      if condim == 6:
        mur = mu[:, 2:3]
        jrt1 = jnp.einsum('pns,ps->pn', jr, t1)
        jrt2 = jnp.einsum('pns,ps->pn', jr, t2)
        facets += [jn + mur * jrt1, jn - mur * jrt1,
                   jn + mur * jrt2, jn - mur * jrt2]
    jmat = jnp.concatenate(facets)
    nrep = len(facets)

  posr = jnp.tile(pos, nrep)
  vel = jmat @ d.qvel
  return Rows(
      jmat, posr, jnp.tile(margin, nrep),
      -jnp.tile(b, nrep) * vel - jnp.tile(k * imp, nrep) * posr,
      jnp.tile(imp / (1.0 - imp) / jnp.maximum(dapprox, 1e-12), nrep),
      posr < 0.0, jnp.zeros_like(posr, dtype=bool))


def contact_point_groups(m: Model, d: Data):
  """Pyramidal contacts in factored point-direction form, one PointRows
  per condim group (see PointRows; the dense twin is contact_blocks).
  Returns (groups, capped_rows): groups whose point count exceeds
  m.contact_point_cap (when set) are depth-capped and emitted as dense
  facet rows instead (see _capped_point_rows).

  Nothing nv-sized is materialized per contact here: direction rows are
  the rank-6 factors G = [pos3 x dir, dir] against the shared dof axes
  cdofc, masked by the static ancestor-mask difference of the two
  bodies. Direction velocities for aref come from the masked projection
  cw[p] = sum_n cdofc[n] dmask[p,n] qvel[n] (a (P, 6) tensor), so the
  whole assembly is O(P*6) wide instead of O(P*ndirs*nv)."""
  from mujoco_mpc_tpu.physics import collision, structure

  if not m.collision_pairs:
    return [], None
  dtype = d.qpos.dtype
  groups, _ = _contact_groups(m, d)

  a_body = np.asarray(structure.body_ancestor_dof_mask(
      m.body_parentid, m.body_dofadr, m.body_dofnum, m.nv))
  cdofc = dof_anchored_axes(m, d)

  out = []
  capped = []
  for condim, g in groups.items():
    if g is None:
      continue
    s = _Stacked(g)
    cap = m.contact_point_cap
    if cap and s.dist.shape[0] > cap:
      capped.append(_capped_point_rows(m, d, s, condim, cap, a_body))
      continue
    pos3, normal, tan_hint = s.pos3, s.normal, s.tangent
    dist, margin = s.dist, s.margin
    solref, solimp, mu, invw = s.solref, s.solimp, s.mu, s.invw
    b1_arr, b2_arr = s.b1, s.b2

    pos = dist - margin
    k, b, imp = kbi(solref, solimp, pos)             # (P,)
    if condim == 1:
      dapprox = invw
    else:
      dapprox = invw * 2.0 * mu[:, 0] ** 2 * (1.0 + mu[:, 0] ** 2)
    dvec = imp / (1.0 - imp) / jnp.maximum(dapprox, 1e-12)
    dvec = jnp.where(pos < 0.0, dvec, 0.0)

    dmask = (a_body[b2_arr] - a_body[b1_arr]).astype(np.float32)

    t1, t2 = collision._make_frames(normal, tan_hint)
    if condim == 1:
      dirs_t = normal[:, None, :]                    # (P, 1, 3)
    else:
      dirs_t = jnp.stack([normal, t1, t2], axis=1)   # (P, 3, 3)
    gfac = jnp.concatenate(
        [jnp.cross(pos3[:, None, :], dirs_t), dirs_t], axis=-1)
    if condim >= 4:
      dirs_r = (normal[:, None, :] if condim == 4
                else jnp.stack([normal, t1, t2], axis=1))
      gfac = jnp.concatenate(
          [gfac, jnp.concatenate([dirs_r, jnp.zeros_like(dirs_r)], -1)],
          axis=1)                                    # (P, ndirs, 6)

    # per-facet aref from direction velocities (never materializes jd):
    # vd[p,d] = G[p,d] . cw[p], cw[p] = sum_n cdofc[n] dmask[p,n] v[n];
    # aref_f = -b (v_n + sign mu v_di) - k imp pos
    cw = jnp.einsum('nj,pn->pj', cdofc * d.qvel[:, None],
                    jnp.asarray(dmask, dtype=dtype))  # (P, 6)
    vd = jnp.einsum('pdj,pj->pd', gfac, cw)          # (P, ndirs)
    base = -b * vd[:, 0] - k * imp * pos             # (P,)
    facets = PYRAMID_FACETS[condim]
    aref = jnp.stack(
        [base - b * sgn * mu[:, col] * vd[:, di] if sgn else base
         for (di, col, sgn) in facets])              # (nrep, P)
    out.append(PointRows(g=gfac, cdofc=cdofc, dmask=dmask, aref=aref,
                         dvec=dvec, mu=mu.T, condim=condim))
  return out, (_concat_rows(capped) if capped else None)


def point_rows_jd(pr: PointRows) -> jax.Array:
  """Materialize the (P, ndirs, nv) direction Jacobians of a factored
  group (tests / the XLA reference path)."""
  from mujoco_mpc_tpu.ops import pallas_newton
  return pallas_newton.materialize_jd(pr.g, pr.cdofc, pr.dmask)


def expand_point_rows(pr: PointRows):
  """Facet-expand a PointRows group to dense rows (the XLA fallback /
  reference path; the fused kernel performs this expansion in VMEM).

  Returns (j (nrep*P, nv), aref (nrep*P,), dvec (nrep*P,)) in the same
  facet-major order as contact_blocks."""
  from mujoco_mpc_tpu.ops import pallas_newton
  return pallas_newton.expand_group(point_rows_jd(pr), pr.aref, pr.dvec,
                                    pr.mu, pr.condim)


class ConeRows(NamedTuple):
  """Elliptic-cone contact rows (MJCF <option cone="elliptic"/>).

  One entry per condim>1 contact, padded to 6 rows (normal, t1, t2,
  torsion, roll1, roll2) — padded friction dims carry s=0 so they drop
  out of every zone formula. The per-contact cost (validated against
  mj_constraintUpdate, see tests/test_elliptic.py) with N = jar[0],
  T = ||jar[1:] * s|| (s_i = mu_i/mu0):

    satisfied (mu0 T <= N):        0
    bottom    (T <= -mu0 N):       0.5 * sum_i d0 s_i^2 jar_i^2
    middle    (otherwise):         0.5 * d0/(1+mu0^2) * (mu0 T - N)^2

  matching MuJoCo's per-row efc_D = D0 (mu_i/mu0)^2 and the cone-zone
  force f_N = D0/(1+mu0^2) (mu0 T - N) observed from the C oracle."""
  j: jax.Array      # (C, 6, nv) contact-frame rows
  pos: jax.Array    # (C,) normal penetration (dist - margin)
  aref: jax.Array   # (C, 6) reference acceleration per row
  d0: jax.Array     # (C,) normal-row weight (0 when contact inactive)
  s: jax.Array      # (C, 5) friction scale mu_i/mu0 per friction row
  mu: jax.Array     # (C,) mu0 (sliding friction)


class ConeBlock(NamedTuple):
  rows: ConeRows
  pos3: jax.Array   # (C, 3) world contact points
  frame: jax.Array  # (C, 3, 3) rows (normal, t1, t2)
  b1: np.ndarray
  b2: np.ndarray


def cone_contact_blocks(m: Model, d: Data) -> ConeBlock | None:
  """Elliptic contact rows: every condim>1 contact padded to 6 rows.

  Same point-stacked assembly as contact_blocks, but rows are the raw
  contact-frame Jacobians (no pyramidal facet expansion): the mu scaling
  lives in the zone cost, exactly as MuJoCo's elliptic efc rows."""
  from mujoco_mpc_tpu.physics import collision, structure

  if not m.collision_pairs:
    return None
  dtype = d.qpos.dtype
  groups, _ = _contact_groups(m, d)

  a_body = np.asarray(structure.body_ancestor_dof_mask(
      m.body_parentid, m.body_dofadr, m.body_dofnum, m.nv))
  rootid = np.asarray(m.body_rootid, dtype=np.int32)

  parts = []
  for condim in (3, 4, 6):
    g = groups.get(condim)
    if g is None:
      continue
    s = _Stacked(g)
    pos3, normal, tan_hint = s.pos3, s.normal, s.tangent
    dist, margin = s.dist, s.margin
    solref, solimp, mu, invw = s.solref, s.solimp, s.mu, s.invw
    b1_arr, b2_arr = s.b1, s.b2
    p = pos3.shape[0]

    pos = dist - margin
    k, b, imp = kbi(solref, solimp, pos)             # (P,)
    d0 = imp / (1.0 - imp) / jnp.maximum(invw, 1e-12)
    d0 = jnp.where(pos < 0.0, d0, 0.0)               # inactive -> no force

    def batch_jac(bodies):
      off = pos3 - d.subtree_com[rootid[bodies]]
      jp = (d.cdof[None, :, 3:]
            + jnp.cross(d.cdof[None, :, :3], off[:, None, :]))
      mask = jnp.asarray(a_body[bodies], dtype=dtype)[:, :, None]
      return jp * mask, d.cdof[None, :, :3] * mask   # (P, nv, 3)

    jp1, jr1 = batch_jac(b1_arr)
    jp2, jr2 = batch_jac(b2_arr)
    jp = jp2 - jp1
    jr = jr2 - jr1
    t1, t2 = collision._make_frames(normal, tan_hint)
    dirs = jnp.stack([normal, t1, t2], axis=1)       # (P, 3, 3)
    jtrans = jnp.einsum('pns,pds->pdn', jp, dirs)    # (P, 3, nv)
    jrot = jnp.einsum('pns,pds->pdn', jr, dirs)      # (P, 3, nv)
    jfull = jnp.concatenate([jtrans, jrot], axis=1)  # (P, 6, nv)

    # friction scale s_i = mu_i / mu0 per row (0 marks a padded dim)
    mu0 = mu[:, 0]
    one = jnp.ones_like(mu0)
    zerop = jnp.zeros_like(mu0)
    tor = mu[:, 1] / mu0
    rol = mu[:, 2] / mu0
    if condim == 3:
      s = jnp.stack([one, one, zerop, zerop, zerop], axis=1)
    elif condim == 4:
      s = jnp.stack([one, one, tor, zerop, zerop], axis=1)
    else:
      s = jnp.stack([one, one, tor, rol, rol], axis=1)
    row_on = jnp.concatenate([jnp.ones((p, 1), dtype=dtype),
                              (s > 0).astype(dtype)], axis=1)  # (P, 6)
    jfull = jfull * row_on[:, :, None]

    # aref: normal row -b v - k imp pos; friction rows -b v (pos = 0)
    vel = jnp.einsum('pdn,n->pd', jfull, d.qvel)     # (P, 6)
    aref = -b[:, None] * vel
    aref = aref.at[:, 0].add(-k * imp * pos)

    parts.append((ConeRows(jfull, pos, aref, d0, s, mu0),
                  pos3, jnp.stack([normal, t1, t2], axis=1), b1_arr,
                  b2_arr))
  if not parts:
    return None
  rows = ConeRows(*(jnp.concatenate(x) for x in zip(*[p[0] for p in parts])))
  return ConeBlock(rows=rows,
                   pos3=jnp.concatenate([p[1] for p in parts]),
                   frame=jnp.concatenate([p[2] for p in parts]),
                   b1=np.concatenate([p[3] for p in parts]),
                   b2=np.concatenate([p[4] for p in parts]))


class ContactForces(NamedTuple):
  """Decoded per-point contact wrenches (analog of mj_contactForce).

  force6 columns: (normal, t1, t2) forces then (normal, t1, t2) torques,
  all in the contact frame, acting ON body b2 (reaction on b1). The
  normal points from geom1 to geom2."""
  pos: jax.Array      # (P, 3)
  frame: jax.Array    # (P, 3, 3) rows (normal, t1, t2)
  force6: jax.Array   # (P, 6)
  b1: np.ndarray      # (P,) static
  b2: np.ndarray


def contact_forces(m: Model, d: Data) -> ContactForces | None:
  """Recover contact forces from the converged qacc.

  The primal Newton solution satisfies f_row = -d_row * jar_row for active
  rows (physics/constraint.py solve); pyramidal facet forces fold back to
  the contact wrench: fn = sum of facet forces, f_tangent_i =
  mu_i * (f_i+ - f_i-) (the inverse of the facet expansion, the same
  decoding mj_contactForce applies to pyramidal cones). Evaluated on
  demand by force/torque/touch sensors (physics/sensors.py) — the rollout
  hot loop never pays for it."""
  if m.opt.cone == 1:
    return _contact_forces_elliptic(m, d)
  blocks = contact_blocks(m, d)
  if not blocks:
    return None
  pos_l, frame_l, f6_l, b1_l, b2_l = [], [], [], [], []
  for blk in blocks:
    rows = blk.rows
    p = blk.pos.shape[0]
    jar = rows.j @ d.qacc - rows.aref
    dvec = jnp.where(rows.active, rows.d, 0.0)
    f = jnp.where(jar < 0, -dvec * jar, 0.0).reshape(blk.nrep, p)
    zero = jnp.zeros_like(f[0])
    if blk.condim == 1:
      fn, ft1, ft2, trn, trt1, trt2 = f[0], zero, zero, zero, zero, zero
    else:
      fn = jnp.sum(f, axis=0)
      ft1 = blk.mu[:, 0] * (f[0] - f[1])
      ft2 = blk.mu[:, 0] * (f[2] - f[3])
      trn = (blk.mu[:, 1] * (f[4] - f[5]) if blk.condim >= 4 else zero)
      if blk.condim == 6:
        trt1 = blk.mu[:, 2] * (f[6] - f[7])
        trt2 = blk.mu[:, 2] * (f[8] - f[9])
      else:
        trt1, trt2 = zero, zero
    pos_l.append(blk.pos)
    frame_l.append(blk.frame)
    f6_l.append(jnp.stack([fn, ft1, ft2, trn, trt1, trt2], axis=1))
    b1_l.append(blk.b1)
    b2_l.append(blk.b2)
  return ContactForces(
      pos=jnp.concatenate(pos_l), frame=jnp.concatenate(frame_l),
      force6=jnp.concatenate(f6_l), b1=np.concatenate(b1_l),
      b2=np.concatenate(b2_l))


def _contact_forces_elliptic(m: Model, d: Data) -> ContactForces | None:
  """Elliptic decode: cone rows map 1:1 to contact-frame force dims
  (f = -d cost / d jar), plus the condim-1 normal rows."""
  from mujoco_mpc_tpu.ops import pallas_newton

  pos_l, frame_l, f6_l, b1_l, b2_l = [], [], [], [], []
  for blk in contact_blocks(m, d, condims=(1,)):
    rows = blk.rows
    jar = rows.j @ d.qacc - rows.aref
    dvec = jnp.where(rows.active, rows.d, 0.0)
    fn = jnp.where(jar < 0, -dvec * jar, 0.0)
    zero = jnp.zeros_like(fn)
    pos_l.append(blk.pos)
    frame_l.append(blk.frame)
    f6_l.append(jnp.stack([fn, zero, zero, zero, zero, zero], axis=1))
    b1_l.append(blk.b1)
    b2_l.append(blk.b2)
  cblk = cone_contact_blocks(m, d)
  if cblk is not None:
    cr = cblk.rows
    jar_c = jnp.einsum('cdn,n->cd', cr.j, d.qacc) - cr.aref
    f6 = -pallas_newton.cone_grad(jar_c, cr.d0, cr.s, cr.mu)
    pos_l.append(cblk.pos3)
    frame_l.append(cblk.frame)
    f6_l.append(f6)
    b1_l.append(cblk.b1)
    b2_l.append(cblk.b2)
  if not pos_l:
    return None
  return ContactForces(
      pos=jnp.concatenate(pos_l), frame=jnp.concatenate(frame_l),
      force6=jnp.concatenate(f6_l), b1=np.concatenate(b1_l),
      b2=np.concatenate(b2_l))


def _concat_rows(blocks) -> Rows | None:
  blocks = [b for b in blocks if b is not None]
  if not blocks:
    return None
  return Rows(*(jnp.concatenate(parts) for parts in zip(*blocks)))


def make_rows(m: Model, d: Data):
  """Assemble all constraint rows (equality + joint/tendon limits +
  contacts), in MuJoCo's efc ordering, as one dense block (tests /
  introspection; the hot path uses make_rows_split)."""
  return _concat_rows([_equality_rows(m, d), _limit_rows(m, d),
                       _tendon_limit_rows(m, d), _contact_rows(m, d)])


def make_rows_split(m: Model, d: Data):
  """(dense Rows | None, ScalarRows | None, ConeRows | None,
  FrictionRows | None, list[PointRows]): joint limits and frictionloss
  rows kept one-hot so the Newton solve never materializes their J
  block; pyramidal contacts kept in point-direction form (PointRows) so
  the facet expansion happens inside the solve; under
  <option cone="elliptic"/> the condim>1 contacts move to grouped cone
  rows (condim-1 contacts stay one-sided dense rows)."""
  points: list[PointRows] = []
  capped = None
  dyn_contact = _dyn_contact_rows(m, d)
  if m.opt.cone == 1:
    contact = _concat_rows(
        [b.rows for b in contact_blocks(m, d, condims=(1,))]) \
        if m.collision_pairs else None
    cone_blk = cone_contact_blocks(m, d)
    cone = cone_blk.rows if cone_blk is not None else None
  else:
    contact = None
    points, capped = contact_point_groups(m, d)
    cone = None
  dense = _concat_rows([_equality_rows(m, d), _tendon_limit_rows(m, d),
                        contact, dyn_contact, capped])
  return dense, _limit_rows_scalar(m, d), cone, _friction_rows(m, d), \
      points


def solve(m: Model, d: Data, rows: Rows | None,
          scalar: ScalarRows | None = None,
          cone: ConeRows | None = None,
          friction: FrictionRows | None = None,
          points: list[PointRows] = (),
          max_iterations: int = None,
          tolerance: float = None) -> Data:
  """Primal Newton solve for qacc given constraint rows.

  Converges in a few iterations (piecewise quadratic cost, exact Newton).
  Under vmap the while_loop runs until the WORST sample converges, so
  batched planning models bound the cost with a small static cap
  (Model.opt.iterations, from the MJCF <option iterations/>);
  estimation/golden paths keep the MuJoCo default of 100 and exit early.

  The solve itself lives behind the ops/pallas_newton.py seam: per-sample
  calls (golden tests, estimators) run the jar-carrying XLA while_loop;
  vmapped f32 TPU planning dispatches the fused whole-iteration Pallas
  kernel; jacfwd (derivative planners, EKF) uses the frozen-active-set
  implicit tangent. One-hot rows (joint limits, `scalar`) contribute
  through gathers/scatters, never a dense J block.
  """
  from mujoco_mpc_tpu.ops import pallas_newton
  from mujoco_mpc_tpu.utils import tpu_math as _tm

  qacc_smooth = d.qacc
  if max_iterations is None:
    max_iterations = m.opt.iterations
  if tolerance is None:
    tolerance = 1e-5 if d.qpos.dtype == jnp.float32 else 1e-8
  if (rows is None and scalar is None and cone is None
      and friction is None and not points):
    return d.replace(qfrc_constraint=_tm.match_vma(
        jnp.zeros(m.nv, dtype=d.qpos.dtype), d.qpos))

  dtype = d.qpos.dtype
  qm = d.qM
  if rows is not None:
    j_mat = rows.j                     # (n_d, nv)
    aref_d = rows.aref
    dvec_d = jnp.where(rows.active, rows.d, 0.0)
    eqf = rows.equality.astype(dtype)
  else:
    j_mat = _tm.match_vma(jnp.zeros((0, m.nv), dtype=dtype), d.qpos)
    aref_d = _tm.match_vma(jnp.zeros(0, dtype=dtype), d.qpos)
    dvec_d = aref_d
    eqf = aref_d
  if scalar is not None:
    dof = tuple(int(x) for x in scalar.dof)
    sign = tuple(float(x) for x in scalar.sign)
    aref_s = scalar.aref
    dvec_s = jnp.where(scalar.active, scalar.d, 0.0)
  else:
    dof, sign = (), ()
    aref_s = _tm.match_vma(jnp.zeros(0, dtype=dtype), d.qpos)
    dvec_s = aref_s
  if cone is not None:
    c_j, c_aref, c_d0 = cone.j, cone.aref, cone.d0
    c_s, c_mu = cone.s, cone.mu
  else:
    c_j = _tm.match_vma(jnp.zeros((0, 6, m.nv), dtype=dtype), d.qpos)
    c_aref = _tm.match_vma(jnp.zeros((0, 6), dtype=dtype), d.qpos)
    c_d0 = _tm.match_vma(jnp.zeros(0, dtype=dtype), d.qpos)
    c_s = _tm.match_vma(jnp.zeros((0, 5), dtype=dtype), d.qpos)
    c_mu = c_d0
  if friction is not None:
    fdof = tuple(int(x) for x in friction.dof)
    aref_f, dvec_f, loss_f = friction.aref, friction.d, friction.loss
  else:
    fdof = ()
    aref_f = _tm.match_vma(jnp.zeros(0, dtype=dtype), d.qpos)
    dvec_f = aref_f
    loss_f = aref_f

  condims = tuple(int(p.condim) for p in points)
  dmasks = tuple(p.dmask.tobytes() for p in points)
  group_args = [points[0].cdofc] if points else []
  for p in points:
    group_args += [p.g, p.aref, p.dvec, p.mu]
  newton = pallas_newton.make_newton(dof, sign, int(max_iterations),
                                     float(tolerance), fdof=fdof,
                                     condims=condims, dmasks=dmasks)
  qacc, jar_d, jar_s, jar_c, jar_f, *jar_pts = newton(
      qm, qacc_smooth, j_mat, aref_d, dvec_d, eqf, aref_s, dvec_s, c_j,
      c_aref, c_d0, c_s, c_mu, aref_f, dvec_f, loss_f, *group_args)

  qfrc_constraint = _tm.match_vma(jnp.zeros(m.nv, dtype=dtype), qacc)
  if rows is not None:
    f_d = jnp.where(jnp.logical_or(jar_d < 0, rows.equality),
                    -dvec_d * jar_d, 0.0)
    qfrc_constraint = qfrc_constraint + j_mat.T @ f_d
  if scalar is not None:
    f_s = jnp.where(jar_s < 0, -dvec_s * jar_s, 0.0)
    sgn = jnp.asarray(np.asarray(sign), dtype=dtype)
    qfrc_constraint = qfrc_constraint.at[np.asarray(dof, dtype=np.int32)
                                         ].add(sgn * f_s)
  if cone is not None:
    f_c = -pallas_newton.cone_grad(jar_c, c_d0, c_s, c_mu)
    qfrc_constraint = qfrc_constraint + jnp.einsum('cdn,cd->n', c_j, f_c)
  if friction is not None:
    f_f = -jnp.clip(dvec_f * jar_f, -loss_f, loss_f)
    qfrc_constraint = qfrc_constraint.at[
        np.asarray(fdof, dtype=np.int32)].add(f_f)
  for p, jar_g in zip(points, jar_pts):
    # facet force f = max(0, -D jar); fold back through the facet table
    # as per-direction coefficients (the transpose of the expansion),
    # then through the rank-6 factors: J^T f = sum_p dmask[p] *
    # (cdofc . gw[p]) with gw[p] = sum_d G[p,d] coef[p,d]
    f_g = jnp.where(jar_g < 0, -p.dvec[None, :] * jar_g, 0.0)  # (nrep, P)
    coef = jnp.zeros(p.g.shape[:2], dtype=dtype)               # (P, ndirs)
    for fi, (di, col, sgn) in enumerate(PYRAMID_FACETS[p.condim]):
      coef = coef.at[:, 0].add(f_g[fi])
      if sgn:
        coef = coef.at[:, di].add(sgn * p.mu[col] * f_g[fi])
    gw = jnp.einsum('pdj,pd->pj', p.g, coef)                   # (P, 6)
    qfrc_constraint = qfrc_constraint + jnp.einsum(
        'pj,nj,pn->n', gw, p.cdofc,
        jnp.asarray(p.dmask, dtype=dtype))
  return d.replace(qacc=qacc, qfrc_constraint=qfrc_constraint)
