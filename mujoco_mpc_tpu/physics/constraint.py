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
from mujoco_mpc_tpu.ops import pallas_linalg
from mujoco_mpc_tpu.physics.model import Data, JointType, Model

_MIN_IMP, _MAX_IMP = 0.0001, 0.9999


class Rows(NamedTuple):
  """A block of constraint rows (fixed size)."""
  j: jax.Array       # (n, nv) Jacobian
  pos: jax.Array     # (n,) constraint violation (negative = violated)
  margin: jax.Array  # (n,)
  aref: jax.Array    # (n,) reference acceleration
  d: jax.Array       # (n,) penalty weight D
  active: jax.Array  # (n,) bool


def impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """MuJoCo constraint impedance d(pos) in (0,1)."""
  d0, dw, width, mid, power = (solimp[..., 0], solimp[..., 1],
                               solimp[..., 2], solimp[..., 3], solimp[..., 4])
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


def _limit_rows(m: Model, d: Data) -> Rows | None:
  """Joint-limit rows: 2 per limited scalar joint (lower, upper)."""
  limited = [j for j in range(m.njnt)
             if m.jnt_limited[j]
             and m.jnt_type[j] in (JointType.HINGE, JointType.SLIDE)]
  if not limited:
    return None
  nv = m.nv
  dtype = d.qpos.dtype

  js, poss, margins, arefs, ds, actives = [], [], [], [], [], []
  for j in limited:
    qadr, dofadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    vel = d.qvel[dofadr]
    for side in (0, 1):
      if side == 0:
        pos = d.qpos[qadr] - m.jnt_range[j, 0]
        jac = jnp.zeros(nv, dtype=dtype).at[dofadr].set(1.0)
        v = vel
      else:
        pos = m.jnt_range[j, 1] - d.qpos[qadr]
        jac = jnp.zeros(nv, dtype=dtype).at[dofadr].set(-1.0)
        v = -vel
      pos = pos - m.jnt_margin[j]
      k, b, imp = kbi(m.jnt_solref[j], m.jnt_solimp[j], pos)
      aref = -b * v - k * imp * pos
      dd = imp / (1.0 - imp) / jnp.maximum(m.dof_invweight0[dofadr], 1e-12)
      js.append(jac)
      poss.append(pos)
      margins.append(m.jnt_margin[j])
      arefs.append(aref)
      ds.append(dd)
      actives.append(pos < 0.0)
  return Rows(jnp.stack(js), jnp.stack(poss), jnp.stack(margins),
              jnp.stack(arefs), jnp.stack(ds), jnp.stack(actives))


def _contact_rows(m: Model, d: Data) -> Rows | None:
  """Contact constraint rows from the static candidate pair list.

  Pyramidal friction (MuJoCo default): condim-3 contacts contribute 4
  one-sided rows J = Jn ± mu*Jt_i with diagApprox scaled by 2*(1+mu^2);
  frictionless (condim 1) contribute the normal row. Validated numerically
  against mjd.efc_* (tests/test_contacts.py).

  Assembly is point-stacked: per-point normals/tangent Jacobians are
  stacked into (P, nv) tensors FIRST and the 4 friction rows are expanded
  with one broadcast op. Building rows one-by-one leaves ~rows separate
  (batch, 1, nv) temporaries alive inside the Newton while_loop, each
  padded to (8, 128) tiles — a 146x memory expansion that OOMed the
  Shadow-hand planner at 8192 samples.
  """
  from mujoco_mpc_tpu.physics import collision, smooth

  if not m.collision_pairs:
    return None
  dtype = d.qpos.dtype

  # per-point gathers, grouped by condim (static structure)
  g1_jn, g1_scal = [], []   # frictionless: (jn, (pos, margin, k_imp, b, imp, dapprox))
  g3_jn, g3_jt1, g3_jt2, g3_scal, g3_mu = [], [], [], [], []

  for (g1, g2) in m.collision_pairs:
    params = collision.pair_params(m, g1, g2)
    points = collision.narrowphase(m, d, g1, g2)
    if not points:
      continue
    b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
    mu = params.friction
    for cp in points:
      pos = cp.dist - params.includemargin
      jacp1, _ = smooth._body_jac(m, d, b1, cp.pos)
      jacp2, _ = smooth._body_jac(m, d, b2, cp.pos)
      jp = jacp2 - jacp1                     # (nv, 3)
      n = cp.normal
      jn = jp @ n
      k, b, imp = kbi(params.solref, params.solimp, pos)
      if params.condim == 1:
        dapprox = params.invweight + 0.0 * mu
        g1_jn.append(jn)
        g1_scal.append(jnp.stack([pos, params.includemargin + 0.0 * pos,
                                  k * imp, b, imp, dapprox]))
      else:
        t1, t2 = collision._make_frame(n)
        dapprox = params.invweight * 2.0 * (1.0 + mu * mu)
        g3_jn.append(jn)
        g3_jt1.append(jp @ t1)
        g3_jt2.append(jp @ t2)
        g3_mu.append(mu + 0.0 * pos)
        g3_scal.append(jnp.stack([pos, params.includemargin + 0.0 * pos,
                                  k * imp, b, imp, dapprox]))

  blocks = []
  if g1_jn:
    jmat = jnp.stack(g1_jn)                          # (P1, nv)
    sc = jnp.stack(g1_scal)                          # (P1, 6)
    pos, margin, k_imp, b, imp, dapprox = (sc[:, 0], sc[:, 1], sc[:, 2],
                                           sc[:, 3], sc[:, 4], sc[:, 5])
    vel = jmat @ d.qvel
    blocks.append(Rows(jmat, pos, margin, -b * vel - k_imp * pos,
                       imp / (1.0 - imp) / jnp.maximum(dapprox, 1e-12),
                       pos < 0.0))
  if g3_jn:
    jn = jnp.stack(g3_jn)                            # (P3, nv)
    jt1 = jnp.stack(g3_jt1)
    jt2 = jnp.stack(g3_jt2)
    mu = jnp.stack(g3_mu)[:, None]                   # (P3, 1)
    sc = jnp.stack(g3_scal)                          # (P3, 6)
    # 4 pyramidal rows per point in one broadcast: jn ± mu*jt{1,2}
    jmat = jnp.concatenate([jn + mu * jt1, jn - mu * jt1,
                            jn + mu * jt2, jn - mu * jt2])  # (4*P3, nv)
    sc4 = jnp.tile(sc, (4, 1))
    pos, margin, k_imp, b, imp, dapprox = (sc4[:, 0], sc4[:, 1], sc4[:, 2],
                                           sc4[:, 3], sc4[:, 4], sc4[:, 5])
    vel = jmat @ d.qvel
    blocks.append(Rows(jmat, pos, margin, -b * vel - k_imp * pos,
                       imp / (1.0 - imp) / jnp.maximum(dapprox, 1e-12),
                       pos < 0.0))
  return _concat_rows(blocks)


def _concat_rows(blocks) -> Rows | None:
  blocks = [b for b in blocks if b is not None]
  if not blocks:
    return None
  return Rows(*(jnp.concatenate(parts) for parts in zip(*blocks)))


def make_rows(m: Model, d: Data):
  """Assemble all constraint rows (joint limits + contacts)."""
  return _concat_rows([_limit_rows(m, d), _contact_rows(m, d)])


def solve(m: Model, d: Data, rows: Rows | None, max_iterations: int = None,
          tolerance: float = None) -> Data:
  """Primal Newton solve for qacc given constraint rows.

  Converges in a few iterations (piecewise quadratic cost, exact Newton)
  and exits on a scaled gradient test. Under vmap the while_loop runs until
  the WORST sample converges, so batched planning models bound the cost
  with a small static cap (Model.opt.iterations, from the MJCF
  <option iterations/>); estimation/golden paths keep the MuJoCo default
  of 100 and exit early. All linear algebra uses the unrolled small-matrix
  kernels (ops/linalg.py).
  """
  qacc_smooth = d.qacc
  if max_iterations is None:
    max_iterations = m.opt.iterations
  if tolerance is None:
    tolerance = 1e-5 if d.qpos.dtype == jnp.float32 else 1e-8
  if rows is None:
    return d.replace(
        qfrc_constraint=jnp.zeros(m.nv, dtype=d.qpos.dtype))

  qm = d.qM
  j_mat = rows.j                       # (n, nv)
  dvec = jnp.where(rows.active, rows.d, 0.0)

  def force(qacc):
    jar = j_mat @ qacc - rows.aref
    # one-sided: force only when jar < 0
    return jnp.where(jar < 0, -dvec * jar, 0.0)

  def grad(qacc):
    return qm @ (qacc - qacc_smooth) - j_mat.T @ force(qacc)

  def cost(qa):
    jar = j_mat @ qa - rows.aref
    pen = jnp.where(jar < 0, dvec, 0.0)
    dq = qa - qacc_smooth
    return 0.5 * dq @ (qm @ dq) + 0.5 * jnp.sum(pen * jar * jar)

  def cond(carry):
    qacc, it, done, _ = carry
    return jnp.logical_and(it < max_iterations, jnp.logical_not(done))

  def body(carry):
    qacc, it, _, prev_exact = carry
    g = grad(qacc)
    jar = j_mat @ qacc - rows.aref
    active = jar < 0
    w = jnp.where(active, dvec, 0.0)
    h = qm + (j_mat.T * w) @ j_mat
    h = h + 1e-10 * jnp.eye(m.nv, dtype=h.dtype)
    # SPD solve: vmapped call sites dispatch the fused lane-batched Pallas
    # kernel (ops/pallas_linalg.py); custom_linear_solve keeps autodiff on
    # the implicit-function rule instead of differentiating the kernel
    step = jax.lax.custom_linear_solve(
        lambda v: h @ v, g,
        solve=lambda _mv, rhs: pallas_linalg.solve_spd(h, rhs),
        symmetric=True)

    c0 = cost(qacc)
    alphas = jnp.array([1.0, 0.5, 0.25, 0.0625], dtype=qacc.dtype)
    cands = qacc[None, :] - alphas[:, None] * step[None, :]
    costs = jax.vmap(cost)(cands)
    best = jnp.argmin(costs)
    qacc_new = jnp.where(costs[best] < c0, cands[best], qacc)
    # convergence: the cost is piecewise quadratic in qacc, so once the
    # full Newton step is taken with an unchanged active set, qacc_new is
    # the KKT point of the convex problem up to the tiny Hessian damping
    # (which matters for ill-conditioned mass matrices). TWO consecutive
    # stable-active-set full steps leave only O(damping^2) error — exit
    # then, or on a small step (truncated-step fallback).
    new_active = (j_mat @ qacc_new - rows.aref) < 0
    exact = jnp.logical_and(best == 0,
                            jnp.all(new_active == active))
    small = (jnp.linalg.norm(step)
             <= tolerance * (1.0 + jnp.linalg.norm(qacc_new)))
    done = jnp.logical_or(jnp.logical_and(exact, prev_exact), small)
    return (qacc_new, it + 1, done, exact)

  init = (qacc_smooth, jnp.array(0, dtype=jnp.int32), jnp.array(False),
          jnp.array(False))
  qacc, _, _, _ = jax.lax.while_loop(cond, body, init)
  f = force(qacc)
  qfrc_constraint = j_mat.T @ f
  return d.replace(qacc=qacc, qfrc_constraint=qfrc_constraint)
