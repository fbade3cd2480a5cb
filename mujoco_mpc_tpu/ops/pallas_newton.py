"""Fused whole-iteration Pallas Newton solve for the contact problem.

The primal-Newton constraint solve (physics/constraint.py) is, per rollout
sample, a few iterations of: activity mask -> gradient -> Hessian
H = M + J^T W J -> Cholesky solve -> exact line search along the step.
Under `vmap` the XLA path emits hundreds of small HLO ops per iteration
plus layout copies to feed the lane-batched Cholesky kernel — profiled on
TPU (docs/PERF.md round 2), that dispatch/layout tax dominates: ~41 ms of
the 4096x36 quadruped plan, 12 ms of it pure H-layout copies.

This kernel runs the ENTIRE Newton loop for a batch tile of samples in
one Pallas program: J, M and all carries live in VMEM and the only HBM
traffic is one read of the inputs and one write of the outputs. Two
batch layouts (see _newton_kernel): the default packs S*128 samples per
program with every per-sample scalar an (S, 128) tile — S=8 fills the
whole f32 vreg, ~8x the VPU throughput of a 1-sublane lane vector — and
falls back to the compact (128,)-lane layout when the sublane-padded
tiles would blow the ~16 MB VMEM budget (Shadow-class row counts).
Either way the batch transpose is paid once per step, not per iteration.

Differentiation: the planner derivative stack (planners/derivatives.py)
jacfwd's the step, so the solve carries a `jax.custom_jvp` implementing
the implicit-function tangent on the KKT system with the converged
active set frozen — the exact derivative of the piecewise-smooth contact
solution (what the reference's mjd_transitionFD finite-differences,
model_derivatives.cc:45-165), and far cheaper than differentiating the
unrolled loop.

Reference for the solved problem: MuJoCo's primal Newton solver
(the engine behind mj_step's constraint phase, used by the reference's
rollouts at trajectory.cc:158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8         # full f32 vreg tile is (8, 128)
MAX_NV = 32          # same small-matrix regime as ops/pallas_linalg.py
MIN_BATCH = LANES    # below one lane tile the XLA path wins
_DAMP = 1e-10        # Hessian damping (matches physics/constraint.py)
_ALPHAS = (0.0, 1.0, 0.5, 0.25, 0.0625)
# Mosaic's default scoped-vmem limit is 16 MiB — far below the physical
# ~128 MiB/core on v5e/v4. The quadruped config's lane-layout tile needs
# ~17.5 MiB (measured: AOT OOM at 17.46M vs 16.00M), so we raise the
# per-kernel limit and budget tiles against it, keeping headroom for the
# pipeline's double-buffered operand blocks.
_VMEM_LIMIT = 100 * 2 ** 20
_VMEM_BUDGET = 64 * 2 ** 20


def _on_tpu() -> bool:
  try:
    return jax.default_backend() == 'tpu' or any(
        d.platform == 'tpu' for d in jax.devices())
  except RuntimeError:
    return False


# ---------------------------------------------------------------------------
# Pyramidal contact facets in point-direction form.
#
# A condim-c contact contributes nrep one-sided facet rows built from the
# raw contact-frame direction Jacobians jd = (normal, t1, t2[, rn, rt1,
# rt2]): row = jd[0] + sign * mu[mucol] * jd[di] (condim 1 = the bare
# normal, sign 0). The expansion is loop-invariant during a solve, so
# the fused kernel performs it once in VMEM; the XLA paths expand with
# expand_group. Table entries: (di, mucol, sign), facet-major order
# matching physics/constraint.contact_blocks.
# ---------------------------------------------------------------------------

PYRAMID_FACETS = {
    1: ((0, 0, 0.0),),
    3: ((1, 0, 1.0), (1, 0, -1.0), (2, 0, 1.0), (2, 0, -1.0)),
    4: ((1, 0, 1.0), (1, 0, -1.0), (2, 0, 1.0), (2, 0, -1.0),
        (3, 1, 1.0), (3, 1, -1.0)),
    6: ((1, 0, 1.0), (1, 0, -1.0), (2, 0, 1.0), (2, 0, -1.0),
        (3, 1, 1.0), (3, 1, -1.0),
        (4, 2, 1.0), (4, 2, -1.0), (5, 2, 1.0), (5, 2, -1.0)),
}


def expand_group(jd, aref, dvec, mu, condim):
  """Facet-expand one point group to dense one-sided rows.

  jd (P, ndirs, nv), aref (nrep, P), dvec (P,), mu (3, P) ->
  (j (nrep*P, nv), aref (nrep*P,), dvec (nrep*P,)), facet-major."""
  facets = PYRAMID_FACETS[condim]
  jn = jd[:, 0]
  rows = [jn + sgn * mu[col][:, None] * jd[:, di] if sgn else jn
          for (di, col, sgn) in facets]
  p = jd.shape[0]
  return (jnp.concatenate(rows), aref.reshape(len(facets) * p),
          jnp.tile(dvec, len(facets)))


# ---------------------------------------------------------------------------
# Factored point-group Jacobians.
#
# A contact direction row never needs the (P, ndirs, nv) Jacobian
# materialized: with cdofc[n] = [cdof_ang[n], cdof_lin[n] -
# cross(cdof_ang[n], subtree_com[root_of_dof(n)])] (the dof motion axis
# re-anchored at the world origin) and the STATIC ancestor-mask
# difference dmask[p, n] = mask(b2)[n] - mask(b1)[n],
#
#   jd[p, d, n] = (G[p, d] . cdofc[n]) * dmask[p, n],
#   G[p, d]     = [pos3[p] x dirs[p, d], dirs[p, d]]       (translational)
#                 [dirs[p, d], 0]                          (rotational)
#
# exactly (two-body difference included: for any dof the masks select,
# the dof's tree root equals the body's root, so the subtree-com anchor
# is a per-dof constant). The fused kernel takes G (P, ndirs, 6) +
# cdofc (nv, 6) and builds the facet columns in VMEM; the XLA/reference
# path materializes jd with one einsum. dmask entries are in {-1, 0, 1}
# and are host constants, shipped to the kernel via `dmasks` (bytes).
# ---------------------------------------------------------------------------


def materialize_jd(g, cdofc, dmask):
  """jd (..., P, ndirs, nv) from factored G (..., P, ndirs, 6),
  cdofc (..., nv, 6), static dmask (P, nv)."""
  jd = jnp.einsum('...pdj,...nj->...pdn', g, cdofc)
  return jd * jnp.asarray(dmask, dtype=jd.dtype)[:, None, :]


def _decode_dmask(b, p, nv):
  return np.frombuffer(b, dtype=np.float32).reshape(p, nv)


# ---------------------------------------------------------------------------
# Elliptic friction cones (MJCF <option cone="elliptic"/>).
#
# Per condim>1 contact: 6 contact-frame rows (normal, t1, t2, torsion,
# roll1, roll2; padded dims have s=0), jar = J qacc - aref, N = jar[0],
# T = ||jar[1:] * s||. Cost zones (validated vs mj_constraintUpdate,
# tests/test_elliptic.py):
#   satisfied  mu*T <= N : 0
#   bottom     T <= -mu*N: 0.5 * d0 * sum_i s_i^2 jar_i^2
#   middle     otherwise : 0.5 * d0/(1+mu^2) * (mu*T - N)^2
# The middle-zone Hessian keeps the (PSD) norm-curvature term, so Newton
# steps are exact second order.
# ---------------------------------------------------------------------------

_T_EPS = 1e-15


def _cone_parts(jar_c, s, mu):
  """N, T, scaled-square row weights s2row (C,6), zone masks."""
  n = jar_c[..., 0]
  ts = jar_c[..., 1:] * s
  t = jnp.sqrt(jnp.sum(ts * ts, axis=-1))
  sat = mu * t <= n
  bottom = jnp.logical_and(t <= -mu * n, jnp.logical_not(sat))
  middle = jnp.logical_not(jnp.logical_or(sat, bottom))
  s2row = jnp.concatenate([jnp.ones_like(s[..., :1]), s * s], axis=-1)
  return n, t, s2row, bottom, middle


def cone_cost(jar_c, d0, s, mu):
  """Total elliptic-cone cost, summed over contacts. Leading batch axes
  on jar_c broadcast against (C, ...) params (used by the line search)."""
  n, t, s2row, bottom, middle = _cone_parts(jar_c, s, mu)
  quad = 0.5 * d0 * jnp.sum(s2row * jar_c * jar_c, axis=-1)
  z = mu * t - n
  mid = 0.5 * d0 / (1.0 + mu * mu) * z * z
  per = jnp.where(bottom, quad, jnp.where(middle, mid, 0.0))
  return jnp.sum(per, axis=-1)


def cone_grad(jar_c, d0, s, mu):
  """d cost / d jar, (C, 6). Contact force = -cone_grad."""
  n, t, s2row, bottom, middle = _cone_parts(jar_c, s, mu)
  g_bot = d0[..., None] * s2row * jar_c
  z = mu * t - n
  c0 = d0 / (1.0 + mu * mu)
  tsafe = jnp.maximum(t, _T_EPS)
  gz = jnp.concatenate(
      [-jnp.ones_like(jar_c[..., :1]),
       (mu / tsafe)[..., None] * s * s * jar_c[..., 1:]], axis=-1)
  g_mid = (c0 * z)[..., None] * gz
  return jnp.where(bottom[..., None], g_bot,
                   jnp.where(middle[..., None], g_mid, 0.0))


def cone_hess(jar_c, d0, s, mu):
  """d^2 cost / d jar^2, (C, 6, 6). PSD in every zone."""
  n, t, s2row, bottom, middle = _cone_parts(jar_c, s, mu)
  dtype = jar_c.dtype
  eye6 = jnp.eye(6, dtype=dtype)
  h_bot = (d0[..., None] * s2row)[..., None] * eye6
  z = mu * t - n
  c0 = d0 / (1.0 + mu * mu)
  tsafe = jnp.maximum(t, _T_EPS)
  gz = jnp.concatenate(
      [-jnp.ones_like(jar_c[..., :1]),
       (mu / tsafe)[..., None] * s * s * jar_c[..., 1:]], axis=-1)
  # norm curvature over the friction block: (diag(s^2) - w w^T / T^2)/T
  w = jnp.concatenate([jnp.zeros_like(jar_c[..., :1]),
                       s * s * jar_c[..., 1:]], axis=-1)
  diag_f = jnp.concatenate([jnp.zeros_like(s[..., :1]), s * s], axis=-1)
  curv = (diag_f[..., None] * eye6
          - w[..., :, None] * w[..., None, :] / (tsafe * tsafe)[..., None, None])
  h_mid = (c0[..., None, None] * gz[..., :, None] * gz[..., None, :]
           + (c0 * z * mu / tsafe)[..., None, None] * curv)
  zero = jnp.zeros_like(h_bot)
  return jnp.where(bottom[..., None, None], h_bot,
                   jnp.where(middle[..., None, None], h_mid, zero))


# ---------------------------------------------------------------------------
# Pallas kernel: full Newton loop, batch in lanes.
# ---------------------------------------------------------------------------


def _newton_kernel(nv, n, ns, dof, sign, cap, tol, sublanes, condims,
                   dmasks, refs):
  """One batch tile: refs layout (see newton_batched for operand order).

  Two layouts share this body. Lane layout (sublanes=0): per-sample
  scalars are (L,) lane vectors, operands (dims..., L) — compact VMEM
  (matrix dims pack the sublanes) but each VPU op uses 1 of 8 sublanes.
  Tile layout (sublanes=S>0): per-sample scalars are (S, L) tiles,
  operands (1, dims..., S, L) — S=8 fills the whole f32 vreg, ~8x the
  VPU throughput of the lane layout, at 8/S x the VMEM (sublane padding).

  Pyramidal contact groups (condims) arrive as raw point-direction
  Jacobians; the loop-invariant facet expansion (PYRAMID_FACETS) is done
  ONCE here, in VMEM, before the Newton loop — the XLA graph never
  materializes the (B, nrep*P, nv) facet tensors."""
  has_d = n > 0
  has_s = ns > 0
  sq = (lambda r: r[0]) if sublanes else (lambda r: r[...])
  i_ref = 0
  qm = sq(refs[i_ref]); i_ref += 1          # (nv, nv, *tile)
  qs = sq(refs[i_ref]); i_ref += 1          # (nv, *tile)
  if has_d:
    jmat = sq(refs[i_ref]); i_ref += 1      # (nv, n, *tile)  TRANSPOSED
    aref = sq(refs[i_ref]); i_ref += 1      # (n, *tile)
    dvec = sq(refs[i_ref]); i_ref += 1      # (n, *tile)
    eqf = sq(refs[i_ref]); i_ref += 1       # (n, *tile) 0/1 float
  if has_s:
    s_aref = sq(refs[i_ref]); i_ref += 1    # (ns, *tile)
    s_dvec = sq(refs[i_ref]); i_ref += 1    # (ns, *tile)
  cdofc = None
  if condims:
    cdofc = sq(refs[i_ref]); i_ref += 1     # (nv, 6, *tile)
  gin = []
  for _ in condims:
    g_g = sq(refs[i_ref]); i_ref += 1       # (ndirs, 6, P, *tile) TRANSP.
    aref_g = sq(refs[i_ref]); i_ref += 1    # (nrep, P, *tile)
    dvec_g = sq(refs[i_ref]); i_ref += 1    # (P, *tile)
    mu_g = sq(refs[i_ref]); i_ref += 1      # (3, P, *tile)
    gin.append((g_g, aref_g, dvec_g, mu_g))
  qacc_out = refs[i_ref]; i_ref += 1
  jar_out = None
  if has_d:
    jar_out = refs[i_ref]; i_ref += 1
  jars_out = None
  if has_s:
    jars_out = refs[i_ref]; i_ref += 1
  jarg_out = refs[i_ref:]

  dtype = qm.dtype
  tile = qm.shape[2:]                        # (L,) or (S, L)
  sgn = np.asarray(sign, dtype=dtype)  # kernel dtype: a float64 constant
                                       # would promote the whole carry

  # Mosaic on v5e rejects reductions over dims whose layout carries a
  # non-zero (sublane) offset — which is exactly what slicing a middle
  # dim of a 3D operand produces.  Two rules keep every reduction legal:
  # (1) dof-indexed operands (jmat, jd) arrive TRANSPOSED so per-column
  # slices are leading/vreg-dim slices (offset 0), and (2) multi-axis
  # reductions are decomposed into sequential single-axis reductions
  # (rsum2), whose leading-dim reduce never sees a minor-dim offset.
  def rsum2(x):                        # (a, b, *t) -> (*t)
    return jnp.sum(jnp.sum(x, axis=0), axis=0)

  # loop-invariant facet expansion from the FACTORED form: per group,
  # fcol[k] stacks the k-th Jacobian column of every facet row,
  # (nrep, P, *tile). Columns are built as (GF[f] . cdofc[k]) * dmask
  # where GF[f] = G[normal] + sign*mu*G[dir] is the facet-combined
  # 6-vector factor — the (P, ndirs, nv) jd tensor never exists, in
  # VMEM or HBM. dmask columns are host constants; all-zero columns
  # (dofs no contact in the group touches) skip the arithmetic.
  fcols = []
  for gi, ((g_g, _, _, mu_g), cdim) in enumerate(zip(gin, condims)):
    facets = PYRAMID_FACETS[cdim]
    p_g = g_g.shape[2]
    dm = _decode_dmask(dmasks[gi], p_g, nv)
    gf = []                            # per facet: list of 6 (P, *t)
    for (di, col, sf) in facets:
      if sf:
        gf.append([g_g[0, jj] + sf * mu_g[col] * g_g[di, jj]
                   for jj in range(6)])
      else:
        gf.append([g_g[0, jj] for jj in range(6)])
    cols = []
    zcol = None
    ztile = jnp.zeros(tile, dtype=dtype)
    for k in range(nv):
      mcol = dm[:, k]
      if not np.any(mcol):
        if zcol is None:
          zcol = jnp.zeros((len(facets), p_g) + tile, dtype=dtype)
        cols.append(zcol)
        continue
      # the mask vector is built from scalar splat constants — Pallas
      # rejects closure-captured (non-splat) array constants
      mc = jnp.stack([jnp.full(tile, float(v), dtype=dtype) if v else
                      ztile for v in mcol])
      percol = [mc * sum(gf[f][jj] * cdofc[k, jj] for jj in range(6))
                for f in range(len(facets))]
      cols.append(jnp.stack(percol))
    fcols.append(cols)

  def matvec_m(x):                     # (nv, *t) -> (nv, *t); M symmetric
    return jnp.sum(qm * x[:, None], axis=0)

  def matvec_j(x):                     # (nv, *t) -> (n, *t)
    return jnp.sum(jmat * x[:, None], axis=0)

  def jt_vec(y):                       # (n, *t) -> (nv, *t): J^T y
    return jnp.sum(jmat * y[None], axis=1)

  def matvec_g(gi, x):                 # (nv, *t) -> (nrep, P, *t)
    return sum(fcols[gi][k] * x[k][None, None] for k in range(nv))

  def jt_g(gi, y):                     # (nrep, P, *t) -> (nv, *t)
    return jnp.stack([rsum2(fcols[gi][i] * y) for i in range(nv)])

  def gather_dof(x):                   # (nv, *t) -> (ns, *t): sign * x[dof]
    return jnp.stack([x[dof[r], :] * sgn[r] for r in range(ns)])

  def scatter_dof(y):                  # (ns, *t) -> (nv, *t): add sign*y at dof
    out = [jnp.zeros(tile, dtype=dtype) for _ in range(nv)]
    for r in range(ns):
      out[dof[r]] = out[dof[r]] + sgn[r] * y[r, :]
    return jnp.stack(out)

  def chol_solve(h, g):
    """h: list-of-lists of (*t) (lower triangle filled), g: (nv, *t)."""
    eps = 1e-30
    col = [[None] * nv for _ in range(nv)]
    inv_diag = [None] * nv
    for j in range(nv):
      s = h[j][j]
      for k in range(j):
        s = s - col[j][k] * col[j][k]
      ljj = jnp.sqrt(jnp.maximum(s, eps))
      col[j][j] = ljj
      inv = 1.0 / ljj
      inv_diag[j] = inv
      for i in range(j + 1, nv):
        s = h[i][j]
        for k in range(j):
          s = s - col[i][k] * col[j][k]
        col[i][j] = s * inv
    y = [None] * nv
    for i in range(nv):
      s = g[i, :]
      for k in range(i):
        s = s - col[i][k] * y[k]
      y[i] = s * inv_diag[i]
    x = [None] * nv
    for i in reversed(range(nv)):
      s = y[i]
      for k in range(i + 1, nv):
        s = s - col[k][i] * x[k]
      x[i] = s * inv_diag[i]
    return jnp.stack(x)

  # zero-size blocks are omitted from the carry entirely (Mosaic does not
  # like 0-sized values); pack/unpack keeps the body readable
  def pack(qacc, jar_d, jar_s, jar_gs, it, done, prev_exact):
    out = [qacc]
    if has_d:
      out.append(jar_d)
    if has_s:
      out.append(jar_s)
    out += list(jar_gs)
    return tuple(out) + (it, done, prev_exact)

  def unpack(carry):
    k = 1
    jar_d = jar_s = None
    if has_d:
      jar_d = carry[k]
      k += 1
    if has_s:
      jar_s = carry[k]
      k += 1
    jar_gs = list(carry[k:k + len(condims)])
    k += len(condims)
    return (carry[0], jar_d, jar_s, jar_gs, carry[k], carry[k + 1],
            carry[k + 2])

  jar_d0 = matvec_j(qs) - aref if has_d else None
  jar_s0 = gather_dof(qs) - s_aref if has_s else None
  jar_g0 = [matvec_g(gi, qs) - gin[gi][1] for gi in range(len(condims))]
  # All per-lane masks are 0/1 floats: Mosaic on some chip generations
  # (v5e) cannot lower stored/carried i1 vectors (i8->i1 trunci), so the
  # only boolean values in this kernel are fresh comparisons feeding a
  # select; activity/done/exact state is float arithmetic.
  zeros_l = jnp.zeros(tile, dtype=dtype)
  one = jnp.ones((), dtype=dtype)

  def cond(carry):
    _, _, _, _, it, done, _ = unpack(carry)
    return jnp.logical_and(it < cap, jnp.min(done) < 0.5)

  def body(carry):
    qacc, jar_d, jar_s, jar_gs, it, done, prev_exact = unpack(carry)
    e = qacc - qs
    me = matvec_m(e)
    g = me
    h = [[qm[i, j, :] + (_DAMP if i == j else 0.0) for j in range(nv)]
         for i in range(nv)]
    if has_d:
      active_d = jnp.where(jar_d < 0, one, eqf)   # 0/1 float
      w_d = active_d * dvec
      g = g + jt_vec(w_d * jar_d)
      for i in range(nv):
        wji = w_d * jmat[i]                       # (n, *t), offset-0 rows
        for j in range(i + 1):
          hij = jnp.sum(wji * jmat[j], axis=0)
          h[i][j] = h[i][j] + hij
          if i != j:
            h[j][i] = h[j][i] + hij
    if has_s:
      active_s = jnp.where(jar_s < 0, one, 0.0)   # 0/1 float
      w_s = active_s * s_dvec
      g = g + scatter_dof(w_s * jar_s)
      for r in range(ns):
        h[dof[r]][dof[r]] = h[dof[r]][dof[r]] + w_s[r, :]
    active_gs = []
    w_gs = []
    for gi in range(len(condims)):
      active_g = jnp.where(jar_gs[gi] < 0, one, 0.0)  # 0/1 float
      w_g = active_g * gin[gi][2][None]
      active_gs.append(active_g)
      w_gs.append(w_g)
      g = g + jt_g(gi, w_g * jar_gs[gi])
      fc = fcols[gi]
      for i in range(nv):
        wfi = w_g * fc[i]                         # (nrep, P, *t)
        for j in range(i + 1):
          hij = rsum2(wfi * fc[j])
          h[i][j] = h[i][j] + hij
          if i != j:
            h[j][i] = h[j][i] + hij

    step = chol_solve(h, g)

    js_d = matvec_j(step) if has_d else None
    js_s = gather_dof(step) if has_s else None
    js_gs = [matvec_g(gi, step) for gi in range(len(condims))]
    sme = jnp.sum(step * me, axis=0)
    sms = jnp.sum(step * matvec_m(step), axis=0)
    eme = jnp.sum(e * me, axis=0)

    best_cost = None
    best_alpha = None
    best_is_full = None
    for a in _ALPHAS:
      c = 0.5 * eme - a * sme + 0.5 * a * a * sms
      if has_d:
        jc = jar_d - a * js_d
        pc = jnp.where(jc < 0, one, eqf) * dvec
        c = c + 0.5 * jnp.sum(pc * jc * jc, axis=0)
      if has_s:
        jc = jar_s - a * js_s
        pc = jnp.where(jc < 0, s_dvec, 0.0)
        c = c + 0.5 * jnp.sum(pc * jc * jc, axis=0)
      for gi in range(len(condims)):
        jc = jar_gs[gi] - a * js_gs[gi]
        pc = jnp.where(jc < 0, gin[gi][2][None], 0.0)
        c = c + 0.5 * rsum2(pc * jc * jc)
      if best_cost is None:
        best_cost, best_alpha = c, jnp.full(tile, a, dtype=dtype)
        best_is_full = zeros_l
      else:
        better = c < best_cost
        best_cost = jnp.where(better, c, best_cost)
        best_alpha = jnp.where(better, a, best_alpha)
        best_is_full = jnp.where(better, float(a == 1.0), best_is_full)

    alpha = best_alpha
    qacc_new = qacc - alpha[None, :] * step
    jar_d_new = jar_d - alpha[None, :] * js_d if has_d else None
    jar_s_new = jar_s - alpha[None, :] * js_s if has_s else None
    jar_gs_new = [jar_gs[gi] - alpha[None, None] * js_gs[gi]
                  for gi in range(len(condims))]
    # active-set stability: count sign flips as float sums (no bool
    # vectors); stable lanes have zero flips
    flips = zeros_l
    if has_d:
      new_act_d = jnp.where(jar_d_new < 0, one, eqf)
      flips = flips + jnp.sum(jnp.abs(new_act_d - active_d), axis=0)
    if has_s:
      new_act_s = jnp.where(jar_s_new < 0, one, 0.0)
      flips = flips + jnp.sum(jnp.abs(new_act_s - active_s), axis=0)
    for gi in range(len(condims)):
      new_act_g = jnp.where(jar_gs_new[gi] < 0, one, 0.0)
      flips = flips + rsum2(jnp.abs(new_act_g - active_gs[gi]))
    exact = jnp.where(flips > 0, 0.0, best_is_full)
    step_norm = jnp.sqrt(jnp.sum(step * step, axis=0))
    qn = jnp.sqrt(jnp.sum(qacc_new * qacc_new, axis=0))
    small = jnp.where(step_norm <= tol * (1.0 + qn), one, 0.0)
    newly_done = jnp.maximum(exact * prev_exact, small)
    # freeze lanes that were already done (matches vmapped while_loop
    # semantics: body updates are masked per sample)
    keep = done[None, :] > 0.5
    keep2 = done[None, None] > 0.5
    qacc = jnp.where(keep, qacc, qacc_new)
    jar_d = jnp.where(keep, jar_d, jar_d_new) if has_d else None
    jar_s = jnp.where(keep, jar_s, jar_s_new) if has_s else None
    jar_gs = [jnp.where(keep2, jar_gs[gi], jar_gs_new[gi])
              for gi in range(len(condims))]
    prev_exact = jnp.where(done > 0.5, prev_exact, exact)
    done = jnp.maximum(done, newly_done)
    return pack(qacc, jar_d, jar_s, jar_gs, it + 1, done, prev_exact)

  init = pack(qs, jar_d0, jar_s0, jar_g0, jnp.asarray(0, dtype=jnp.int32),
              zeros_l, zeros_l)
  qacc, jar_d, jar_s, jar_gs, _, _, _ = unpack(
      jax.lax.while_loop(cond, body, init))
  if sublanes:
    qacc_out[0] = qacc
    if has_d:
      jar_out[0] = jar_d
    if has_s:
      jars_out[0] = jar_s
    for gi in range(len(condims)):
      jarg_out[gi][0] = jar_gs[gi]
  else:
    qacc_out[...] = qacc
    if has_d:
      jar_out[...] = jar_d
    if has_s:
      jars_out[...] = jar_s
    for gi in range(len(condims)):
      jarg_out[gi][...] = jar_gs[gi]


@functools.lru_cache(maxsize=None)
def kernel_compile_ok(nv, n, ns, gdims, dof, sign, cap, tol, condims,
                      sublanes, dmasks=()) -> bool:
  """Compile-smoke probe: build the kernel for this static config on a
  minimal batch and report whether Mosaic accepts it.

  Mosaic compile failures surface when the *outer* jit compiles — far too
  late to reroute. This probe runs eagerly at trace time (memoized per
  static config) so dispatch (_newton_vmap) can fall back to the XLA
  solver path instead of shipping a plan that crashes at compile time.
  The reference's physics never fails to run (mjpc/trajectory.cc:158);
  neither may ours."""
  if not _on_tpu():
    return False
  import warnings
  try:
    # AOT lower+compile (never executed): .lower() opens its own trace, so
    # this is safe to run while the caller is itself being traced.
    # (ensure_compile_time_eval is NOT safe here: it makes the kernel's
    # internal jnp constants eager, which Pallas rejects as captures.)
    tile_b = max(1, sublanes) * LANES
    f32 = jnp.float32
    sds = lambda *s: jax.ShapeDtypeStruct((tile_b,) + s, f32)  # noqa: E731
    gargs = [sds(nv, 6)] if condims else []
    for (p, ndirs, nrep) in gdims:
      gargs += [sds(p, ndirs, 6), sds(nrep, p), sds(p), sds(3, p)]
    newton_batched.lower(
        sds(nv, nv), sds(nv), sds(n, nv), sds(n), sds(n), sds(n),
        sds(ns), sds(ns), *gargs, dof=dof, sign=sign, cap=cap, tol=tol,
        condims=condims, sublanes=sublanes, dmasks=dmasks).compile()
    return True
  except Exception as e:  # Mosaic/XLA compile errors: fall back, loudly
    warnings.warn(
        'fused Newton kernel failed to compile on this backend '
        f'(nv={nv}, n={n}, ns={ns}, groups={gdims}, sublanes={sublanes}); '
        f'using the XLA solver path. Error: {str(e)[:300]}')
    return False


def _lane_pad(x, pad, fill=0.0):
  if pad == 0:
    return x
  widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
  return jnp.pad(x, widths, constant_values=fill)


def pick_sublanes(bsz, nv, n, ns, groups=()) -> int:
  """Tile-layout sublane count S for newton_batched (0 = lane layout).

  The tile layout's VMEM blocks pad the sublane dim to 8 whatever S is,
  so feasibility is judged at S=8; models whose operands would blow the
  VMEM budget (Shadow-class row counts) keep the lane layout, which
  packs matrix dims into sublanes instead. MJPC_TPU_NEWTON_SUBLANES
  overrides (read at trace time — set it before the first jit).
  groups: per point group, (P, ndirs, nrep)."""
  import os
  env = os.environ.get('MJPC_TPU_NEWTON_SUBLANES')
  if env is not None:
    return int(env)
  # leading-dim element counts: operands + outputs + ~2x for loop
  # carries and temporaries
  lead = (nv * nv + nv + n * nv + 3 * n + 2 * ns
          + nv + n + ns) + 2 * (nv + n + ns)
  if groups:
    lead += nv * 6                      # shared cdofc operand
  for (p, ndirs, nrep) in groups:
    # factored G + aref/dvec/mu + jar carries + the in-VMEM facet
    # columns and facet-combined factors GF
    lead += p * ndirs * 6 + (nrep + 4) * p + 3 * nrep * p \
        + nv * nrep * p + 6 * nrep * p
  if lead * SUBLANES * LANES * 4 > _VMEM_BUDGET:
    return 0
  return int(max(1, min(SUBLANES, bsz // LANES)))


@functools.partial(
    jax.jit,
    static_argnames=('dof', 'sign', 'cap', 'tol', 'interpret', 'sublanes',
                     'condims', 'dmasks'))
def newton_batched(qm, qs, j, aref, dvec, eqf, s_aref, s_dvec, *gargs,
                   dof, sign, cap, tol, interpret=False, sublanes=None,
                   condims=(), dmasks=()):
  """Batch-first Newton solve via the fused kernel.

  qm (B, nv, nv), qs (B, nv), j (B, n, nv), aref/dvec/eqf (B, n),
  s_aref/s_dvec (B, ns); when point groups are present, one shared
  cdofc (B, nv, 6) operand followed by 4 operands per group in the
  FACTORED form (g (B, P, ndirs, 6), aref (B, nrep, P), dvec (B, P),
  mu (B, 3, P)) with the static ancestor-mask bytes in `dmasks` ->
  (qacc (B, nv), jar_d (B, n), jar_s (B, ns), *jar_g (B, nrep, P)).
  Zero-size n / ns are legal and skip those operands entirely.
  sublanes: batch-tile sublane count S (samples per program = S * 128);
  0 = lane layout, None = auto (pick_sublanes).
  """
  bsz, nv = qs.shape
  n = j.shape[1]
  ns = s_aref.shape[1]
  has_d = n > 0
  has_s = ns > 0
  cdofc = gargs[0] if condims else None
  gargs = gargs[1:] if condims else gargs
  groups = [tuple(gargs[4 * i:4 * i + 4]) for i in range(len(condims))]
  gdims = [(gr[0].shape[1], gr[0].shape[2], gr[1].shape[1])
           for gr in groups]  # (P, ndirs, nrep)
  if sublanes is None:
    sublanes = pick_sublanes(bsz, nv, n, ns, tuple(gdims))
  s = max(1, sublanes)
  tile_b = s * LANES
  pad = (-bsz) % tile_b
  if pad:
    # identity systems: qm=I, everything else zero -> step 0, done fast
    eye = jnp.broadcast_to(jnp.eye(nv, dtype=qm.dtype), (pad, nv, nv))
    qm = jnp.concatenate([qm, eye], axis=0)
    qs = _lane_pad(qs, pad)
    j, aref, dvec, eqf = (_lane_pad(a, pad) for a in (j, aref, dvec, eqf))
    s_aref, s_dvec = _lane_pad(s_aref, pad), _lane_pad(s_dvec, pad)
    if cdofc is not None:
      cdofc = _lane_pad(cdofc, pad)
    groups = [tuple(_lane_pad(a, pad) for a in gr) for gr in groups]
  bp = qs.shape[0]
  g = bp // tile_b

  if sublanes:
    # tile layout: (B, *dims) -> (G, *dims, S, L), grid over G
    def prep(x):
      dims = x.shape[1:]
      x = x.reshape((g, s, LANES) + dims)
      perm = (0,) + tuple(range(3, 3 + len(dims))) + (1, 2)
      return jnp.transpose(x, perm)

    def spec(*dims):
      block = (1,) + dims + (s, LANES)
      nzero = len(dims) + 2
      return pl.BlockSpec(block, lambda i, _n=nzero: (i,) + (0,) * _n)

    def out_sds(*dims):
      return jax.ShapeDtypeStruct((g,) + dims + (s, LANES), qm.dtype)

    def post(x):
      nd = x.ndim
      perm = (0, nd - 2, nd - 1) + tuple(range(1, nd - 2))
      x = jnp.transpose(x, perm)
      return x.reshape((bp,) + x.shape[3:])[:bsz]
  else:
    # lane layout: (B, *dims) -> (*dims, B), grid over lane tiles of B
    def prep(x):
      nd = x.ndim
      return jnp.transpose(x, tuple(range(1, nd)) + (0,))

    def spec(*dims):
      block = dims + (LANES,)
      nzero = len(dims)
      return pl.BlockSpec(block, lambda i, _n=nzero: (0,) * _n + (i,))

    def out_sds(*dims):
      return jax.ShapeDtypeStruct(dims + (bp,), qm.dtype)

    def post(x):
      nd = x.ndim
      return jnp.transpose(x, (nd - 1,) + tuple(range(nd - 1)))[:bsz]

  operands = [prep(qm), prep(qs)]
  in_specs = [spec(nv, nv), spec(nv)]
  if has_d:
    # J transposed to (nv, n): per-dof columns become leading/vreg-dim
    # slices inside the kernel (zero sublane offset — see _newton_kernel).
    # eqf re-binarized at the trace-time boundary so a non-0/1 float from
    # a future caller fails safe instead of weighting penalties.
    operands += [prep(jnp.swapaxes(j, 1, 2)), prep(aref), prep(dvec),
                 prep((eqf > 0.5).astype(qm.dtype))]
    in_specs += [spec(nv, n), spec(n), spec(n), spec(n)]
  if has_s:
    operands += [prep(s_aref), prep(s_dvec)]
    in_specs += [spec(ns), spec(ns)]
  if condims:
    operands += [prep(cdofc.astype(qm.dtype))]
    in_specs += [spec(nv, 6)]
  for gr, (p, ndirs, nrep) in zip(groups, gdims):
    # G transposed to (ndirs, 6, P) so the kernel's per-direction /
    # per-component slices are vreg-dim slices (zero sublane offset)
    operands += [prep(jnp.transpose(gr[0], (0, 2, 3, 1))), prep(gr[1]),
                 prep(gr[2]), prep(gr[3].astype(qm.dtype))]
    in_specs += [spec(ndirs, 6, p), spec(nrep, p), spec(p), spec(3, p)]

  out_shape = [out_sds(nv)]
  out_specs = [spec(nv)]
  if has_d:
    out_shape.append(out_sds(n))
    out_specs.append(spec(n))
  if has_s:
    out_shape.append(out_sds(ns))
    out_specs.append(spec(ns))
  for (p, ndirs, nrep) in gdims:
    out_shape.append(out_sds(nrep, p))
    out_specs.append(spec(nrep, p))

  kernel = functools.partial(_newton_kernel, nv, n, ns, dof, sign, cap,
                             tol, sublanes, condims, dmasks)
  outs = pl.pallas_call(
      lambda *refs: kernel(refs),
      out_shape=out_shape,
      grid=(g if sublanes else bp // LANES,),
      in_specs=in_specs,
      out_specs=out_specs,
      interpret=interpret,
      compiler_params=None if interpret else pltpu.CompilerParams(
          dimension_semantics=('parallel',),
          vmem_limit_bytes=_VMEM_LIMIT),
  )(*operands)

  qacc = post(outs[0])
  k = 1
  if has_d:
    jar_d = post(outs[k])
    k += 1
  else:
    jar_d = jnp.zeros((bsz, 0), dtype=qm.dtype)
  if has_s:
    jar_s = post(outs[k])
    k += 1
  else:
    jar_s = jnp.zeros((bsz, 0), dtype=qm.dtype)
  jar_gs = tuple(post(o) for o in outs[k:])
  return (qacc, jar_d, jar_s) + jar_gs


# ---------------------------------------------------------------------------
# Reference per-sample path (the XLA implementation the kernel replaces);
# also the CPU / unbatched / f64 fallback.
# ---------------------------------------------------------------------------


def _huber_cost(jc, w, loss):
  """Frictionloss row cost: 0.5 w jar^2 while |w jar| <= loss, linear
  loss|jar| - loss^2/(2w) beyond (two-sided; always active)."""
  quad = jnp.abs(w * jc) <= loss
  lin = loss * jnp.abs(jc) - 0.5 * loss * loss / jnp.maximum(w, 1e-30)
  return jnp.where(quad, 0.5 * w * jc * jc, lin)


def _newton_reference(qm, qs, j, aref, dvec, eqf, s_aref, s_dvec, c_j,
                      c_aref, c_d0, c_s, c_mu,
                      f_aref=None, f_dvec=None, f_loss=None, *,
                      dof, sign, cap, tol, fdof=(), condims=(),
                      groups=()):
  """Single-sample Newton solve (jar-carrying, exact line search).

  Point groups (see PYRAMID_FACETS) are facet-expanded into the dense
  block here; their jars are split back out and returned per group as
  (nrep, P) arrays after the dense/scalar/cone/friction jars."""
  from mujoco_mpc_tpu.ops import pallas_linalg
  from mujoco_mpc_tpu.utils import tpu_math as _tm

  nv = qs.shape[0]
  n_dense = j.shape[0]
  gsizes = []
  for (gjd, garef, gdvec, gmu), cdim in zip(groups, condims):
    ej, ea, ed = expand_group(gjd, garef, gdvec, gmu, cdim)
    gsizes.append((garef.shape[0], gjd.shape[0]))    # (nrep, P)
    j = jnp.concatenate([j, ej])
    aref = jnp.concatenate([aref, ea])
    dvec = jnp.concatenate([dvec, ed])
    eqf = jnp.concatenate(
        [eqf, jnp.zeros(ea.shape[0], dtype=eqf.dtype)])
  n = j.shape[0]
  ns = s_aref.shape[0]
  nc = c_d0.shape[0]
  if f_aref is None:
    f_aref = jnp.zeros(0, dtype=qs.dtype)
    f_dvec = f_aref
    f_loss = f_aref
  nf = f_aref.shape[0]
  has_d = n > 0
  has_s = ns > 0
  has_c = nc > 0
  has_f = nf > 0
  dtype = qs.dtype
  eq = eqf > 0.5
  sgn = jnp.asarray(np.asarray(sign), dtype=dtype)
  dof_np = np.asarray(dof, dtype=np.int32)
  fdof_np = np.asarray(fdof, dtype=np.int32)

  def cond(carry):
    return jnp.logical_and(carry[5] < cap, jnp.logical_not(carry[6]))

  def body(carry):
    qacc, jar_d, jar_s, jar_c, jar_f, it, _, prev_exact = carry
    e = qacc - qs
    me = qm @ e
    g = me
    h = qm + _DAMP * jnp.eye(nv, dtype=qm.dtype)
    if has_d:
      active_d = jnp.logical_or(jar_d < 0, eq)
      w_d = jnp.where(active_d, dvec, 0.0)
      g = g + j.T @ (w_d * jar_d)
      h = h + (j.T * w_d) @ j
    if has_s:
      active_s = jar_s < 0
      w_s = jnp.where(active_s, s_dvec, 0.0)
      g = g.at[dof_np].add(sgn * (w_s * jar_s))
      h = h.at[dof_np, dof_np].add(w_s)
    if has_c:
      _, _, _, bot_c, mid_c = _cone_parts(jar_c, c_s, c_mu)
      g = g + jnp.einsum('cdn,cd->n', c_j,
                         cone_grad(jar_c, c_d0, c_s, c_mu))
      h = h + jnp.einsum('cdn,cde,cem->nm', c_j,
                         cone_hess(jar_c, c_d0, c_s, c_mu), c_j)
    if has_f:
      quad_f = jnp.abs(f_dvec * jar_f) <= f_loss
      g = g.at[fdof_np].add(
          jnp.clip(f_dvec * jar_f, -f_loss, f_loss))
      h = h.at[fdof_np, fdof_np].add(jnp.where(quad_f, f_dvec, 0.0))
    step = jax.lax.custom_linear_solve(
        lambda v: h @ v, g,
        solve=lambda _mv, rhs: pallas_linalg.solve_spd(h, rhs),
        symmetric=True)
    js_d = j @ step if has_d else jar_d
    js_s = sgn * step[dof_np] if has_s else jar_s
    js_c = jnp.einsum('cdn,n->cd', c_j, step) if has_c else jar_c
    js_f = step[fdof_np] if has_f else jar_f
    sme = step @ me
    sms = step @ (qm @ step)
    eme = e @ me
    alphas = jnp.asarray(_ALPHAS, dtype=dtype)
    pen = 0.0
    if has_d:
      jc = jar_d[None, :] - alphas[:, None] * js_d[None, :]
      pc = jnp.where(jnp.logical_or(jc < 0, eq[None, :]), dvec[None, :],
                     0.0)
      pen = pen + 0.5 * jnp.sum(pc * jc * jc, axis=-1)
    if has_s:
      jc = jar_s[None, :] - alphas[:, None] * js_s[None, :]
      pc = jnp.where(jc < 0, s_dvec[None, :], 0.0)
      pen = pen + 0.5 * jnp.sum(pc * jc * jc, axis=-1)
    if has_c:
      jc = jar_c[None] - alphas[:, None, None] * js_c[None]
      pen = pen + cone_cost(jc, c_d0, c_s, c_mu)
    if has_f:
      jc = jar_f[None, :] - alphas[:, None] * js_f[None, :]
      pen = pen + jnp.sum(_huber_cost(jc, f_dvec[None, :],
                                      f_loss[None, :]), axis=-1)
    costs = 0.5 * eme - alphas * sme + 0.5 * alphas * alphas * sms + pen
    best = jnp.argmin(costs)
    alpha = alphas[best]
    qacc_new = qacc - alpha * step
    jar_d_new = jar_d - alpha * js_d if has_d else jar_d
    jar_s_new = jar_s - alpha * js_s if has_s else jar_s
    jar_c_new = jar_c - alpha * js_c if has_c else jar_c
    jar_f_new = jar_f - alpha * js_f if has_f else jar_f
    stable = jnp.asarray(True)
    if has_d:
      stable = jnp.logical_and(
          stable, jnp.all(jnp.logical_or(jar_d_new < 0, eq) == active_d))
    if has_s:
      stable = jnp.logical_and(stable,
                               jnp.all((jar_s_new < 0) == active_s))
    if has_c:
      _, _, _, bot_new, mid_new = _cone_parts(jar_c_new, c_s, c_mu)
      stable = jnp.logical_and(
          stable, jnp.logical_and(jnp.all(bot_new == bot_c),
                                  jnp.all(mid_new == mid_c)))
      # a zone-stable full step is only exact for piecewise-QUADRATIC
      # cost; the cone middle zone is non-quadratic, so Newton must run
      # to the step-size tolerance while any contact sits there
      stable = jnp.logical_and(
          stable, jnp.logical_not(jnp.any(
              jnp.logical_and(mid_new, c_d0 > 0))))
    if has_f:
      # Huber zones (-1: clamped low, 0: quadratic, +1: clamped high) —
      # piecewise quadratic, so the exact-after-stable exit still holds
      zone = lambda jf: jnp.sign(jnp.trunc(  # noqa: E731
          f_dvec * jf / jnp.maximum(f_loss, 1e-30)))
      stable = jnp.logical_and(stable,
                               jnp.all(zone(jar_f_new) == zone(jar_f)))
    exact = jnp.logical_and(best == 1, stable)
    small = (jnp.linalg.norm(step)
             <= tol * (1.0 + jnp.linalg.norm(qacc_new)))
    done = jnp.logical_or(jnp.logical_and(exact, prev_exact), small)
    return (qacc_new, jar_d_new, jar_s_new, jar_c_new, jar_f_new, it + 1,
            done, exact)

  jar_d0 = j @ qs - aref if has_d else jnp.zeros(0, dtype=dtype)
  jar_s0 = (sgn * qs[dof_np] - s_aref if has_s
            else jnp.zeros(0, dtype=dtype))
  jar_c0 = (jnp.einsum('cdn,n->cd', c_j, qs) - c_aref if has_c
            else jnp.zeros((0, 6), dtype=dtype))
  jar_f0 = (qs[fdof_np] - f_aref if has_f
            else jnp.zeros(0, dtype=dtype))
  jar_d0 = _tm.match_vma(jar_d0, qs)
  jar_s0 = _tm.match_vma(jar_s0, qs)
  jar_c0 = _tm.match_vma(jar_c0, qs)
  jar_f0 = _tm.match_vma(jar_f0, qs)
  false0 = _tm.match_vma(jnp.asarray(False), qs)
  init = (qs, jar_d0, jar_s0, jar_c0, jar_f0,
          jnp.asarray(0, dtype=jnp.int32), false0, false0)
  qacc, jar_d, jar_s, jar_c, jar_f, _, _, _ = jax.lax.while_loop(
      cond, body, init)
  jar_groups = []
  off = n_dense
  for (nrep, p) in gsizes:
    jar_groups.append(jar_d[off:off + nrep * p].reshape(nrep, p))
    off += nrep * p
  return (qacc, jar_d[:n_dense], jar_s, jar_c, jar_f) + tuple(jar_groups)


# ---------------------------------------------------------------------------
# Dispatch seam: custom_vmap routes batched TPU calls to the kernel;
# custom_jvp supplies the implicit-function tangent.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def make_newton(dof, sign, cap, tol, fdof=(), condims=(), dmasks=()):
  """Newton solve specialized to static (dof, sign, cap, tol, fdof,
  condims, dmasks).

  Returns fn(qm, qs, j, aref, dvec, eqf, s_aref, s_dvec, c_j, c_aref,
  c_d0, c_s, c_mu, f_aref, f_dvec, f_loss[, cdofc], *group_args) ->
  (qacc, jar_d, jar_s, jar_c, jar_f, *jar_groups), per-sample
  signature; vmap dispatches the fused batch-tiled kernel on TPU,
  jacfwd/jvp uses the frozen-active-set implicit tangent. When
  `condims` is non-empty, one shared cdofc (nv, 6) operand follows the
  16 base operands, then 4 FACTORED point-group operands per condim
  (g (P, ndirs, 6), aref (nrep, P), dvec (P,), mu (3, P)); `dmasks`
  carries the matching static ancestor masks as float32 bytes (see
  materialize_jd). Each group yields one (nrep, P) jar output; the
  facet expansion (PYRAMID_FACETS) happens inside the solve.
  """
  ngroups = len(condims)
  goff = 17 if ngroups else 16

  def _split(args):
    cdofc = args[16] if ngroups else None
    gargs = [tuple(args[goff + 4 * i:goff + 4 * i + 4])
             for i in range(ngroups)]
    return args[:16], cdofc, gargs

  def _jd_groups(cdofc, gargs):
    """Materialize jd-form groups for the XLA/reference path."""
    out = []
    for gi, (g, garef, gdvec, gmu) in enumerate(gargs):
      dm = _decode_dmask(dmasks[gi], g.shape[-3], cdofc.shape[-2])
      out.append((materialize_jd(g, cdofc, dm), garef, gdvec, gmu))
    return tuple(out)

  @jax.custom_batching.custom_vmap
  def newton_impl(*args):
    base, cdofc, gargs = _split(args)
    return _newton_reference(*base, dof=dof, sign=sign, cap=cap, tol=tol,
                             fdof=fdof, condims=condims,
                             groups=_jd_groups(cdofc, gargs))

  @newton_impl.def_vmap
  def _newton_vmap(axis_size, in_batched, *args):
    # unbatched operands (broadcast constants, e.g. an absent dense block
    # or a shared mass matrix) are materialized so the kernel still fires
    args = tuple(
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched))
    base, cdofc, gargs = _split(args)
    qs_f = base[1]
    nv = qs_f.shape[-1]
    # the fused kernel handles pyramidal + limit + point-group rows;
    # elliptic-cone / frictionloss models take the vmapped XLA path
    import os
    usable = (qs_f.ndim == 2 and qs_f.shape[0] >= MIN_BATCH
              and nv <= MAX_NV and qs_f.dtype == jnp.float32
              and base[10].shape[-1] == 0 and len(fdof) == 0
              and os.environ.get('MJPC_TPU_FUSED_NEWTON', '1') != '0'
              and _on_tpu())
    if usable:
      # resolve the sublane choice HERE (env read at trace time):
      # newton_batched is itself jitted and its cache keys on the static
      # sublanes value, so passing None could reuse a stale env decision
      gdims = tuple((gr[0].shape[1], gr[0].shape[2], gr[1].shape[1])
                    for gr in gargs)
      sub = pick_sublanes(qs_f.shape[0], nv, base[2].shape[-2],
                          base[6].shape[-1], gdims)
      usable = kernel_compile_ok(nv, base[2].shape[-2], base[6].shape[-1],
                                 gdims, dof, sign, cap, tol, condims, sub,
                                 dmasks)
    if usable:
      out = newton_batched(*base[:8], *args[16:], dof=dof, sign=sign,
                           cap=cap, tol=tol, condims=condims,
                           sublanes=sub, dmasks=dmasks)
      out = (out[:3]
             + (jnp.zeros((axis_size, 0, 6), dtype=qs_f.dtype),
                jnp.zeros((axis_size, 0), dtype=qs_f.dtype))
             + out[3:])
    else:
      ref = functools.partial(_newton_reference, dof=dof, sign=sign,
                              cap=cap, tol=tol, fdof=fdof,
                              condims=condims)
      out = jax.vmap(lambda *a: ref(
          *a[:16], groups=_jd_groups(*_split(a)[1:])))(*args)
    return out, (True,) * (5 + ngroups)

  @jax.custom_jvp
  def newton(*args):
    return newton_impl(*args)

  @newton.defjvp
  def _newton_jvp(primals, tangents):
    """Implicit-function tangent with the converged active set frozen.

    KKT residual g(qacc; th) = qm (qacc-qs) + J^T (w * (J qacc - aref))
    + scatter(sign * w_s * jar_s) = 0, so dqacc = -H^{-1} (dg/dth dth)
    with H the Newton Hessian at the solution. This is the exact
    derivative of the contact solution almost everywhere (active set
    locally constant), the quantity the reference approximates by finite
    differences (mjd_transitionFD, model_derivatives.cc:45-165). Point
    groups are facet-expanded (a differentiable linear-in-jd map) into
    the dense block first, so one dense rhs/solve covers them.
    """
    from mujoco_mpc_tpu.ops import pallas_linalg

    def mat(t, prim):
      return jnp.zeros_like(prim) if isinstance(
          t, jax.custom_derivatives.SymbolicZero) else t

    base, cdofc_p, gprimals = _split(primals)
    dbase_raw, dcdofc_raw, dgroups_raw = _split(tangents)
    qm, qs, j, aref, dvec, eqf, s_aref, s_dvec, c_j, c_aref, c_d0, \
        c_s, c_mu, f_aref, f_dvec, f_loss = base
    outs = newton_impl(*primals)
    qacc, jar_d, jar_s, jar_c, jar_f = outs[:5]
    jar_groups = outs[5:]
    dqm, dqs, dj, daref, ddvec, _, ds_aref, ds_dvec, dc_j, dc_aref, \
        dc_d0, _, _, df_aref, df_dvec, df_loss = (
            mat(t, p) for t, p in zip(dbase_raw, base))

    # fold the point groups into the dense block: materialize + expand
    # primal and tangent rows (jvp of the bilinear factored expansion)
    # and append the converged facet jars
    n_dense = j.shape[-2]
    gsizes = []
    if ngroups:
      dcdofc = mat(dcdofc_raw, cdofc_p)
    for gi, cdim in enumerate(condims):
      gp = gprimals[gi]
      gt = tuple(mat(t, p) for t, p in zip(dgroups_raw[gi], gp))
      dm = _decode_dmask(dmasks[gi], gp[0].shape[-3], cdofc_p.shape[-2])

      def expand_fact(g_, garef_, gdvec_, gmu_, cdofc_, _c=cdim, _dm=dm):
        return expand_group(materialize_jd(g_, cdofc_, _dm), garef_,
                            gdvec_, gmu_, _c)

      (ej, ea, ed), (dej, dea, ded) = jax.jvp(
          expand_fact, gp + (cdofc_p,), gt + (dcdofc,))
      gsizes.append((gp[1].shape[0], gp[0].shape[0]))
      j = jnp.concatenate([j, ej])
      dj = jnp.concatenate([dj, dej])
      aref = jnp.concatenate([aref, ea])
      daref = jnp.concatenate([daref, dea])
      dvec = jnp.concatenate([dvec, ed])
      ddvec = jnp.concatenate([ddvec, ded])
      eqf = jnp.concatenate([eqf, jnp.zeros(ea.shape[0],
                                            dtype=eqf.dtype)])
      jar_d = jnp.concatenate(
          [jar_d, jar_groups[gi].reshape(ea.shape[0])])

    nv = qs.shape[-1]
    n = j.shape[-2]
    ns = s_aref.shape[-1]
    dtype = qs.dtype
    sgn = jnp.asarray(np.asarray(sign), dtype=dtype)
    dof_np = np.asarray(dof, dtype=np.int32)

    e = qacc - qs
    h = qm + _DAMP * jnp.eye(nv, dtype=dtype)
    rhs = dqm @ e - qm @ dqs
    if n > 0:
      active_d = jnp.logical_or(jar_d < 0, eqf > 0.5)
      w_d = jnp.where(active_d, dvec, 0.0)
      dw_d = jnp.where(active_d, ddvec, 0.0)
      h = h + (j.T * w_d) @ j
      rhs = rhs + (dj.T @ (w_d * jar_d) + j.T @ (dw_d * jar_d)
                   + j.T @ (w_d * (dj @ qacc - daref)))
    if ns > 0:
      active_s = jar_s < 0
      w_s = jnp.where(active_s, s_dvec, 0.0)
      dw_s = jnp.where(active_s, ds_dvec, 0.0)
      h = h.at[dof_np, dof_np].add(w_s)
      rhs = rhs.at[dof_np].add(
          sgn * (dw_s * jar_s + w_s * (-ds_aref)))
    nf = f_aref.shape[-1]
    if nf > 0:
      fdof_np = np.asarray(fdof, dtype=np.int32)
      quad_f = jnp.abs(f_dvec * jar_f) <= f_loss
      sgn_f = jnp.sign(f_dvec * jar_f)
      h = h.at[fdof_np, fdof_np].add(jnp.where(quad_f, f_dvec, 0.0))
      # g_f = clip(w jar, -loss, loss): quadratic zone contributes
      # dw*jar - w*daref (the dqacc part lives in H); clamped zones are
      # constant +-loss with tangent +-dloss
      rhs = rhs.at[fdof_np].add(jnp.where(
          quad_f, df_dvec * jar_f + f_dvec * (-df_aref),
          sgn_f * df_loss))
    nc = c_d0.shape[-1]
    if nc > 0:
      # frozen-zone cone tangent: g_cone is linear in d0 and smooth in
      # jar within a zone; s/mu are static model constants (zero tangent)
      hc = cone_hess(jar_c, c_d0, c_s, c_mu)
      g_cone = cone_grad(jar_c, c_d0, c_s, c_mu)
      h = h + jnp.einsum('cdn,cde,cem->nm', c_j, hc, c_j)
      djar_dir = jnp.einsum('cdn,n->cd', dc_j, qacc) - dc_aref
      rhs = (rhs + jnp.einsum('cdn,cd->n', dc_j, g_cone)
             + jnp.einsum('cdn,cde,ce->n', c_j, hc, djar_dir)
             + jnp.einsum('cdn,cd->n', c_j,
                          cone_grad(jar_c, dc_d0, c_s, c_mu)))
    dqacc = -jax.lax.custom_linear_solve(
        lambda v: h @ v, rhs,
        solve=lambda _mv, b: pallas_linalg.solve_spd(h, b),
        symmetric=True)
    if n > 0:
      djar_d = dj @ qacc + j @ dqacc - daref
    else:
      djar_d = jnp.zeros_like(jar_d)
    if ns > 0:
      djar_s = sgn * dqacc[dof_np] - ds_aref
    else:
      djar_s = jnp.zeros_like(jar_s)
    if nc > 0:
      djar_c = (jnp.einsum('cdn,n->cd', dc_j, qacc)
                + jnp.einsum('cdn,n->cd', c_j, dqacc) - dc_aref)
    else:
      djar_c = jnp.zeros_like(jar_c)
    if nf > 0:
      djar_f = dqacc[np.asarray(fdof, dtype=np.int32)] - df_aref
    else:
      djar_f = jnp.zeros_like(jar_f)
    djar_groups = []
    off = n_dense
    for (nrep, p) in gsizes:
      djar_groups.append(djar_d[off:off + nrep * p].reshape(nrep, p))
      off += nrep * p
    return ((qacc, jar_d[:n_dense], jar_s, jar_c, jar_f)
            + tuple(jar_groups),
            (dqacc, djar_d[:n_dense], djar_s, djar_c, djar_f)
            + tuple(djar_groups))

  return newton
