"""Noslip post-pass (MuJoCo `<option noslip_iterations/>`) — TPU-native.

Reference task configs rely on this pass for their contact dynamics:
the reference's planning models set it in MJCF (e.g.
/root/reference/mjpc/tasks/fingers/task.xml:4 `noslip_iterations="5"`,
manipulation/task_panda_bring.xml:4, quadruped a1 and bimanual aloha
configs), and the reference gets the behavior for free from `mj_step`.

Semantics, characterized against the MuJoCo C oracle and validated row
by row in tests/test_noslip.py: after the main constraint solve, a
sequential (Gauss-Seidel) pass revisits FRICTION forces with the
constraint regularization removed, driving the friction-row residual
`jar = J qacc - aref` to zero, clamped to the friction bound. Each sweep
visits rows in efc order — dof frictionloss rows first, then contacts:

- frictionloss rows: 1-D update y <- clip(y - jar/A_ii, -loss, +loss)
  with A_ii the dof's inverse-inertia diagonal (observed: jar driven
  geometrically to 0 across sweeps, unclamped forces converge).
- elliptic cones: per contact, all friction dims (tangents + torsion +
  rolling) are solved JOINTLY: min_x 0.5 x'Ax + x'b with
  A = J_f M^-1 J_f' (no +R) and b = jar excluding the contact's own
  friction contribution, subject to sum_i (x_i/mu_i)^2 <= fN^2 (MuJoCo's
  mju_QCQP form, normal force frozen). A solve that saturates lands
  exactly on the cone — contacts the main solver already put in the
  cone zone come out unchanged.
- pyramidal cones: per facet PAIR, a 1-D update in difference
  coordinates y = (f+ - f-)/2 with the pair sum s = (f+ + f-)/2 frozen:
  drive the pair's difference jar to zero, clamp |y| <= s. Pairs are
  visited in order within each contact (observed from the oracle: pair
  jars equalize sequentially, saturated pairs pin at the box bound).

Mixed-condim pyramidal scenes visit each condim group in sequence
within a sweep (a deviation from MuJoCo's strict row order that
vanishes at convergence).

Note: force/torque/touch sensor decode (constraint.contact_forces)
derives forces from the zone formulas of the MAIN solve; under noslip
the friction part of that decode is the pre-noslip force (MuJoCo stores
the updated efc_force explicitly). Normal forces are frozen by noslip,
so normal/touch readings are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.ops import linalg
from mujoco_mpc_tpu.physics import constraint
from mujoco_mpc_tpu.physics.model import Data, Model

_QCQP_ITERS = 20


def _qcqp(a: jax.Array, b: jax.Array, mu: jax.Array, fn: jax.Array,
          active: jax.Array) -> jax.Array:
  """min_x 0.5 x'Ax + x'b  s.t.  sum_i (x_i/mu_i)^2 <= fn^2.

  `active` masks padded friction dims (x forced to 0 there). The
  constrained case solves the secular equation phi(lam) =
  sum_i w_i x(lam)_i^2 - fn^2 = 0 with x(lam) = -(A + lam W)^-1 b,
  W = diag(1/mu_i^2), by safeguarded Newton from lam=0 (phi is convex
  and decreasing, so the iterates increase monotonically to the root) —
  the same stationarity system as MuJoCo's mju_QCQP2/QCQP3."""
  dtype = b.dtype
  k = b.shape[0]
  eye = jnp.eye(k, dtype=dtype)
  actf = active.astype(dtype)
  am = a * (actf[:, None] * actf[None, :]) + (1.0 - actf) * eye
  bm = b * actf
  msafe = jnp.where(active, mu, 1.0)
  w = actf / (msafe * msafe)
  wmat = jnp.diag(w)

  x0 = -jnp.linalg.solve(am, bm)
  v0 = jnp.sum(w * x0 * x0)
  r2 = fn * fn

  def newton(lam, _):
    mat = am + lam * wmat
    x = -jnp.linalg.solve(mat, bm)
    phi = jnp.sum(w * x * x) - r2
    dx = -jnp.linalg.solve(mat, w * x)
    dphi = 2.0 * jnp.sum(w * x * dx)
    lam = lam - phi / jnp.minimum(dphi, jnp.asarray(-1e-30, dtype))
    return jnp.maximum(lam, 0.0), None

  lam, _ = jax.lax.scan(newton, jnp.zeros((), dtype), None,
                        length=_QCQP_ITERS)
  xc = -jnp.linalg.solve(am + lam * wmat, bm)
  x = jnp.where(v0 <= r2, x0, xc)
  return jnp.where(fn > 0.0, x, jnp.zeros_like(x)) * actf


def _minv_rows(l_chol: jax.Array, rows: jax.Array) -> jax.Array:
  """M^-1 applied to each row of a (..., nv) stack."""
  flat = rows.reshape(-1, rows.shape[-1])
  out = jax.vmap(lambda r: linalg.chol_solve(l_chol, r))(flat)
  return out.reshape(rows.shape)


def _friction_sweep(m: Model, d: Data, l_chol):
  """(y0, sweep) for dof frictionloss rows, or None."""
  fr = constraint._friction_rows(m, d)
  if fr is None:
    return None
  dofs = np.asarray(fr.dof, dtype=np.int32)
  nf = len(dofs)
  eye_rows = jnp.zeros((nf, d.qacc.shape[0]), dtype=d.qacc.dtype)
  eye_rows = eye_rows.at[jnp.arange(nf), dofs].set(1.0)
  w = _minv_rows(l_chol, eye_rows)                 # (F, nv) M^-1 e_dof
  aii = w[jnp.arange(nf), dofs]                    # (F,)
  jar0 = d.qacc[dofs] - fr.aref
  y0 = -jnp.clip(fr.d * jar0, -fr.loss, fr.loss)

  dofs_j = jnp.asarray(dofs)

  def sweep(qacc, y):
    def body(carry, k):
      qacc, y = carry
      jar = qacc[dofs_j[k]] - fr.aref[k]
      yn = jnp.clip(y[k] - jar / jnp.maximum(aii[k], 1e-30),
                    -fr.loss[k], fr.loss[k])
      qacc = qacc + (yn - y[k]) * w[k]
      y = y.at[k].set(yn)
      return (qacc, y), None
    (qacc, y), _ = jax.lax.scan(body, (qacc, y), jnp.arange(nf))
    return qacc, y

  return y0, sweep


def _elliptic_sweep(m: Model, d: Data, l_chol):
  """(x0, sweep) for elliptic cone contacts, or None."""
  from mujoco_mpc_tpu.ops import pallas_newton

  cblk = constraint.cone_contact_blocks(m, d)
  if cblk is None:
    return None
  cr = cblk.rows
  c_n = cr.d0.shape[0]
  jf = cr.j[:, 1:, :]                          # (C, 5, nv)
  aref_f = cr.aref[:, 1:]                      # (C, 5)
  w = _minv_rows(l_chol, jf)                   # (C, 5, nv) = M^-1 Jf'
  a = jnp.einsum('cin,cjn->cij', jf, w)        # (C, 5, 5) Delassus, no +R
  jar = jnp.einsum('cdn,n->cd', cr.j, d.qacc) - cr.aref
  f = -pallas_newton.cone_grad(jar, cr.d0, cr.s, cr.mu)
  fn = f[:, 0]                                 # frozen normal force
  x0 = f[:, 1:]
  mu_dims = cr.mu[:, None] * cr.s              # (C, 5) actual mu_i
  active = cr.s > 0.0

  def sweep(qacc, x):
    def body(carry, c):
      qacc, x = carry
      jar_f = jf[c] @ qacc - aref_f[c]
      b = jar_f - a[c] @ x[c]
      xn = _qcqp(a[c], b, mu_dims[c], fn[c], active[c])
      qacc = qacc + (xn - x[c]) @ w[c]
      x = jax.lax.dynamic_update_index_in_dim(x, xn, c, 0)
      return (qacc, x), None
    (qacc, x), _ = jax.lax.scan(body, (qacc, x), jnp.arange(c_n))
    return qacc, x

  return x0, sweep


def _pyramidal_sweeps(m: Model, d: Data, l_chol):
  """[(y0, sweep), ...] per condim>1 pyramidal contact block."""
  out = []
  for blk in constraint.contact_blocks(m, d):
    if blk.condim <= 1:
      continue
    rows = blk.rows
    p = blk.pos.shape[0]
    pairs = blk.nrep // 2
    j = rows.j.reshape(blk.nrep, p, -1)        # facet-major layout
    aref = rows.aref.reshape(blk.nrep, p)
    dvec = jnp.where(rows.active, rows.d, 0.0).reshape(blk.nrep, p)
    jar = jnp.einsum('kpn,n->kp', j, d.qacc) - aref
    f = jnp.where(jar < 0, -dvec * jar, 0.0)   # facet forces (nrep, P)
    jd = j[0::2] - j[1::2]                     # (K, P, nv) = 2 mu_k J_ax
    aref_d = aref[0::2] - aref[1::2]
    wd = _minv_rows(l_chol, jd)                # (K, P, nv)
    h = jnp.einsum('kpn,kpn->kp', jd, wd)
    s = 0.5 * (f[0::2] + f[1::2])              # frozen pair sums
    y0 = 0.5 * (f[0::2] - f[1::2])

    def sweep(qacc, y, jd=jd, aref_d=aref_d, wd=wd, h=h, s=s, p=p,
              pairs=pairs):
      def body(carry, i):
        qacc, y = carry
        pi = i // pairs
        k = i % pairs
        g = jd[k, pi] @ qacc - aref_d[k, pi]
        yk = y[k, pi]
        yn = jnp.clip(yk - g / jnp.maximum(h[k, pi], 1e-30),
                      -s[k, pi], s[k, pi])
        qacc = qacc + (yn - yk) * wd[k, pi]
        y = y.at[k, pi].set(yn)
        return (qacc, y), None
      (qacc, y), _ = jax.lax.scan(body, (qacc, y),
                                  jnp.arange(p * pairs))
      return qacc, y

    out.append((y0, sweep))
  return out


def apply(m: Model, d: Data, iterations: int) -> Data:
  """Run the noslip pass on post-solve Data; updates qacc and
  qfrc_constraint consistently (M qacc = qfrc_smooth + qfrc_constraint,
  so downstream integrators — Euler's implicit-damping re-solve, the
  implicit-in-velocity solve — see the corrected contact forces)."""
  if m.nv == 0:
    return d
  has_fr = bool(m.friction_dof)
  if not has_fr and not m.collision_pairs:
    return d
  l_chol = linalg.chol_factor(d.qM)
  fr = _friction_sweep(m, d, l_chol) if has_fr else None
  if m.collision_pairs:
    if m.opt.cone == 1:
      cs = _elliptic_sweep(m, d, l_chol)
      contact_parts = [cs] if cs is not None else []
    else:
      contact_parts = _pyramidal_sweeps(m, d, l_chol)
  else:
    contact_parts = []
  if fr is None and not contact_parts:
    return d

  qacc0 = d.qacc
  states0 = tuple(p[0] for p in ([fr] if fr else []) + contact_parts)
  sweeps = tuple(p[1] for p in ([fr] if fr else []) + contact_parts)

  def one_iteration(carry, _):
    qacc, states = carry
    new_states = []
    for state, sweep in zip(states, sweeps):
      qacc, state = sweep(qacc, state)
      new_states.append(state)
    return (qacc, tuple(new_states)), None

  (qacc, _), _ = jax.lax.scan(one_iteration, (qacc0, states0), None,
                              length=iterations)
  qfrc = d.qfrc_constraint + d.qM @ (qacc - qacc0)
  return d.replace(qacc=qacc, qfrc_constraint=qfrc)
