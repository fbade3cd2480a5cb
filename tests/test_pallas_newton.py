"""Fused Newton kernel (ops/pallas_newton.py) vs the XLA reference path.

The kernel runs the whole contact-Newton loop for 128 samples per Pallas
program; these tests check (in interpret mode on CPU) that it matches the
per-sample XLA while_loop bit-for-bit-ish, on synthetic systems and on
real model constraint rows, and that the custom_jvp implicit tangent
matches jacfwd of the reference loop.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.ops import pallas_newton


def _synthetic_problem(key, bsz, nv, n, ns, dtype=jnp.float32):
  ks = jax.random.split(key, 8)
  a = jax.random.normal(ks[0], (bsz, nv, nv), dtype=dtype)
  qm = a @ jnp.transpose(a, (0, 2, 1)) + 2.0 * jnp.eye(nv, dtype=dtype)
  qs = jax.random.normal(ks[1], (bsz, nv), dtype=dtype)
  j = jax.random.normal(ks[2], (bsz, n, nv), dtype=dtype)
  aref = jax.random.normal(ks[3], (bsz, n), dtype=dtype)
  dvec = jax.nn.softplus(jax.random.normal(ks[4], (bsz, n), dtype=dtype))
  eqf = (jax.random.uniform(ks[5], (bsz, n)) < 0.2).astype(dtype)
  s_aref = jax.random.normal(ks[6], (bsz, ns), dtype=dtype)
  s_dvec = jax.nn.softplus(jax.random.normal(ks[7], (bsz, ns),
                                             dtype=dtype))
  return qm, qs, j, aref, dvec, eqf, s_aref, s_dvec


def _cone_empty(nv, dtype=jnp.float32, bsz=None):
  """Empty elliptic-cone + frictionloss operands (pyramidal-only
  problems)."""
  lead = () if bsz is None else (bsz,)
  return (jnp.zeros(lead + (0, 6, nv), dtype=dtype),
          jnp.zeros(lead + (0, 6), dtype=dtype),
          jnp.zeros(lead + (0,), dtype=dtype),
          jnp.zeros(lead + (0, 5), dtype=dtype),
          jnp.zeros(lead + (0,), dtype=dtype),
          jnp.zeros(lead + (0,), dtype=dtype),
          jnp.zeros(lead + (0,), dtype=dtype),
          jnp.zeros(lead + (0,), dtype=dtype))


def _run_both(args, dof, sign, cap=30, tol=1e-6):
  bsz, nv = args[1].shape
  cone = _cone_empty(nv, args[1].dtype, bsz)
  ref = jax.vmap(functools.partial(
      pallas_newton._newton_reference, dof=dof, sign=sign, cap=cap,
      tol=tol))(*args, *cone)
  ref = ref[:3]
  got = pallas_newton.newton_batched(*args, dof=dof, sign=sign, cap=cap,
                                     tol=tol, interpret=True)
  return ref, got


def test_kernel_matches_reference_dense_and_scalar():
  nv, n, ns = 7, 12, 4
  dof = (0, 2, 0, 2)
  sign = (1.0, 1.0, -1.0, -1.0)
  args = _synthetic_problem(jax.random.key(0), 130, nv, n, ns)
  ref, got = _run_both(args, dof, sign)
  # f32: reduction order differs between the kernel and the XLA path, so
  # a jar element sitting exactly on an activity boundary can wiggle at
  # ~1e-3 — compare at that scale, not machine epsilon
  for r, g in zip(ref, got):
    np.testing.assert_allclose(np.asarray(r, np.float64),
                               np.asarray(g, np.float64),
                               rtol=2e-3, atol=1e-3)


def test_kernel_matches_reference_dense_only():
  nv, n = 5, 9
  qm, qs, j, aref, dvec, eqf, _, _ = _synthetic_problem(
      jax.random.key(1), 128, nv, n, 1)
  z = jnp.zeros((128, 0), dtype=qs.dtype)
  args = (qm, qs, j, aref, dvec, eqf, z, z)
  ref, got = _run_both(args, (), ())
  np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                             rtol=2e-4, atol=2e-4)


def test_kernel_matches_reference_scalar_only():
  nv, ns = 4, 3
  qm, qs, _, _, _, _, s_aref, s_dvec = _synthetic_problem(
      jax.random.key(2), 128, nv, 1, ns)
  z2 = jnp.zeros((128, 0, nv), dtype=qs.dtype)
  z1 = jnp.zeros((128, 0), dtype=qs.dtype)
  args = (qm, qs, z2, z1, z1, z1, s_aref, s_dvec)
  ref, got = _run_both(args, (1, 3, 1), (1.0, 1.0, -1.0))
  np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                             rtol=2e-4, atol=2e-4)


def test_lane_padding():
  nv, n = 4, 6
  qm, qs, j, aref, dvec, eqf, _, _ = _synthetic_problem(
      jax.random.key(3), 37, nv, n, 1)
  z = jnp.zeros((37, 0), dtype=qs.dtype)
  args = (qm, qs, j, aref, dvec, eqf, z, z)
  ref, got = _run_both(args, (), ())
  assert got[0].shape == (37, nv)
  np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                             rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sublane_tile_layout_matches_lane_layout():
  """(S, 128) batch-tile layout vs the (128,) lane layout, same seed.

  The tile layout packs S*128 samples per program with every per-sample
  scalar a full (S, 128) vreg tile; both layouts run the identical
  Newton recurrence, so they must agree to reduction-order noise."""
  nv, n, ns = 6, 10, 2
  dof = (1, 4)
  sign = (1.0, -1.0)
  args = _synthetic_problem(jax.random.key(7), 300, nv, n, ns)
  lane = pallas_newton.newton_batched(*args, dof=dof, sign=sign, cap=30,
                                      tol=1e-6, interpret=True, sublanes=0)
  tile = pallas_newton.newton_batched(*args, dof=dof, sign=sign, cap=30,
                                      tol=1e-6, interpret=True, sublanes=2)
  for a, b in zip(lane, tile):
    np.testing.assert_allclose(np.asarray(a, np.float64),
                               np.asarray(b, np.float64),
                               rtol=2e-3, atol=1e-3)


@pytest.mark.slow
def test_implicit_jvp_matches_loop_jacfwd():
  """The frozen-active-set implicit tangent vs differentiating the loop.

  f64, well-converged: both compute the derivative of the same piecewise-
  smooth solution map."""
  nv, n, ns = 5, 8, 2
  dof = (1, 1)
  sign = (1.0, -1.0)
  args = _synthetic_problem(jax.random.key(4), 1, nv, n, ns,
                            dtype=jnp.float64)
  qm, qs, j, aref, dvec, eqf, s_aref, s_dvec = tuple(
      a[0] for a in args)
  newton = pallas_newton.make_newton(dof, sign, 100, 1e-12)
  cone = _cone_empty(nv, jnp.float64)

  def qacc_of_qs(qs_):
    return newton(qm, qs_, j, aref, dvec, eqf, s_aref, s_dvec, *cone)[0]

  def qacc_of_qs_ref(qs_):
    return pallas_newton._newton_reference(
        qm, qs_, j, aref, dvec, eqf, s_aref, s_dvec, *cone, dof=dof,
        sign=sign, cap=100, tol=1e-12)[0]

  got = jax.jacfwd(qacc_of_qs)(qs)
  want = jax.jacfwd(qacc_of_qs_ref)(qs)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-6, atol=1e-8)

  def qacc_of_j(j_):
    return newton(qm, qs, j_, aref, dvec, eqf, s_aref, s_dvec, *cone)[0]

  def qacc_of_j_ref(j_):
    return pallas_newton._newton_reference(
        qm, qs, j_, aref, dvec, eqf, s_aref, s_dvec, *cone, dof=dof,
        sign=sign, cap=100, tol=1e-12)[0]

  got_j = jax.jacfwd(qacc_of_j)(j)
  want_j = jax.jacfwd(qacc_of_j_ref)(j)
  np.testing.assert_allclose(np.asarray(got_j), np.asarray(want_j),
                             rtol=1e-6, atol=1e-8)


def _synthetic_group(key, bsz, p, condim, nv, dtype=jnp.float32):
  """Random FACTORED point-direction contact group:
  (g, cdofc, dmask, aref, dvec, mu); jd = (g . cdofc) * dmask."""
  ndirs = {1: 1, 3: 3, 4: 4, 6: 6}[condim]
  nrep = len(pallas_newton.PYRAMID_FACETS[condim])
  ks = jax.random.split(key, 5)
  g = jax.random.normal(ks[0], (bsz, p, ndirs, 6), dtype=dtype)
  cdofc = jax.random.normal(ks[4], (bsz, nv, 6), dtype=dtype)
  dmask = np.asarray(
      jax.random.randint(jax.random.key(99), (p, nv), -1, 2),
      dtype=np.float32)
  dmask[0, :] = 1.0  # at least one fully-coupled point
  aref = jax.random.normal(ks[1], (bsz, nrep, p), dtype=dtype)
  dvec = jax.nn.softplus(jax.random.normal(ks[2], (bsz, p), dtype=dtype))
  mu = 0.2 + jax.random.uniform(ks[3], (bsz, 3, p), dtype=dtype)
  return g, cdofc, dmask, aref, dvec, mu


@pytest.mark.parametrize('condim', [1, 3, 6])
@pytest.mark.slow
def test_point_group_matches_expanded_dense(condim):
  """Solving with a point group == solving its facet-expanded dense rows
  (per-sample f64 reference path)."""
  nv, p = 6, 3
  args = _synthetic_problem(jax.random.key(8), 1, nv, 2, 0,
                            dtype=jnp.float64)
  qm, qs, j, aref, dvec, eqf, s_aref, s_dvec = (a[0] for a in args)
  gg, gcdofc, gdm, garef, gdvec, gmu = _synthetic_group(
      jax.random.key(9), 1, p, condim, nv, dtype=jnp.float64)
  gg, gcdofc, garef, gdvec, gmu = (a[0] for a in
                                   (gg, gcdofc, garef, gdvec, gmu))
  gjd = pallas_newton.materialize_jd(gg, gcdofc, gdm)
  cone = _cone_empty(nv, jnp.float64)

  got = pallas_newton._newton_reference(
      qm, qs, j, aref, dvec, eqf, s_aref, s_dvec, *cone,
      dof=(), sign=(), cap=100, tol=1e-12, condims=(condim,),
      groups=((gjd, garef, gdvec, gmu),))
  ej, ea, ed = pallas_newton.expand_group(gjd, garef, gdvec, gmu, condim)
  want = pallas_newton._newton_reference(
      qm, qs, jnp.concatenate([j, ej]), jnp.concatenate([aref, ea]),
      jnp.concatenate([dvec, ed]),
      jnp.concatenate([eqf, jnp.zeros_like(ea)]), s_aref, s_dvec, *cone,
      dof=(), sign=(), cap=100, tol=1e-12)
  np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                             rtol=1e-10)
  nrep = garef.shape[0]
  np.testing.assert_allclose(
      np.asarray(got[5]), np.asarray(want[1][2:].reshape(nrep, p)),
      rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_kernel_point_group_matches_reference():
  """Fused kernel with in-VMEM factored facet expansion vs the XLA path,
  both layouts."""
  nv, n, ns, p = 7, 4, 2, 3
  dof = (0, 2)
  sign = (1.0, -1.0)
  args = _synthetic_problem(jax.random.key(10), 260, nv, n, ns)
  gg, gcdofc, gdm, garef, gdvec, gmu = _synthetic_group(
      jax.random.key(11), 260, p, 3, nv)
  gjd = pallas_newton.materialize_jd(gg, gcdofc, gdm)
  cone = _cone_empty(nv, jnp.float32, 260)

  ref = jax.vmap(lambda *a: pallas_newton._newton_reference(
      *a[:16], dof=dof, sign=sign, cap=30, tol=1e-6, condims=(3,),
      groups=(tuple(a[16:20]),)))(*args, *cone, gjd, garef, gdvec, gmu)
  for sub in (0, 2):
    got = pallas_newton.newton_batched(
        *args, gcdofc, gg, garef, gdvec, gmu, dof=dof, sign=sign,
        cap=30, tol=1e-6, interpret=True, sublanes=sub, condims=(3,),
        dmasks=(gdm.tobytes(),))
    for r, g in zip((ref[0], ref[1], ref[2], ref[5]),
                    (got[0], got[1], got[2], got[3])):
      # the kernel contracts G . cdofc in a different order than the
      # materialized-jd oracle, so boundary-sitting jars wiggle ~2e-3
      np.testing.assert_allclose(np.asarray(r, np.float64),
                                 np.asarray(g, np.float64),
                                 rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_point_group_implicit_jvp():
  """Implicit tangent through a factored point group vs jacfwd of the
  loop (differentiating through the G factors and the shared cdofc)."""
  nv, p = 5, 2
  args = _synthetic_problem(jax.random.key(12), 1, nv, 1, 0,
                            dtype=jnp.float64)
  qm, qs, j, aref, dvec, eqf, s_aref, s_dvec = (a[0] for a in args)
  gg, gcdofc, gdm, garef, gdvec, gmu = _synthetic_group(
      jax.random.key(13), 1, p, 3, nv, dtype=jnp.float64)
  gg, gcdofc, garef, gdvec, gmu = (a[0] for a in
                                   (gg, gcdofc, garef, gdvec, gmu))
  cone = _cone_empty(nv, jnp.float64)
  newton = pallas_newton.make_newton((), (), 100, 1e-12, condims=(3,),
                                     dmasks=(gdm.tobytes(),))

  def qacc_of(qs_, gg_, cdofc_):
    return newton(qm, qs_, j, aref, dvec, eqf, s_aref, s_dvec, *cone,
                  cdofc_, gg_, garef, gdvec, gmu)[0]

  def qacc_of_ref(qs_, gg_, cdofc_):
    gjd_ = pallas_newton.materialize_jd(gg_, cdofc_, gdm)
    return pallas_newton._newton_reference(
        qm, qs_, j, aref, dvec, eqf, s_aref, s_dvec, *cone,
        dof=(), sign=(), cap=100, tol=1e-12, condims=(3,),
        groups=((gjd_, garef, gdvec, gmu),))[0]

  got = jax.jacfwd(qacc_of, argnums=(0, 1, 2))(qs, gg, gcdofc)
  want = jax.jacfwd(qacc_of_ref, argnums=(0, 1, 2))(qs, gg, gcdofc)
  for gk, wk in zip(got, want):
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=1e-6, atol=1e-8)


def test_seam_vmap_falls_back_off_tpu():
  """vmap through make_newton on CPU must agree with the direct loop."""
  nv, n, ns = 4, 5, 2
  dof = (0, 3)
  sign = (1.0, -1.0)
  args = _synthetic_problem(jax.random.key(5), 16, nv, n, ns,
                            dtype=jnp.float64)
  newton = pallas_newton.make_newton(dof, sign, 100, 1e-12)
  cone = _cone_empty(nv, jnp.float64, 16)
  got = jax.vmap(newton)(*args, *cone)
  want = jax.vmap(functools.partial(
      pallas_newton._newton_reference, dof=dof, sign=sign, cap=100,
      tol=1e-12))(*args, *cone)
  for g, w in zip(got, want):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-12)
