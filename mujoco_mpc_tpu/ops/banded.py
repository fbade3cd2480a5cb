"""Block-banded SPD factorization and solves.

TPU-native analog of the reference's band-Cholesky Gauss-Newton core
(mjpc/direct/direct.cc:2342-2380 uses mju_cholFactorBand with
ntotal = nv*T, nband = 3*nv). Instead of a scalar band loop, the matrix is
kept as nv-sized blocks and factored block-wise with a `lax.scan` whose body
is dense (nv, nv) matmuls / triangular solves — each step runs on the MXU,
and the sequential scan is over the window length only.

A block-pentadiagonal system (the Direct Hessian couples t with t+-2) is
handled by grouping two consecutive blocks into one superblock, which makes
it block-tridiagonal.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def block_tridiag_cholesky(diag: jax.Array, lower: jax.Array
                           ) -> Tuple[jax.Array, jax.Array]:
  """Blocked Cholesky of an SPD block-tridiagonal matrix.

  diag:  (T, n, n) diagonal blocks D_t
  lower: (T-1, n, n) sub-diagonal blocks C_t (block (t+1, t))

  Returns (L_diag (T, n, n) lower-triangular, L_lower (T-1, n, n)) with
    D_0 = L_0 L_0^T
    C_t = M_t L_t^T            =>  M_t = C_t L_t^{-T}
    D_{t+1} - M_t M_t^T = L_{t+1} L_{t+1}^T
  """
  l0 = jnp.linalg.cholesky(diag[0])

  def body(l_prev, blocks):
    c, d = blocks
    # M = C L^{-T}: solve L M^T = C^T (lower-triangular solve on the MXU)
    m = jsl.solve_triangular(l_prev, c.T, lower=True).T
    l_next = jnp.linalg.cholesky(d - m @ m.T)
    return l_next, (l_next, m)

  _, (l_diag_rest, l_lower) = jax.lax.scan(body, l0,
                                           (lower, diag[1:]))
  l_diag = jnp.concatenate([l0[None], l_diag_rest], axis=0)
  return l_diag, l_lower


def block_tridiag_solve(l_diag: jax.Array, l_lower: jax.Array,
                        b: jax.Array) -> jax.Array:
  """Solve A x = b given the blocked factor from block_tridiag_cholesky.

  b: (T, n). Forward substitution L y = b then back substitution
  L^T x = y, both as scans of (n, n) triangular solves.
  """
  def fwd_body(y_prev, blocks):
    l, m, bt = blocks
    y = jsl.solve_triangular(l, bt - m @ y_prev, lower=True)
    return y, y

  n = b.shape[-1]
  y0 = jsl.solve_triangular(l_diag[0], b[0], lower=True)
  zero_m = jnp.zeros_like(l_lower[:1])
  _, ys = jax.lax.scan(
      fwd_body, y0, (l_diag[1:], l_lower, b[1:]))
  y = jnp.concatenate([y0[None], ys], axis=0)

  def bwd_body(x_next, blocks):
    l, m, yt = blocks
    x = jsl.solve_triangular(l.T, yt - m.T @ x_next, lower=False)
    return x, x

  xT = jsl.solve_triangular(l_diag[-1].T, y[-1], lower=False)
  _, xs = jax.lax.scan(
      bwd_body, xT, (l_diag[:-1], l_lower, y[:-1]), reverse=True)
  return jnp.concatenate([xs, xT[None]], axis=0)


def pentadiag_to_superblocks(diag: jax.Array, off1: jax.Array,
                             off2: jax.Array
                             ) -> Tuple[jax.Array, jax.Array]:
  """Group 2x2 blocks of a block-pentadiagonal SPD matrix into superblocks.

  diag: (T, n, n), off1: (T-1, n, n) block (t+1, t), off2: (T-2, n, n)
  block (t+2, t). T must be even. Returns (super_diag (T/2, 2n, 2n),
  super_lower (T/2 - 1, 2n, 2n)) in block-tridiagonal layout.
  """
  t, n, _ = diag.shape
  assert t % 2 == 0, 'pad the window to an even number of blocks'
  s = t // 2

  def super_diag_at(i):
    a = diag[2 * i]
    b = off1[2 * i] if 2 * i < t - 1 else jnp.zeros_like(a)
    d = diag[2 * i + 1]
    top = jnp.concatenate([a, b.T], axis=1)
    bot = jnp.concatenate([b, d], axis=1)
    return jnp.concatenate([top, bot], axis=0)

  def super_lower_at(i):
    # superblock (i+1, i) couples scalarblocks (2i+2, 2i+3) x (2i, 2i+1)
    z = jnp.zeros_like(diag[0])
    c20 = off2[2 * i]                       # (2i+2, 2i)
    c21 = off1[2 * i + 1]                   # (2i+2, 2i+1)
    c30 = z                                 # (2i+3, 2i) outside the band
    c31 = off2[2 * i + 1] if 2 * i + 1 < t - 2 else z
    top = jnp.concatenate([c20, c21], axis=1)
    bot = jnp.concatenate([c30, c31], axis=1)
    return jnp.concatenate([top, bot], axis=0)

  super_diag = jnp.stack([super_diag_at(i) for i in range(s)])
  super_lower = (jnp.stack([super_lower_at(i) for i in range(s - 1)])
                 if s > 1 else jnp.zeros((0, 2 * n, 2 * n),
                                         dtype=diag.dtype))
  return super_diag, super_lower


def block_pentadiag_solve(diag: jax.Array, off1: jax.Array,
                          off2: jax.Array, b: jax.Array) -> jax.Array:
  """Solve a block-pentadiagonal SPD system (T, n) via superblocking."""
  t, n = b.shape
  sd, sl = pentadiag_to_superblocks(diag, off1, off2)
  ld, ll = block_tridiag_cholesky(sd, sl)
  x = block_tridiag_solve(ld, ll, b.reshape(t // 2, 2 * n))
  return x.reshape(t, n)
