"""Small-matrix linear algebra unrolled for the TPU VPU.

XLA's Cholesky/TriangularSolve HLOs are blocked loop algorithms tuned for
large matrices; planner models have nv <= ~60 and the batch axis carries the
parallelism (thousands of vmapped rollouts). Unrolling the factorization
over the static matrix dimension turns each scalar operation into a
(batch,)-shaped VPU op that XLA fuses — benchmarked ~30x faster than
jax.scipy.linalg.cho_factor at nv=2..8, B=8192 on TPU v5e.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# above this size, fall back to XLA's native kernels
UNROLL_LIMIT = 24


def chol_factor(a: jax.Array) -> jax.Array:
  """Cholesky factor L (lower) of SPD a (..., n, n), unrolled for small n."""
  n = a.shape[-1]
  if n > UNROLL_LIMIT:
    return jnp.linalg.cholesky(a)
  # column-by-column unrolled Cholesky-Crout on scalar slices
  cols = [[None] * n for _ in range(n)]
  for j in range(n):
    s = a[..., j, j]
    for k in range(j):
      s = s - cols[j][k] * cols[j][k]
    ljj = jnp.sqrt(jnp.maximum(s, 1e-30))
    cols[j][j] = ljj
    inv = 1.0 / ljj
    for i in range(j + 1, n):
      s = a[..., i, j]
      for k in range(j):
        s = s - cols[i][k] * cols[j][k]
      cols[i][j] = s * inv
  rows = []
  zero = jnp.zeros_like(a[..., 0, 0])
  for i in range(n):
    rows.append(jnp.stack(
        [cols[i][j] if j <= i else zero for j in range(n)], axis=-1))
  return jnp.stack(rows, axis=-2)


def chol_solve(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solve (L L^T) x = b given the Cholesky factor, unrolled for small n."""
  n = l.shape[-1]
  if n > UNROLL_LIMIT:
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(l, y, lower=True, trans=1)
  # forward substitution
  y = [None] * n
  for i in range(n):
    s = b[..., i]
    for k in range(i):
      s = s - l[..., i, k] * y[k]
    y[i] = s / l[..., i, i]
  # back substitution
  x = [None] * n
  for i in reversed(range(n)):
    s = y[i]
    for k in range(i + 1, n):
      s = s - l[..., k, i] * x[k]
    x[i] = s / l[..., i, i]
  return jnp.stack(x, axis=-1)


def solve_spd(a: jax.Array, b: jax.Array) -> jax.Array:
  """Solve SPD a x = b."""
  return chol_solve(chol_factor(a), b)
