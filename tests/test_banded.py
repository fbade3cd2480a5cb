"""Block-banded Cholesky vs dense reference (analog of the reference's
band-Cholesky core, mjpc/direct/direct.cc:2342-2380)."""

import numpy as np

import jax.numpy as jnp

from mujoco_mpc_tpu.ops import banded


def _random_block_tridiag(T, n, seed=0):
  rng = np.random.RandomState(seed)
  diag = []
  lower = rng.randn(T - 1, n, n) * 0.3
  for t in range(T):
    a = rng.randn(n, n)
    diag.append(a @ a.T + (n + 4) * np.eye(n))
  return np.stack(diag), lower


def _dense_from_blocks(diag, lower, off2=None):
  T, n, _ = diag.shape
  A = np.zeros((T * n, T * n))
  for t in range(T):
    A[t*n:(t+1)*n, t*n:(t+1)*n] = diag[t]
  for t in range(T - 1):
    A[(t+1)*n:(t+2)*n, t*n:(t+1)*n] = lower[t]
    A[t*n:(t+1)*n, (t+1)*n:(t+2)*n] = lower[t].T
  if off2 is not None:
    for t in range(T - 2):
      A[(t+2)*n:(t+3)*n, t*n:(t+1)*n] = off2[t]
      A[t*n:(t+1)*n, (t+2)*n:(t+3)*n] = off2[t].T
  return A


def test_block_tridiag_solve_matches_dense():
  T, n = 8, 5
  diag, lower = _random_block_tridiag(T, n)
  A = _dense_from_blocks(diag, lower)
  rng = np.random.RandomState(1)
  b = rng.randn(T, n)

  ld, ll = banded.block_tridiag_cholesky(jnp.asarray(diag),
                                         jnp.asarray(lower))
  x = np.array(banded.block_tridiag_solve(ld, ll, jnp.asarray(b)))
  want = np.linalg.solve(A, b.reshape(-1)).reshape(T, n)
  np.testing.assert_allclose(x, want, rtol=1e-5, atol=1e-7)


def test_block_pentadiag_solve_matches_dense():
  T, n = 8, 4
  rng = np.random.RandomState(2)
  diag, lower = _random_block_tridiag(T, n, seed=3)
  # widen the diagonal so the pentadiagonal system stays SPD
  diag = diag + 10 * np.eye(n)
  off2 = rng.randn(T - 2, n, n) * 0.2
  A = _dense_from_blocks(diag, lower, off2)
  assert np.all(np.linalg.eigvalsh(A) > 0)
  b = rng.randn(T, n)

  x = np.array(banded.block_pentadiag_solve(
      jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(off2),
      jnp.asarray(b)))
  want = np.linalg.solve(A, b.reshape(-1)).reshape(T, n)
  np.testing.assert_allclose(x, want, rtol=1e-5, atol=1e-7)
