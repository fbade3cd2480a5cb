"""Fused lane-batched Cholesky solve kernel vs the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import linalg, pallas_linalg


def _spd_batch(bsz, n, seed=0, dtype=np.float32):
  rng = np.random.RandomState(seed)
  a = rng.randn(bsz, n, n).astype(dtype)
  a = a @ np.transpose(a, (0, 2, 1)) + (n + 2) * np.eye(n, dtype=dtype)
  b = rng.randn(bsz, n).astype(dtype)
  return a, b


@pytest.mark.parametrize('n,bsz', [(2, 64), (9, 128), (18, 300)])
def test_pallas_kernel_matches_xla(n, bsz):
  """Interpreter-mode kernel vs the unrolled XLA solve (incl. padding)."""
  a, b = _spd_batch(bsz, n)
  got = np.array(pallas_linalg.solve_spd_batched(
      jnp.asarray(a), jnp.asarray(b), interpret=True))
  want = np.array(jax.vmap(linalg.solve_spd)(jnp.asarray(a),
                                             jnp.asarray(b)))
  np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_custom_vmap_dispatch():
  """vmap(solve_spd) routes through the batching rule and stays correct."""
  a, b = _spd_batch(130, 7)
  got = np.array(jax.vmap(pallas_linalg.solve_spd)(jnp.asarray(a),
                                                   jnp.asarray(b)))
  want = np.stack([np.linalg.solve(a[i], b[i]) for i in range(130)])
  np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_unbatched_call():
  a, b = _spd_batch(1, 5)
  got = np.array(pallas_linalg.solve_spd(jnp.asarray(a[0]),
                                         jnp.asarray(b[0])))
  want = np.linalg.solve(a[0], b[0])
  np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
