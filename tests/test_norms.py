"""Norm library tests: analytic grad/Hessian vs finite differences, plus
value checks against the reference formulas (norm.cc:50-210)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu.ops import norms

ALL_TYPES = [
    norms.NormType.QUADRATIC, norms.NormType.L22, norms.NormType.L2,
    norms.NormType.COSH, norms.NormType.POWER_LOSS,
    norms.NormType.SMOOTH_ABS_LOSS, norms.NormType.SMOOTH_ABS2_LOSS,
    norms.NormType.RECTIFY_LOSS,
]

_PARAMS = {
    norms.NormType.QUADRATIC: [],
    norms.NormType.L22: [0.1, 2.0],
    norms.NormType.L2: [0.1],
    norms.NormType.COSH: [0.3],
    norms.NormType.POWER_LOSS: [2.5],
    norms.NormType.SMOOTH_ABS_LOSS: [0.1],
    norms.NormType.SMOOTH_ABS2_LOSS: [0.1, 2.2],
    norms.NormType.RECTIFY_LOSS: [0.2],
}


@pytest.mark.parametrize('ntype', ALL_TYPES)
def test_grad_hess_fd(ntype):
  rng = np.random.default_rng(1)
  x = jnp.asarray(rng.standard_normal(5) * 0.7)
  p = jnp.asarray(_PARAMS[ntype] + [0.0] * (3 - len(_PARAMS[ntype])))

  g = norms.norm_grad(x, p, ntype)
  h = norms.norm_hess(x, p, ntype)

  # autodiff cross-check (all these norms are smooth away from 0)
  g_ad = jax.grad(lambda xx: norms.norm_value(xx, p, ntype))(x)
  h_ad = jax.hessian(lambda xx: norms.norm_value(xx, p, ntype))(x)
  np.testing.assert_allclose(g, g_ad, rtol=1e-6, atol=1e-8)
  np.testing.assert_allclose(h, h_ad, rtol=1e-5, atol=1e-6)


def test_values_match_reference_formulas():
  x = jnp.asarray([0.3, -0.4])
  # quadratic: 0.5 x'x
  np.testing.assert_allclose(
      norms.norm_value(x, jnp.zeros(3), norms.NormType.QUADRATIC),
      0.5 * (0.09 + 0.16), rtol=1e-12)
  # L2: sqrt(x'x + p^2) - p
  p = jnp.asarray([0.1, 0.0, 0.0])
  np.testing.assert_allclose(
      norms.norm_value(x, p, norms.NormType.L2),
      np.sqrt(0.25 + 0.01) - 0.1, rtol=1e-7)
  # smooth abs: sum sqrt(x^2+p^2)-p
  np.testing.assert_allclose(
      norms.norm_value(x, p, norms.NormType.SMOOTH_ABS_LOSS),
      (np.sqrt(0.09 + 0.01) - 0.1) + (np.sqrt(0.16 + 0.01) - 0.1), rtol=1e-7)


def test_null_norm():
  x = jnp.asarray([0.7])
  assert float(norms.norm_value(x, jnp.zeros(3), norms.NormType.NULL)) == \
      pytest.approx(0.7)


def test_l2_zero_guard():
  x = jnp.zeros(3)
  p = jnp.zeros(3)
  g = norms.norm_grad(x, p, norms.NormType.L2)
  assert np.all(np.isfinite(np.asarray(g)))


def test_param_dims_match_reference():
  # reference: norm.cc:25-47
  assert norms.num_norm_parameters(norms.NormType.NULL) == 0
  assert norms.num_norm_parameters(norms.NormType.QUADRATIC) == 0
  assert norms.num_norm_parameters(norms.NormType.L22) == 2
  assert norms.num_norm_parameters(norms.NormType.L2) == 1
  assert norms.num_norm_parameters(norms.NormType.COSH) == 1
  assert norms.num_norm_parameters(norms.NormType.POWER_LOSS) == 1
  assert norms.num_norm_parameters(norms.NormType.SMOOTH_ABS_LOSS) == 1
  assert norms.num_norm_parameters(norms.NormType.SMOOTH_ABS2_LOSS) == 2
  assert norms.num_norm_parameters(norms.NormType.RECTIFY_LOSS) == 1
