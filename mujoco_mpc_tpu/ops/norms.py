"""Convex norm library: value, analytic gradient and Hessian.

Re-design of the reference's norm set (/root/reference/mjpc/norm.cc:50-210,
norm.h:24-35) as pure JAX functions. Values/gradients/Hessians follow the
same formulas (including zero-guard edge cases) so derivative-based planners
(Gradient, iLQG) see the same Gauss-Newton expansions; everything is
vectorized and differentiable, and the Hessians are exact, not autodiff'd,
to keep the iLQG backward pass cheap on device.

Norm types use the reference's enum values so task configs interoperate:
  kNull=-1, kQuadratic=0, kL22=1, kL2=2, kCosh=3, kPowerLoss=5,
  kSmoothAbsLoss=6, kSmoothAbs2Loss=7, kRectifyLoss=8.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

_EPS = 1e-12


class NormType(enum.IntEnum):
  NULL = -1
  QUADRATIC = 0
  L22 = 1
  L2 = 2
  COSH = 3
  POWER_LOSS = 5
  SMOOTH_ABS_LOSS = 6
  SMOOTH_ABS2_LOSS = 7
  RECTIFY_LOSS = 8


def num_norm_parameters(norm_type: int) -> int:
  """Number of parameters per norm (reference: norm.cc:25-47)."""
  return {
      NormType.NULL: 0, NormType.QUADRATIC: 0, NormType.L22: 2,
      NormType.L2: 1, NormType.COSH: 1, NormType.POWER_LOSS: 1,
      NormType.SMOOTH_ABS_LOSS: 1, NormType.SMOOTH_ABS2_LOSS: 2,
      NormType.RECTIFY_LOSS: 1,
  }[NormType(norm_type)]


def norm_value(x: jax.Array, params: jax.Array, norm_type: int) -> jax.Array:
  """Evaluate the norm on residual vector x (last axis). norm_type static."""
  t = NormType(norm_type)
  p = params[..., 0] if params.shape[-1] > 0 else jnp.zeros(x.shape[:-1],
                                                            dtype=x.dtype)
  q = params[..., 1] if params.shape[-1] > 1 else jnp.zeros(x.shape[:-1],
                                                            dtype=x.dtype)
  if t == NormType.NULL:
    return x[..., 0]
  if t == NormType.QUADRATIC:
    return 0.5 * jnp.sum(x * x, axis=-1)
  if t == NormType.L22:
    c = jnp.sum(x * x, axis=-1)
    a = jnp.power(jnp.maximum(c, _EPS), q / 2) + jnp.power(p, q)
    return jnp.power(a, 1.0 / q) - p
  if t == NormType.L2:
    return jnp.sqrt(jnp.sum(x * x, axis=-1) + p * p) - p
  if t == NormType.COSH:
    return jnp.sum(p[..., None] ** 2 * (jnp.cosh(x / p[..., None]) - 1.0),
                   axis=-1)
  if t == NormType.POWER_LOSS:
    return jnp.sum(jnp.abs(x) ** p[..., None], axis=-1)
  if t == NormType.SMOOTH_ABS_LOSS:
    pn = p[..., None]
    return jnp.sum(jnp.sqrt(x * x + pn * pn) - pn, axis=-1)
  if t == NormType.SMOOTH_ABS2_LOSS:
    pn, qn = p[..., None], q[..., None]
    a = jnp.abs(x)
    return jnp.sum((a ** qn + pn ** qn) ** (1.0 / qn) - pn, axis=-1)
  if t == NormType.RECTIFY_LOSS:
    pn = p[..., None]
    soft = pn * jnp.log1p(jnp.exp(x / jnp.where(pn > 0, pn, 1.0)))
    hard = jnp.maximum(x, 0.0)
    return jnp.sum(jnp.where(pn > 0, soft, hard), axis=-1)
  raise ValueError(f'unknown norm type {norm_type}')


def norm_grad(x: jax.Array, params: jax.Array, norm_type: int) -> jax.Array:
  """Analytic gradient dy/dx, shape of x."""
  t = NormType(norm_type)
  p = params[..., 0] if params.shape[-1] > 0 else jnp.zeros(x.shape[:-1],
                                                            dtype=x.dtype)
  q = params[..., 1] if params.shape[-1] > 1 else jnp.zeros(x.shape[:-1],
                                                            dtype=x.dtype)
  if t == NormType.NULL:
    return jnp.ones_like(x)
  if t == NormType.QUADRATIC:
    return x
  if t == NormType.L22:
    c = jnp.maximum(jnp.sum(x * x, axis=-1), _EPS)
    a = jnp.power(c, q / 2) + jnp.power(p, q)
    s = jnp.power(a, 1.0 / q)
    d = jnp.power(c, q / 2 - 1.0)
    b = s / a * d
    return b[..., None] * x
  if t == NormType.L2:
    s = jnp.sqrt(jnp.sum(x * x, axis=-1) + p * p)
    return jnp.where(s[..., None] > 0, x / jnp.maximum(s[..., None], _EPS),
                     jnp.zeros_like(x))
  if t == NormType.COSH:
    pn = p[..., None]
    return pn * jnp.sinh(x / pn)
  if t == NormType.POWER_LOSS:
    pn = p[..., None]
    a = jnp.maximum(jnp.abs(x), _EPS)
    return jnp.sign(x) * pn * a ** (pn - 1.0)
  if t == NormType.SMOOTH_ABS_LOSS:
    pn = p[..., None]
    s = jnp.sqrt(x * x + pn * pn)
    return jnp.where(s > 0, x / jnp.maximum(s, _EPS), jnp.zeros_like(x))
  if t == NormType.SMOOTH_ABS2_LOSS:
    pn, qn = p[..., None], q[..., None]
    a = jnp.maximum(jnp.abs(x), _EPS)
    dd = a ** qn
    e = dd + pn ** qn
    s = e ** (1.0 / qn)
    c = s * a ** (qn - 2.0) / e
    return c * x
  if t == NormType.RECTIFY_LOSS:
    pn = p[..., None]
    s = jnp.exp(x / jnp.where(pn > 0, pn, 1.0))
    soft = s / (1.0 + s)
    hard = (x > 0).astype(x.dtype)
    return jnp.where(pn > 0, soft, hard)
  raise ValueError(f'unknown norm type {norm_type}')


def norm_hess(x: jax.Array, params: jax.Array, norm_type: int) -> jax.Array:
  """Analytic Hessian d2y/dx2, shape (..., n, n)."""
  t = NormType(norm_type)
  n = x.shape[-1]
  eye = jnp.eye(n, dtype=x.dtype)
  p = params[..., 0] if params.shape[-1] > 0 else jnp.zeros(x.shape[:-1],
                                                            dtype=x.dtype)
  q = params[..., 1] if params.shape[-1] > 1 else jnp.zeros(x.shape[:-1],
                                                            dtype=x.dtype)
  def diag(v):
    return eye * v[..., None]
  if t == NormType.NULL:
    return jnp.zeros(x.shape[:-1] + (n, n), dtype=x.dtype)
  if t == NormType.QUADRATIC:
    return jnp.broadcast_to(eye, x.shape[:-1] + (n, n))
  if t == NormType.L22:
    c = jnp.maximum(jnp.sum(x * x, axis=-1), _EPS)
    a = jnp.power(c, q / 2) + jnp.power(p, q)
    s = jnp.power(a, 1.0 / q)
    d = jnp.power(c, q / 2 - 1.0)
    b = s / a * d
    cc = (1.0 - q) * d / a + (q - 2.0) / c
    outer = x[..., :, None] * x[..., None, :]
    return b[..., None, None] * (eye + outer * cc[..., None, None])
  if t == NormType.L2:
    s = jnp.sqrt(jnp.sum(x * x, axis=-1) + p * p)
    g = x / jnp.maximum(s[..., None], _EPS)
    outer = g[..., :, None] * g[..., None, :]
    h = (eye - outer) / jnp.maximum(s[..., None, None], _EPS)
    return jnp.where(s[..., None, None] > 0, h, jnp.zeros_like(h))
  if t == NormType.COSH:
    pn = p[..., None]
    return diag(jnp.cosh(x / pn))
  if t == NormType.POWER_LOSS:
    pn = p[..., None]
    a = jnp.maximum(jnp.abs(x), _EPS)
    return diag((pn - 1.0) * pn * a ** (pn - 2.0))
  if t == NormType.SMOOTH_ABS_LOSS:
    pn = p[..., None]
    s = jnp.sqrt(x * x + pn * pn)
    g = x / jnp.maximum(s, _EPS)
    return diag(jnp.where(s > 0, (1.0 - g * g) / jnp.maximum(s, _EPS), 0.0))
  if t == NormType.SMOOTH_ABS2_LOSS:
    pn, qn = p[..., None], q[..., None]
    a = jnp.maximum(jnp.abs(x), _EPS)
    dd = a ** qn
    e = dd + pn ** qn
    s = e ** (1.0 / qn)
    c = s * a ** (qn - 2.0) / e
    return diag(c * (qn - 1.0) * (1.0 - dd / e))
  if t == NormType.RECTIFY_LOSS:
    pn = p[..., None]
    pp = jnp.where(pn > 0, pn, 1.0)
    s = jnp.exp(x / pp)
    h = s / (pp * (1.0 + s) ** 2)
    return diag(jnp.where(pn > 0, h, jnp.zeros_like(h)))
  raise ValueError(f'unknown norm type {norm_type}')
