"""Time-spline control plans: zero / linear / cubic interpolation.

TPU-native re-design of the reference TimeSpline
(/root/reference/mjpc/spline/spline.cc:103-260 Sample/CubicCoefficients/
Slope). Instead of a ring buffer of nodes mutated in place, a plan is a pair
of fixed-size arrays (times (P,), values (P, nu)) — a pytree that vmaps over
thousands of noisy candidates. Semantics match the reference:

  * sampling before the first / after the last knot clamps to end values;
  * zero interpolation holds the left knot;
  * cubic is a Hermite spline whose knot slopes are averaged one-sided
    finite differences (one-sided at the ends).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class Interp(enum.IntEnum):
  ZERO = 0
  LINEAR = 1
  CUBIC = 2


def _slopes(times: jax.Array, values: jax.Array) -> jax.Array:
  """Per-knot slopes: averaged one-sided finite differences (P, nu)."""
  dt = jnp.maximum(times[1:] - times[:-1], 1e-10)[:, None]  # (P-1, 1)
  fd = (values[1:] - values[:-1]) / dt                       # (P-1, nu)
  first = fd[0:1]
  last = fd[-1:]
  interior = 0.5 * (fd[1:] + fd[:-1])
  return jnp.concatenate([first, interior, last], axis=0)


def sample(times: jax.Array, values: jax.Array, t: jax.Array,
           interp: int) -> jax.Array:
  """Sample the plan at scalar time t. interp is static."""
  p = times.shape[0]
  if p == 1:
    return values[0]

  upper = jnp.searchsorted(times, t, side='right')  # in [0, P]
  below = upper == 0
  above = upper == p
  lo = jnp.clip(upper - 1, 0, p - 1)
  hi = jnp.clip(upper, 0, p - 1)

  v_lo = values[lo]
  v_hi = values[hi]

  if interp == Interp.ZERO:
    inner = v_lo
  else:
    t_lo, t_hi = times[lo], times[hi]
    dt = jnp.maximum(t_hi - t_lo, 1e-10)
    s = (t - t_lo) / dt
    if interp == Interp.LINEAR:
      inner = v_lo * (1 - s) + v_hi * s
    else:  # cubic Hermite with FD slopes
      m = _slopes(times, values)
      m0, m1 = m[lo], m[hi]
      s2, s3 = s * s, s * s * s
      c0 = 2 * s3 - 3 * s2 + 1
      c1 = (s3 - 2 * s2 + s) * dt
      c2 = -2 * s3 + 3 * s2
      c3 = (s3 - s2) * dt
      inner = c0 * v_lo + c1 * m0 + c2 * v_hi + c3 * m1

  out = jnp.where(below, values[0], inner)
  out = jnp.where(above, values[p - 1], out)
  return out


def sample_many(times: jax.Array, values: jax.Array, ts: jax.Array,
                interp: int) -> jax.Array:
  """Sample at a vector of times -> (T, nu)."""
  return jax.vmap(lambda t: sample(times, values, t, interp))(ts)


def resample(times: jax.Array, values: jax.Array, new_times: jax.Array,
             interp: int) -> jax.Array:
  """Evaluate the plan at new knot times (the reference's non-sliding
  UpdateNominalPolicy resampling, sampling/planner.cc:283-305)."""
  return sample_many(times, values, new_times, interp)


def knot_times(t0: jax.Array, horizon_time: jax.Array, num_points: int,
               interp: int) -> jax.Array:
  """Knot spacing rule from the reference (sampling/planner.cc:284-289):
  zero splines space by T/P, others by T/(P-1)."""
  if interp == Interp.ZERO:
    shift = jnp.maximum(horizon_time / num_points, 1e-5)
  else:
    shift = jnp.maximum(horizon_time / max(num_points - 1, 1), 1e-5)
  steps = jnp.arange(num_points, dtype=jnp.result_type(t0, horizon_time))
  return t0 + steps * shift
