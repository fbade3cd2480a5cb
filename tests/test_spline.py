"""Spline tests: interpolation semantics vs the reference TimeSpline
(spline.cc Sample/CubicCoefficients/Slope)."""

import numpy as np
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import spline


def _plan():
  times = jnp.asarray([0.0, 1.0, 2.0, 3.0])
  values = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [0.0, -1.0], [2.0, 0.5]])
  return times, values


def test_boundary_clamping():
  times, values = _plan()
  for interp in (spline.Interp.ZERO, spline.Interp.LINEAR,
                 spline.Interp.CUBIC):
    np.testing.assert_allclose(
        spline.sample(times, values, jnp.asarray(-0.5), interp), values[0])
    np.testing.assert_allclose(
        spline.sample(times, values, jnp.asarray(9.0), interp), values[-1])


def test_zero_holds_left():
  times, values = _plan()
  out = spline.sample(times, values, jnp.asarray(1.7), spline.Interp.ZERO)
  np.testing.assert_allclose(out, values[1])


def test_linear():
  times, values = _plan()
  out = spline.sample(times, values, jnp.asarray(0.25), spline.Interp.LINEAR)
  np.testing.assert_allclose(out, 0.75 * values[0] + 0.25 * values[1])


def test_knot_exact():
  times, values = _plan()
  for interp in (spline.Interp.LINEAR, spline.Interp.CUBIC):
    for k in range(4):
      out = spline.sample(times, values, times[k], interp)
      np.testing.assert_allclose(out, values[k], atol=1e-12)


def test_cubic_hermite_fd_slopes():
  times, values = _plan()
  t = 1.4
  # reference formulas (spline.cc:240-277)
  lo, hi = 1, 2
  s = (t - 1.0) / 1.0
  m0 = 0.5 * (values[2] - values[1]) / 1.0 + 0.5 * (values[1] - values[0])
  m1 = 0.5 * (values[3] - values[2]) / 1.0 + 0.5 * (values[2] - values[1])
  c0 = 2 * s**3 - 3 * s**2 + 1
  c1 = (s**3 - 2 * s**2 + s) * 1.0
  c2 = -2 * s**3 + 3 * s**2
  c3 = (s**3 - s**2) * 1.0
  expected = c0 * values[1] + c1 * m0 + c2 * values[2] + c3 * m1
  out = spline.sample(times, values, jnp.asarray(t), spline.Interp.CUBIC)
  np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_knot_times_spacing():
  # reference: sampling/planner.cc:284-289
  t = spline.knot_times(jnp.asarray(2.0), jnp.asarray(1.0), 5,
                        spline.Interp.ZERO)
  np.testing.assert_allclose(np.diff(np.asarray(t)), 0.2)
  t = spline.knot_times(jnp.asarray(2.0), jnp.asarray(1.0), 5,
                        spline.Interp.LINEAR)
  np.testing.assert_allclose(np.diff(np.asarray(t)), 0.25)
  np.testing.assert_allclose(t[0], 2.0)


def test_resample_preserves_plan():
  times, values = _plan()
  new_times = jnp.asarray([0.5, 1.5, 2.5])
  out = spline.resample(times, values, new_times, spline.Interp.LINEAR)
  np.testing.assert_allclose(out[0], 0.5 * (values[0] + values[1]))
