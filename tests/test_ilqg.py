"""iLQG tests: Riccati vs closed-form LQR recursion (the reference's
backward_pass_test.cc pattern), boxQP correctness, and swing-up improvement."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import derivatives, ilqg
from mujoco_mpc_tpu.tasks import registry
from tests.test_derivatives import _di_spec

# the end-to-end planning tests are marked slow individually (minutes on
# one CPU); the Riccati/boxQP unit tests stay in the <5-min core suite

DTYPE = jnp.float64


def _lqr_reference(a, b, cxx, cuu, cx_T, cxx_T, cx, cu, T):
  """Hand-rolled discrete Riccati recursion (no limits, no regularization)."""
  vx, vxx = cx_T, cxx_T
  ks, gains = [], []
  for t in reversed(range(T - 1)):
    qx = cx[t] + a[t].T @ vx
    qu = cu[t] + b[t].T @ vx
    qxx = cxx[t] + a[t].T @ vxx @ a[t]
    qxu = a[t].T @ vxx @ b[t]
    quu = cuu[t] + b[t].T @ vxx @ b[t]
    kt = -np.linalg.solve(quu, qu)
    gt = -np.linalg.solve(quu, qxu.T)
    vx = qx + gt.T @ (quu @ kt + qu) + qxu @ kt
    vxx = qxx + gt.T @ quu @ gt + qxu @ gt + gt.T @ qxu.T
    vxx = 0.5 * (vxx + vxx.T)
    ks.append(kt)
    gains.append(gt)
  return np.array(ks[::-1]), np.array(gains[::-1])


def test_riccati_matches_lqr():
  spec = _di_spec()
  d0 = make_data(spec.model, dtype=DTYPE)
  d0 = d0.replace(qpos=jnp.asarray([0.5], DTYPE), qvel=jnp.asarray([-0.3],
                                                                   DTYPE))
  T = 8
  actions = jnp.zeros((T, 1), dtype=DTYPE)
  traj = derivatives.nominal_trajectory(spec, d0, actions,
                                        spec.default_params)
  derivs = derivatives.compute(spec, d0, traj, spec.default_params)

  k, gain, dv, ok = ilqg.riccati(
      derivs, jnp.asarray(0.0, DTYPE), traj.actions,
      spec.model.actuator_ctrlrange, ilqg.REG_NONE, action_limits=False)
  assert bool(ok)

  a, b = np.asarray(derivs.a), np.asarray(derivs.b)
  k_ref, g_ref = _lqr_reference(
      a, b, np.asarray(derivs.cxx[:-1]), np.asarray(derivs.cuu[:-1]),
      np.asarray(derivs.cx[-1]), np.asarray(derivs.cxx[-1]),
      np.asarray(derivs.cx[:-1]), np.asarray(derivs.cu[:-1]), T)
  np.testing.assert_allclose(k[:-1], k_ref, rtol=1e-8, atol=1e-10)
  np.testing.assert_allclose(gain[:-1], g_ref, rtol=1e-8, atol=1e-10)


def test_boxqp_unconstrained_matches_solve():
  rng = np.random.default_rng(0)
  q = rng.standard_normal((3, 3))
  h = jnp.asarray(q @ q.T + 3 * np.eye(3))
  g = jnp.asarray(rng.standard_normal(3))
  lower = jnp.full(3, -100.0)
  upper = jnp.full(3, 100.0)
  x, free, ok = ilqg.boxqp(h, g, lower, upper)
  assert bool(ok)
  np.testing.assert_allclose(x, -np.linalg.solve(h, g), atol=1e-6)
  assert np.all(np.asarray(free))


def test_boxqp_clamps():
  h = jnp.asarray(np.eye(2))
  g = jnp.asarray([-5.0, 0.3])
  lower = jnp.asarray([-1.0, -1.0])
  upper = jnp.asarray([1.0, 1.0])
  x, free, ok = ilqg.boxqp(h, g, lower, upper)
  # unconstrained solution (5, -0.3) -> x0 clamps at 1.0
  np.testing.assert_allclose(x, [1.0, -0.3], atol=1e-8)
  assert not bool(free[0])
  assert bool(free[1])


def test_ilqg_improves_cartpole():
  spec = registry.get_task('Cartpole')
  dtype = spec.model.qpos0.dtype
  d0 = make_data(spec.model, dtype=dtype)
  d0 = d0.replace(qpos=jnp.asarray([0.6, 2.9], dtype))
  t_steps = agent_mod.horizon_steps(spec)
  cfg = ilqg.default_config(spec, dtype=dtype)
  state = ilqg.default_state(spec, t_steps, dtype=dtype)

  opt = jax.jit(lambda st: ilqg.optimize(
      spec, st, d0, spec.default_params, cfg, num_candidates=8,
      horizon_steps=t_steps))

  rets = []
  for _ in range(10):
    state, info = opt(state)
    rets.append(float(info['best_return']))
  assert rets[-1] < rets[0] * 0.9, rets
  # action limits respected on the winner trajectory
  lo = np.asarray(spec.model.actuator_ctrlrange[:, 0])
  hi = np.asarray(spec.model.actuator_ctrlrange[:, 1])
  acts = np.asarray(state.policy.actions)
  assert acts.min() >= lo.min() - 1e-5
  assert acts.max() <= hi.max() + 1e-5


def test_ilqg_feedback_action():
  spec = registry.get_task('Cartpole')
  dtype = spec.model.qpos0.dtype
  t_steps = 5
  state = ilqg.default_state(spec, t_steps, dtype=dtype)
  # nonzero gains: action responds linearly to state error
  gain = state.policy.feedback_gain.at[:, 0, 0].set(0.5)
  pol = state.policy.replace(feedback_gain=gain)
  qpos = jnp.asarray([0.2, 0.0], dtype)
  u = ilqg.action_from_policy(spec, pol, qpos, jnp.zeros(2, dtype),
                              jnp.zeros(0, dtype), jnp.asarray(0.0, dtype))
  np.testing.assert_allclose(u, [0.5 * 0.2], atol=1e-6)
