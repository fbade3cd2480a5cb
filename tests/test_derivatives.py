"""Derivative-stack tests: exact Jacobians vs closed form (double integrator,
the reference's LQR fixture pattern, test/lqr.cc) and vs finite differences;
gradient planner improves cartpole."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics.model import load_model, make_data
from mujoco_mpc_tpu.planners import derivatives, gradient_planner, sampling
from mujoco_mpc_tpu.planners import cross_entropy, sample_gradient
from mujoco_mpc_tpu.tasks import base, registry

DTYPE = jnp.float64

DOUBLE_INTEGRATOR = """
<mujoco>
  <option timestep="0.01" gravity="0 0 0"/>
  <worldbody>
    <body>
      <joint name="x" type="slide" axis="1 0 0"/>
      <geom type="sphere" size="0.05" mass="1"/>
    </body>
  </worldbody>
  <actuator><motor joint="x" gear="1"/></actuator>
</mujoco>
"""


def _di_spec():
  model, mjm = load_model(xml_string=DOUBLE_INTEGRATOR, dtype=DTYPE)

  def residual(m, d, rp):
    return jnp.concatenate([d.qpos, d.qvel, d.ctrl])

  params = base.TaskParams(
      weights=jnp.asarray([1.0, 0.1, 0.01], dtype=DTYPE),
      norm_params=jnp.zeros((3, 3), dtype=DTYPE),
      residual_params=jnp.zeros(1, dtype=DTYPE),
      risk=jnp.asarray(0.0, dtype=DTYPE))

  return base.TaskSpec(
      name='DoubleIntegrator', model=model, mj_model=mjm,
      term_names=('pos', 'vel', 'ctrl'), norm_types=(0, 0, 0),
      term_dims=(1, 1, 1), residual_fn=residual, default_params=params,
      config={'agent_horizon': 0.1, 'agent_timestep': 0.01})


def test_transition_derivs_double_integrator():
  spec = _di_spec()
  h = 0.01
  d0 = make_data(spec.model, dtype=DTYPE)
  d0 = d0.replace(qpos=jnp.asarray([0.3], DTYPE), qvel=jnp.asarray([-0.2],
                                                                   DTYPE))
  actions = 0.5 * jnp.ones((5, 1), dtype=DTYPE)
  traj = derivatives.nominal_trajectory(spec, d0, actions,
                                        spec.default_params)
  a, b = derivatives.transition_derivs(spec, d0, traj)
  # semi-implicit Euler: v' = v + h u ; p' = p + h v'
  a_expected = np.array([[1.0, h], [0.0, 1.0]])
  b_expected = np.array([[h * h], [h]])
  np.testing.assert_allclose(a[0], a_expected, atol=1e-9)
  np.testing.assert_allclose(b[0], b_expected, atol=1e-9)


def test_cost_derivs_quadratic():
  spec = _di_spec()
  d0 = make_data(spec.model, dtype=DTYPE)
  d0 = d0.replace(qpos=jnp.asarray([0.4], DTYPE), qvel=jnp.asarray([0.1],
                                                                   DTYPE))
  actions = jnp.full((4, 1), 0.3, dtype=DTYPE)
  traj = derivatives.nominal_trajectory(spec, d0, actions,
                                        spec.default_params)
  cx, cu, cxx, cxu, cuu = derivatives.cost_derivs(
      spec, d0, traj, spec.default_params)
  # cost = 0.5*(w0 p^2 + w1 v^2 + w2 u^2): cx = (w0 p, w1 v), cu = w2 u
  np.testing.assert_allclose(cx[0], [1.0 * 0.4, 0.1 * 0.1], atol=1e-9)
  np.testing.assert_allclose(cu[0], [0.01 * 0.3], atol=1e-9)
  np.testing.assert_allclose(cxx[0], np.diag([1.0, 0.1]), atol=1e-9)
  np.testing.assert_allclose(cuu[0], [[0.01]], atol=1e-9)
  np.testing.assert_allclose(cxu[0], np.zeros((2, 1)), atol=1e-12)


def test_transition_derivs_vs_fd_cartpole():
  spec = registry.get_task('Cartpole')
  m = spec.model
  d0 = make_data(m)
  d0 = d0.replace(qpos=jnp.asarray([0.2, 2.5], m.qpos0.dtype))
  actions = jnp.full((3, 1), 0.4, dtype=m.qpos0.dtype)
  traj = derivatives.nominal_trajectory(spec, d0, actions,
                                        spec.default_params)
  a, b = derivatives.transition_derivs(spec, d0, traj)

  # finite-difference check on A[0]
  from mujoco_mpc_tpu.physics import forward as fwd
  eps = 1e-4

  def step_xu(qpos, qvel, u):
    d = d0.replace(qpos=qpos, qvel=qvel, ctrl=u)
    d = fwd.step(m, d)
    return np.concatenate([np.asarray(d.qpos), np.asarray(d.qvel)])

  x0 = step_xu(traj.qpos[0], traj.qvel[0], traj.actions[0])
  fd_a = np.zeros((4, 4))
  for i in range(2):
    qp = np.asarray(traj.qpos[0]).copy()
    qp[i] += eps
    fd_a[:, i] = (step_xu(jnp.asarray(qp), traj.qvel[0], traj.actions[0])
                  - x0) / eps
    qv = np.asarray(traj.qvel[0]).copy()
    qv[i] += eps
    fd_a[:, 2 + i] = (step_xu(traj.qpos[0], jnp.asarray(qv),
                              traj.actions[0]) - x0) / eps
  np.testing.assert_allclose(a[0], fd_a, atol=5e-3)


def test_spline_mapping_is_linear_operator():
  times = jnp.linspace(0.0, 1.0, 5)
  rollout_times = jnp.linspace(0.0, 1.0, 11)
  for interp in (spline.Interp.ZERO, spline.Interp.LINEAR,
                 spline.Interp.CUBIC):
    mapping = derivatives.spline_mapping(times, rollout_times, interp)
    values = jnp.sin(jnp.arange(5.0))[:, None]
    direct = spline.sample_many(times, values, rollout_times, interp)[:, 0]
    np.testing.assert_allclose(mapping @ values[:, 0], direct, atol=1e-6)


def test_gradient_planner_improves_cartpole():
  spec = registry.get_task('Cartpole')
  dtype = spec.model.qpos0.dtype
  d0 = make_data(spec.model, dtype=dtype)
  d0 = d0.replace(qpos=jnp.asarray([0.7, 2.8], dtype))
  policy = sampling.default_policy(spec, 10, dtype=dtype)
  cfg = gradient_planner.default_config(spec, dtype=dtype)
  t_steps = agent_mod.horizon_steps(spec)

  opt = jax.jit(lambda pol: gradient_planner.optimize(
      spec, pol, d0, spec.default_params, cfg, num_candidates=10,
      horizon_steps=t_steps, interp=int(spline.Interp.LINEAR)))

  pol = policy
  first = None
  for _ in range(8):
    pol, info = opt(pol)
    if first is None:
      first = float(info['nominal_return'])
  assert float(info['best_return']) < first


def test_cem_improves_particle():
  spec = registry.get_task('ParticleFixed')
  dtype = spec.model.qpos0.dtype
  d0 = make_data(spec.model, dtype=dtype)
  cfg = cross_entropy.default_config(spec, dtype=dtype)
  state = cross_entropy.default_state(spec, 5, cfg, dtype=dtype)
  t_steps = agent_mod.horizon_steps(spec)

  opt = jax.jit(lambda st, key: cross_entropy.optimize(
      spec, st, d0, spec.default_params, cfg, key, num_samples=32,
      n_elite=4, horizon_steps=t_steps, interp=int(spline.Interp.ZERO)))

  rets = []
  for k in jax.random.split(jax.random.key(0), 15):
    state, info = opt(state, k)
    rets.append(float(info['best_return']))
  assert rets[-1] < rets[0]


def test_sample_gradient_improves_particle():
  spec = registry.get_task('ParticleFixed')
  dtype = spec.model.qpos0.dtype
  d0 = make_data(spec.model, dtype=dtype)
  cfg = sample_gradient.default_config(spec, dtype=dtype)
  state = sample_gradient.default_state(spec, 5, dtype=dtype)
  t_steps = agent_mod.horizon_steps(spec)

  opt = jax.jit(lambda st, key: sample_gradient.optimize(
      spec, st, d0, spec.default_params, cfg, key, num_samples=32,
      num_gradient=4, horizon_steps=t_steps,
      interp=int(spline.Interp.ZERO)))

  rets = []
  for k in jax.random.split(jax.random.key(1), 15):
    state, info = opt(state, k)
    rets.append(float(info['best_return']))
  assert rets[-1] < rets[0]
