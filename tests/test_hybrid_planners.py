"""iLQS and Robust planner tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import ilqg, ilqs, robust, sampling
from mujoco_mpc_tpu.tasks import registry

# end-to-end planning tests: minutes on one CPU; the <5-min core suite is
# the unit/parity set (pytest -m "not slow")
pytestmark = pytest.mark.slow


def test_ilqs_improves_cartpole():
  spec = registry.get_task('Cartpole')
  dtype = spec.model.qpos0.dtype
  d0 = make_data(spec.model, dtype=dtype)
  d0 = d0.replace(qpos=jnp.asarray([0.5, 2.7], dtype))
  t_steps = agent_mod.horizon_steps(spec)
  scfg = sampling.default_config(spec, dtype=dtype)
  icfg = ilqg.default_config(spec, dtype=dtype)
  state = ilqs.default_state(spec, 10, t_steps, dtype=dtype)

  opt = jax.jit(lambda st, key: ilqs.optimize(
      spec, st, d0, spec.default_params, scfg, icfg, key, num_samples=15,
      num_ilqg_candidates=6, horizon_steps=t_steps,
      interp=int(spline.Interp.ZERO)))

  rets = []
  for k in jax.random.split(jax.random.key(0), 8):
    state, info = opt(state, k)
    rets.append(float(info['best_return']))
  assert rets[-1] < rets[0], rets
  # action query works for both active policies
  u = ilqs.action_from_policy(spec, state, d0.qpos, d0.qvel, d0.act,
                              d0.time, int(spline.Interp.ZERO))
  assert np.all(np.isfinite(np.asarray(u)))


def test_robust_improves_particle():
  spec = registry.get_task('ParticleFixed')
  dtype = spec.model.qpos0.dtype
  d0 = make_data(spec.model, dtype=dtype)
  t_steps = agent_mod.horizon_steps(spec)
  scfg = sampling.default_config(spec, dtype=dtype)
  rcfg = robust.RobustConfig(
      xfrc_std=jnp.asarray(0.01, dtype), xfrc_rate=jnp.asarray(0.1, dtype))
  policy = sampling.default_policy(spec, 5, dtype=dtype)

  opt = jax.jit(lambda pol, key: robust.optimize(
      spec, pol, d0, spec.default_params, scfg, rcfg, key, num_samples=16,
      ncandidates=4, nrepetitions=3, horizon_steps=t_steps,
      interp=int(spline.Interp.ZERO)))

  rets = []
  for k in jax.random.split(jax.random.key(1), 10):
    policy, info = opt(policy, k)
    rets.append(float(info['best_robust_score']))
  assert rets[-1] < rets[0], rets


def test_robust_decorates_any_ranked_planner():
  """Robust over CEM / SampleGradient delegates (planner.h:84-102: the
  decorator works over any RankedPlanner, not just Sampling)."""
  from mujoco_mpc_tpu.planners import cross_entropy, ranked, sample_gradient

  spec = registry.get_task('ParticleFixed')
  dtype = spec.model.qpos0.dtype
  d0 = make_data(spec.model, dtype=dtype)
  t_steps = agent_mod.horizon_steps(spec)
  rcfg = robust.RobustConfig(
      xfrc_std=jnp.asarray(0.01, dtype), xfrc_rate=jnp.asarray(0.1, dtype))
  interp = int(spline.Interp.ZERO)

  delegates = {
      'cem': ranked.make_cem_delegate(
          spec, cross_entropy.default_config(spec, dtype), 16, 5, t_steps,
          interp, dtype),
      'sg': ranked.make_sample_gradient_delegate(
          spec, sample_gradient.default_config(spec, dtype), 16, 2, 5,
          t_steps, interp, dtype),
  }
  for name, delegate in delegates.items():
    state = delegate.init()
    opt = jax.jit(lambda st, key, dg=delegate: robust.optimize_ranked(
        spec, dg, st, d0, spec.default_params, rcfg, key, ncandidates=4,
        nrepetitions=2, horizon_steps=t_steps, interp=interp))
    rets = []
    for k in jax.random.split(jax.random.key(2), 8):
      state, info = opt(state, k)
      rets.append(float(info['best_robust_score']))
    assert rets[-1] < rets[0], (name, rets)
    u = delegate.action(state, d0.time)
    assert np.all(np.isfinite(np.asarray(u))), name


def test_robust_delegate_config_key():
  """registry honors the `robust_delegate` MJCF custom numeric."""
  from mujoco_mpc_tpu.planners import cross_entropy
  from mujoco_mpc_tpu.planners import registry as preg

  import dataclasses
  spec = registry.get_task('ParticleFixed')
  spec = dataclasses.replace(spec,
                             config={**spec.config, 'robust_delegate': 5.0})
  t_steps = agent_mod.horizon_steps(spec)
  planner = preg.make_planner(spec, preg.ROBUST, num_samples=8,
                              horizon_steps=t_steps, num_points=5)
  state = planner.init()
  assert isinstance(state, cross_entropy.CEMState)
  d0 = make_data(spec.model, dtype=spec.model.qpos0.dtype)
  state, info = jax.jit(planner.optimize)(state, d0, spec.default_params,
                                          jax.random.key(0))
  assert np.isfinite(float(info['best_robust_score']))
