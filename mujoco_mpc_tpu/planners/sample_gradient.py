"""Sample Gradient planner: random search + NES-style fitted gradient.

TPU-native re-design of the reference SampleGradientPlanner
(/root/reference/mjpc/planners/sample_gradient/planner.cc). Each iteration
evaluates [nominal, num_noisy-1 noisy candidates, num_gradient candidates
stepped along the previous iteration's fitted gradient with log-spaced step
sizes]; the winner is the argmin (nominal preferred on ties). The gradient
estimate uses NES fitness shaping (Wierstra et al., JMLR 2014): rank-based
utility weights over the noisy candidates applied to their noise vectors,
optionally blended with the previous gradient (gradient_filter).
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec


@struct.dataclass
class SGState:
  policy: sampling.SamplingPolicy
  gradient: jax.Array        # (P, nu) fitted gradient
  gradient_prev: jax.Array   # (P, nu)


@struct.dataclass
class SGConfig:
  noise_std: jax.Array
  gradient_filter: jax.Array    # reference default 1.0
  max_step: jax.Array           # reference: 2.0
  min_step: jax.Array           # reference: 1.0e-3
  timestep: jax.Array
  horizon_time: jax.Array


def default_config(spec: TaskSpec, dtype=jnp.float32) -> SGConfig:
  cfg = spec.config
  return SGConfig(
      noise_std=jnp.asarray(cfg.get('sampling_exploration', 0.1), dtype),
      gradient_filter=jnp.asarray(cfg.get('sample_gradient_filter', 1.0),
                                  dtype),
      max_step=jnp.asarray(2.0, dtype),
      min_step=jnp.asarray(1.0e-3, dtype),
      timestep=jnp.asarray(cfg.get('agent_timestep',
                                   float(spec.mj_model.opt.timestep)), dtype),
      horizon_time=jnp.asarray(cfg.get('agent_horizon', 1.0), dtype))


def default_state(spec: TaskSpec, num_points: int,
                  dtype=jnp.float32) -> SGState:
  policy = sampling.default_policy(spec, num_points, dtype=dtype)
  z = jnp.zeros((num_points, spec.model.nu), dtype=dtype)
  return SGState(policy=policy, gradient=z, gradient_prev=z)


def _fitness_weights(num_noisy: int, dtype) -> jax.Array:
  """NES utility weights by rank (lowest return = rank 0)."""
  f0 = np.log(0.5 * num_noisy + 1.0)
  u = np.maximum(0.0, f0 - np.log(np.arange(num_noisy) + 1.0))
  w = u / u.sum() - 1.0 / num_noisy
  return jnp.asarray(w, dtype=dtype)


def optimize(spec: TaskSpec, state: SGState, d0: Data, params: TaskParams,
             cfg: SGConfig, key: jax.Array, num_samples: int,
             num_gradient: int, horizon_steps: int,
             interp: int) -> Tuple[SGState, dict]:
  """One SampleGradient iteration."""
  num_gradient = min(num_gradient, num_samples - 1)
  num_noisy = num_samples - num_gradient
  dtype = state.policy.values.dtype

  scfg = sampling.SamplingConfig(
      noise_std=cfg.noise_std, noise_std2=jnp.zeros_like(cfg.noise_std),
      timestep=cfg.timestep, horizon_time=cfg.horizon_time)
  nominal = sampling.resample_nominal(spec, state.policy, d0.time,
                                      horizon_steps, scfg, interp)
  lo = spec.model.actuator_ctrlrange[:, 0]
  hi = spec.model.actuator_ctrlrange[:, 1]
  scale = 0.5 * (hi - lo)

  # noisy candidates: index 0 = nominal, 1..num_noisy-1 noisy
  eps = jax.random.normal(
      key, (num_noisy - 1,) + nominal.values.shape, dtype=dtype)
  noise = eps * cfg.noise_std * scale[None, None, :]
  noisy = jnp.concatenate([nominal.values[None],
                           nominal.values[None] + noise])

  # gradient candidates from the carried gradient state, log-spaced steps
  mixed_grad = (cfg.gradient_filter * state.gradient
                + (1.0 - cfg.gradient_filter) * state.gradient_prev)
  if num_gradient > 0:
    steps = jnp.logspace(jnp.log10(cfg.min_step), jnp.log10(cfg.max_step),
                         num_gradient, dtype=dtype)
    scaling = steps / jnp.maximum(cfg.noise_std, 1e-8)
    grad_cands = (nominal.values[None]
                  - scaling[:, None, None] * mixed_grad[None])
    candidates = jnp.concatenate([noisy, grad_cands])
  else:
    candidates = noisy
  candidates = jnp.clip(candidates, lo, hi)

  returns = sampling.rollout_candidates(
      spec, d0, nominal.times, candidates, params, horizon_steps, scfg,
      interp)

  # winner: argmin, nominal preferred unless strictly better
  best = jnp.argmin(returns)
  winner = jnp.where(returns[best] < returns[0], best, 0)

  # fit gradient from noisy candidate ranks (noise of candidate 0 is zero)
  noisy_noise = jnp.concatenate(
      [jnp.zeros((1,) + nominal.values.shape, dtype=dtype), noise])
  order = jnp.argsort(returns[:num_noisy])
  w = _fitness_weights(num_noisy, dtype)
  gradient = jnp.einsum('i,ipk->pk', w, noisy_noise[order]) / num_noisy

  new_state = SGState(
      policy=sampling.SamplingPolicy(times=nominal.times,
                                     values=candidates[winner]),
      gradient=gradient,
      gradient_prev=state.gradient)
  info = {
      'best_return': returns[winner],
      'nominal_return': returns[0],
      'winner': winner,
      'improvement': jnp.maximum(returns[0] - returns[winner], 0.0),
  }
  return new_state, info
