"""Cross-Entropy Method planner.

TPU-native re-design of the reference CrossEntropyPlanner
(/root/reference/mjpc/planners/cross_entropy/planner.cc:164-283). Candidates
are noisy spline plans sampled around the resampled nominal with a PER-KNOT
standard deviation carried across iterations; the new nominal is the mean of
the n_elite best candidates and the per-knot variance is refit from the
elites (floored at std_min). Elite selection uses top_k instead of
partial_sort; elite mean/variance are batched reductions that become psum
collectives when the sample axis is sharded.
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec


@struct.dataclass
class CEMState:
  policy: sampling.SamplingPolicy
  variance: jax.Array   # (P, nu) per-knot sampling variance


@struct.dataclass
class CEMConfig:
  std_initial: jax.Array   # initial sampling std
  std_min: jax.Array       # minimum allowed std (reference default 0.1)
  timestep: jax.Array
  horizon_time: jax.Array


def default_config(spec: TaskSpec, dtype=jnp.float32) -> CEMConfig:
  cfg = spec.config
  return CEMConfig(
      std_initial=jnp.asarray(cfg.get('sampling_exploration', 0.1), dtype),
      std_min=jnp.asarray(cfg.get('std_min', 0.1), dtype),
      timestep=jnp.asarray(cfg.get('agent_timestep',
                                   float(spec.mj_model.opt.timestep)), dtype),
      horizon_time=jnp.asarray(cfg.get('agent_horizon', 1.0), dtype))


def default_state(spec: TaskSpec, num_points: int, cfg: CEMConfig,
                  dtype=jnp.float32) -> CEMState:
  policy = sampling.default_policy(spec, num_points, dtype=dtype)
  var = jnp.full((num_points, spec.model.nu),
                 cfg.std_initial ** 2, dtype=dtype)
  return CEMState(policy=policy, variance=var)


def optimize(spec: TaskSpec, state: CEMState, d0: Data, params: TaskParams,
             cfg: CEMConfig, key: jax.Array, num_samples: int,
             n_elite: int, horizon_steps: int,
             interp: int) -> Tuple[CEMState, dict]:
  """One CEM iteration."""
  n_elite = min(n_elite, num_samples)
  scfg = sampling.SamplingConfig(
      noise_std=cfg.std_initial, noise_std2=jnp.zeros_like(cfg.std_initial),
      timestep=cfg.timestep, horizon_time=cfg.horizon_time)
  nominal = sampling.resample_nominal(spec, state.policy, d0.time,
                                      horizon_steps, scfg, interp)

  # sample noise with per-knot std (floored), ALL candidates are noisy
  # (reference Rollouts adds noise to every candidate)
  lo = spec.model.actuator_ctrlrange[:, 0]
  hi = spec.model.actuator_ctrlrange[:, 1]
  std = jnp.maximum(jnp.sqrt(state.variance), cfg.std_min)
  eps = jax.random.normal(key, (num_samples,) + nominal.values.shape,
                          dtype=nominal.values.dtype)
  candidates = jnp.clip(nominal.values[None] + eps * std[None], lo, hi)

  returns = sampling.rollout_candidates(
      spec, d0, nominal.times, candidates, params, horizon_steps, scfg,
      interp)

  # elites: n_elite lowest returns
  neg_top, elite_idx = jax.lax.top_k(-returns, n_elite)
  elites = candidates[elite_idx]                       # (n_elite, P, nu)
  elite_mean = jnp.mean(elites, axis=0)
  elite_var = jnp.sum((elites - elite_mean[None]) ** 2, axis=0) / max(
      n_elite - 1, 1)
  avg_return = jnp.mean(-neg_top)

  new_state = CEMState(
      policy=sampling.SamplingPolicy(times=nominal.times, values=elite_mean),
      variance=elite_var)
  info = {
      'best_return': -neg_top[0],
      'elite_avg_return': avg_return,
      'improvement': jnp.maximum(avg_return - (-neg_top[0]), 0.0),
  }
  return new_state, info


def action_from_policy(spec: TaskSpec, state: CEMState, time: jax.Array,
                       interp: int) -> jax.Array:
  u = spline.sample(state.policy.times, state.policy.values, time, interp)
  lo = spec.model.actuator_ctrlrange[:, 0]
  hi = spec.model.actuator_ctrlrange[:, 1]
  return jnp.clip(u, lo, hi)
