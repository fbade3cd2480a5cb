"""Predictive Sampling planner: batched noisy-spline search.

TPU-native re-design of the reference SamplingPlanner
(/root/reference/mjpc/planners/sampling/planner.cc). The reference fans
K <= 128 rollouts over a ThreadPool and partial_sorts returns; here K noisy
spline candidates are a vmap axis (thousands per chip) and the winner is an
argmin — or a cross-device argmin collective when the sample axis is sharded
over a mesh (see parallel/sharded.py).

Matched semantics:
  * nominal plan is resampled onto fresh knot times starting at the current
    time each iteration (UpdateNominalPolicy, planner.cc:283-305);
  * noise std is scaled per actuator by half the ctrlrange width, with an
    optional second std used with probability 0.2 (AddNoiseToPolicy,
    planner.cc:313-339);
  * candidates are clamped to ctrlrange; candidate 0 is the nominal;
  * improvement is judged on the winner's return (planner.cc:190-208).
"""

from __future__ import annotations

from typing import Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import rollout
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec

# hardcoded proportion of samples drawn with the second std
# (reference: sampling/planner.cc:322)
STD2_PROPORTION = 0.2


@struct.dataclass
class SamplingPolicy:
  """Spline control plan (fixed knot count)."""
  times: jax.Array   # (P,)
  values: jax.Array  # (P, nu)


@struct.dataclass
class SamplingConfig:
  """Planner hyperparameters as leaves (tunable without recompile)."""
  noise_std: jax.Array        # primary exploration std
  noise_std2: jax.Array       # second std of the mixture (0 = disabled)
  timestep: jax.Array         # planning timestep
  horizon_time: jax.Array     # planning duration (seconds)


def default_policy(spec: TaskSpec, num_points: int,
                   dtype=jnp.float32) -> SamplingPolicy:
  """Initial plan: home-keyframe ctrl if defined, else zeros."""
  nu = spec.model.nu
  if 'home' in spec.model.keyframe_names:
    k = spec.model.keyframe_names.index('home')
    u0 = spec.model.key_ctrl[k].astype(dtype)
  else:
    u0 = jnp.zeros(nu, dtype=dtype)
  return SamplingPolicy(
      times=jnp.linspace(0.0, 1.0, num_points).astype(dtype),
      values=jnp.tile(u0, (num_points, 1)))


def default_config(spec: TaskSpec, dtype=jnp.float32) -> SamplingConfig:
  cfg = spec.config
  return SamplingConfig(
      noise_std=jnp.asarray(cfg.get('sampling_exploration', 0.1), dtype),
      noise_std2=jnp.asarray(0.0, dtype),
      timestep=jnp.asarray(cfg.get('agent_timestep',
                                   float(spec.mj_model.opt.timestep)), dtype),
      horizon_time=jnp.asarray(cfg.get('agent_horizon', 1.0), dtype))


def action_from_policy(spec: TaskSpec, policy: SamplingPolicy,
                       time: jax.Array, interp: int) -> jax.Array:
  """Sample + clamp (reference: SamplingPolicy::Action)."""
  u = spline.sample(policy.times, policy.values, time, interp)
  lo = spec.model.actuator_ctrlrange[:, 0]
  hi = spec.model.actuator_ctrlrange[:, 1]
  return jnp.clip(u, lo, hi)


def resample_nominal(spec: TaskSpec, policy: SamplingPolicy, time: jax.Array,
                     horizon_steps: int, cfg: SamplingConfig,
                     interp: int) -> SamplingPolicy:
  """Resample the plan onto fresh knots starting at `time`."""
  num_points = policy.times.shape[0]
  horizon_time = (horizon_steps - 1) * cfg.timestep
  new_times = spline.knot_times(time, horizon_time, num_points, interp)
  new_values = spline.resample(policy.times, policy.values, new_times, interp)
  return SamplingPolicy(times=new_times, values=new_values)


def sample_candidates(spec: TaskSpec, nominal: SamplingPolicy,
                      num_samples: int, cfg: SamplingConfig,
                      key: jax.Array) -> jax.Array:
  """(num_samples+1, P, nu) candidate knot values; index 0 = nominal."""
  nu = spec.model.nu
  p = nominal.times.shape[0]
  lo = spec.model.actuator_ctrlrange[:, 0]
  hi = spec.model.actuator_ctrlrange[:, 1]
  scale = 0.5 * (hi - lo)  # (nu,)

  k_noise, k_mix = jax.random.split(key)
  eps = jax.random.normal(k_noise, (num_samples, p, nu),
                          dtype=nominal.values.dtype)
  # optional two-std mixture, chosen per candidate
  use2 = jnp.logical_and(
      cfg.noise_std2 > 0,
      jax.random.bernoulli(k_mix, STD2_PROPORTION, (num_samples,)))
  std = jnp.where(use2, cfg.noise_std2, cfg.noise_std)  # (num_samples,)
  noise = eps * std[:, None, None] * scale[None, None, :]

  candidates = jnp.concatenate(
      [nominal.values[None], nominal.values[None] + noise])
  return jnp.clip(candidates, lo, hi)


def sample_candidates_slice(spec: TaskSpec, nominal: SamplingPolicy,
                            num_samples: int, cfg: SamplingConfig,
                            key: jax.Array, start: jax.Array,
                            n_local: int) -> jax.Array:
  """(n_local+1, P, nu): the nominal plus the contiguous noise-candidate
  slice [start, start+n_local) of the EXACT stream sample_candidates draws
  from `key` — every shard regenerates the full (tiny) noise tensor and
  slices, so sharded planning is bit-identical to single-device planning
  (parallel/sharded.py seed-exactness)."""
  full = sample_candidates(spec, nominal, num_samples, cfg, key)
  local = jax.lax.dynamic_slice_in_dim(full, 1 + start, n_local, 0)
  return jnp.concatenate([full[:1], local])


def candidate_actions(times: jax.Array, values: jax.Array,
                      horizon_steps: int, timestep: jax.Array,
                      interp: int) -> jax.Array:
  """Expand knots to a (T, nu) action sequence on the rollout grid, with the
  last action repeated (reference: trajectory.cc:283-291)."""
  t0 = times[0]
  steps = jnp.arange(horizon_steps, dtype=times.dtype)
  ts = t0 + steps * timestep
  acts = spline.sample_many(times, values, ts, interp)
  if horizon_steps > 1:
    acts = acts.at[-1].set(acts[-2])
  return acts


def rollout_candidates(spec: TaskSpec, d0: Data, times: jax.Array,
                       candidates: jax.Array, params: TaskParams,
                       horizon_steps: int, cfg: SamplingConfig,
                       interp: int) -> jax.Array:
  """Returns (num_candidates,) total returns for all candidates (vmap)."""
  acts = jax.vmap(lambda values: candidate_actions(
      times, values, horizon_steps, cfg.timestep, interp))(candidates)
  return rollout.batched_returns(spec, d0, acts, params)


def optimize(spec: TaskSpec, policy: SamplingPolicy, d0: Data,
             params: TaskParams, cfg: SamplingConfig, key: jax.Array,
             num_samples: int, horizon_steps: int,
             interp: int) -> Tuple[SamplingPolicy, dict]:
  """One OptimizePolicy iteration (reference: planner.cc:190-208)."""
  nominal = resample_nominal(spec, policy, d0.time, horizon_steps, cfg,
                             interp)
  candidates = sample_candidates(spec, nominal, num_samples, cfg, key)
  returns = rollout_candidates(spec, d0, nominal.times, candidates, params,
                               horizon_steps, cfg, interp)
  winner = jnp.argmin(returns)
  new_policy = SamplingPolicy(times=nominal.times,
                              values=candidates[winner])
  info = {
      'returns': returns,
      'winner': winner,
      'best_return': returns[winner],
      'nominal_return': returns[0],
      'improvement': jnp.maximum(returns[0] - returns[winner], 0.0),
  }
  return new_policy, info
