"""Robust planner: re-score top candidates under force perturbations.

TPU-native re-design of the reference RobustPlanner
(/root/reference/mjpc/planners/robust/robust_planner.cc:91-155), a
decorator over any RankedPlanner (planner.h:84-102): ask the delegate for
its top-N candidates, re-roll each with R Ornstein-Uhlenbeck xfrc_applied
perturbation repetitions (the reference's NoisyRollout), average each
candidate's return with its nominal score, and promote the best average
via the delegate's select(). The N x R grid is a single flattened vmap —
the scenario/repetition parallel axis from SURVEY.md §5.8 — and shards
over a mesh the same way the sample axis does.

The reference only ever instantiates the decorator over SamplingPlanner
(include.cc:48-49); here the delegate is any of the sampling family
(planners/ranked.py), selected per task by the `robust_delegate` MJCF
custom numeric.
"""

from __future__ import annotations

from typing import Any, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import ranked, rollout, sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec

# reference defaults (robust_planner.h:67-72)
DEFAULT_NCANDIDATES = 12
DEFAULT_NREPETITIONS = 5


@struct.dataclass
class RobustConfig:
  xfrc_std: jax.Array
  xfrc_rate: jax.Array


def default_config(spec: TaskSpec, dtype=jnp.float32) -> RobustConfig:
  cfg = spec.config
  return RobustConfig(
      xfrc_std=jnp.asarray(cfg.get('robust_xfrc', 0.2), dtype),
      xfrc_rate=jnp.asarray(cfg.get('robust_xfrc_rate', 0.1), dtype))


def optimize_ranked(spec: TaskSpec, delegate: ranked.RankedDelegate,
                    state: Any, d0: Data, params: TaskParams,
                    rcfg: RobustConfig, key: jax.Array, ncandidates: int,
                    nrepetitions: int, horizon_steps: int,
                    interp: int) -> Tuple[Any, dict]:
  """One robust planning iteration over any ranked delegate."""
  k_sample, k_noise = jax.random.split(key)

  # phase 1: the delegate produces its ranked top-N candidates
  rc = delegate.optimize_candidates(state, d0, params, k_sample, ncandidates)

  # phase 2: N x R noisy re-evaluations, flattened into one vmap
  keys = jax.random.split(k_noise, ncandidates * nrepetitions)
  rep_values = jnp.repeat(rc.values, nrepetitions, axis=0)

  def one(values, k):
    acts = sampling.candidate_actions(rc.times, values, horizon_steps,
                                      delegate.timestep, interp)
    return rollout.noisy_rollout_return(
        spec, d0, acts, params, k, rcfg.xfrc_std, rcfg.xfrc_rate)

  noisy_returns = jax.vmap(one)(rep_values, keys).reshape(
      ncandidates, nrepetitions)

  # average in the nominal score, ignoring failed rollouts
  valid = noisy_returns < rollout.MAX_RETURN_VALUE
  nvalid = jnp.sum(valid, axis=1)
  noisy_sum = jnp.sum(jnp.where(valid, noisy_returns, 0.0), axis=1)
  mean_return = (rc.scores + noisy_sum) / (1.0 + nvalid)

  winner = jnp.argmin(mean_return)
  new_state = delegate.select(rc, winner)
  info = {
      'best_return': rc.scores[winner],
      'best_robust_score': mean_return[winner],
      'nominal_return': rc.scores[0],
      'winner': winner,
  }
  return new_state, info


def optimize(spec: TaskSpec, policy: sampling.SamplingPolicy, d0: Data,
             params: TaskParams, scfg: sampling.SamplingConfig,
             rcfg: RobustConfig, key: jax.Array, num_samples: int,
             ncandidates: int, nrepetitions: int, horizon_steps: int,
             interp: int) -> Tuple[sampling.SamplingPolicy, dict]:
  """Robust-over-Sampling (the reference's instantiation)."""
  delegate = ranked.make_sampling_delegate(
      spec, scfg, num_samples, policy.times.shape[0], horizon_steps, interp,
      dtype=policy.values.dtype)
  return optimize_ranked(spec, delegate, policy, d0, params, rcfg, key,
                         ncandidates, nrepetitions, horizon_steps, interp)
