"""Robust planner: re-score top candidates under force perturbations.

TPU-native re-design of the reference RobustPlanner
(/root/reference/mjpc/planners/robust/robust_planner.cc:91-155), a decorator
over the sampling planner: take the top-N candidates, re-roll each with R
Ornstein-Uhlenbeck xfrc_applied perturbation repetitions (the reference's
NoisyRollout), average each candidate's return with its nominal score, and
pick the best average. The N x R grid is a single flattened vmap — the
scenario/repetition parallel axis from SURVEY.md §5.8 — and shards over a
mesh the same way the sample axis does.
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import rollout, sampling
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


def optimize(spec: TaskSpec, policy: sampling.SamplingPolicy, d0: Data,
             params: TaskParams, scfg: sampling.SamplingConfig,
             rcfg: RobustConfig, key: jax.Array, num_samples: int,
             ncandidates: int, nrepetitions: int, horizon_steps: int,
             interp: int) -> Tuple[sampling.SamplingPolicy, dict]:
  """One robust planning iteration."""
  k_sample, k_noise = jax.random.split(key)

  # phase 1: delegate candidate generation + scoring (sampling skeleton)
  nominal = sampling.resample_nominal(spec, policy, d0.time, horizon_steps,
                                      scfg, interp)
  candidates = sampling.sample_candidates(spec, nominal, num_samples, scfg,
                                          k_sample)
  returns = sampling.rollout_candidates(
      spec, d0, nominal.times, candidates, params, horizon_steps, scfg,
      interp)

  # top-N candidates
  neg_top, top_idx = jax.lax.top_k(-returns, ncandidates)
  top_values = candidates[top_idx]                  # (N, P, nu)
  top_scores = -neg_top                             # (N,)

  # phase 2: N x R noisy re-evaluations, flattened into one vmap
  keys = jax.random.split(k_noise, ncandidates * nrepetitions)
  rep_values = jnp.repeat(top_values, nrepetitions, axis=0)

  def one(values, k):
    acts = sampling.candidate_actions(nominal.times, values, horizon_steps,
                                      scfg.timestep, interp)
    return rollout.noisy_rollout_return(
        spec, d0, acts, params, k, rcfg.xfrc_std, rcfg.xfrc_rate)

  noisy_returns = jax.vmap(one)(rep_values, keys).reshape(
      ncandidates, nrepetitions)

  # average in the nominal score, ignoring failed rollouts
  valid = noisy_returns < rollout.MAX_RETURN_VALUE
  nvalid = jnp.sum(valid, axis=1)
  noisy_sum = jnp.sum(jnp.where(valid, noisy_returns, 0.0), axis=1)
  mean_return = (top_scores + noisy_sum) / (1.0 + nvalid)

  winner = jnp.argmin(mean_return)
  new_policy = sampling.SamplingPolicy(times=nominal.times,
                                       values=top_values[winner])
  info = {
      'best_return': top_scores[winner],
      'best_robust_score': mean_return[winner],
      'nominal_return': returns[0],
      'winner': top_idx[winner],
  }
  return new_policy, info
