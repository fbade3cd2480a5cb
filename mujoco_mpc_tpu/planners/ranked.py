"""RankedPlanner abstraction: multi-candidate planners behind one surface.

TPU-native analog of the reference's RankedPlanner ABC
(/root/reference/mjpc/planners/planner.h:84-102): a planner that can
produce its top-N ranked candidate policies (OptimizePolicyCandidates),
score them (CandidateScore) and promote any candidate to the nominal
policy (CopyCandidateToPolicy). The reference instantiates RobustPlanner
only over SamplingPlanner (include.cc:48-49); here every sampling-family
planner (Sampling, Cross Entropy, Sample Gradient) exposes the ranked
surface, so the Robust decorator (planners/robust.py) wraps any of them.

Functional design: a delegate is a frozen bundle of pure functions over
an opaque planner-state pytree. `optimize_candidates` returns the ranked
candidates plus an opaque `aux` that `select` consumes to rebuild the
delegate's full state around a chosen winner (the carried CEM variance /
SampleGradient gradient survive the promotion, matching the reference's
planner-owned candidate buffers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import cross_entropy, sample_gradient, sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec


class RankedCandidates(NamedTuple):
  """Top-N candidates, ranked best (lowest return) first."""
  times: jax.Array    # (P,) shared knot times
  values: jax.Array   # (N, P, nu) candidate knot values
  scores: jax.Array   # (N,) returns, ascending
  aux: Any            # opaque state for select()


@dataclasses.dataclass(frozen=True)
class RankedDelegate:
  """Pure-function RankedPlanner surface (planner.h:84-102)."""
  init: Callable[[], Any]
  # (state, d0, params, key, ncandidates) -> RankedCandidates
  optimize_candidates: Callable[..., RankedCandidates]
  # (candidates, winner_index) -> new planner state
  select: Callable[[RankedCandidates, jax.Array], Any]
  # (state, time) -> (nu,) spline-policy action
  action: Callable[..., jax.Array]
  timestep: jax.Array


def _rank(returns: jax.Array, ncandidates: int):
  neg_top, idx = jax.lax.top_k(-returns, ncandidates)
  return -neg_top, idx


def make_sampling_delegate(spec: TaskSpec, cfg: sampling.SamplingConfig,
                           num_samples: int, num_points: int,
                           horizon_steps: int, interp: int,
                           dtype=jnp.float32) -> RankedDelegate:
  """Predictive Sampling as a RankedPlanner
  (reference: sampling/planner.cc:151-187 OptimizePolicyCandidates)."""

  def init():
    return sampling.default_policy(spec, num_points, dtype)

  def optimize_candidates(state, d0: Data, params: TaskParams,
                          key: jax.Array,
                          ncandidates: int) -> RankedCandidates:
    nominal = sampling.resample_nominal(spec, state, d0.time, horizon_steps,
                                        cfg, interp)
    candidates = sampling.sample_candidates(spec, nominal, num_samples, cfg,
                                            key)
    returns = sampling.rollout_candidates(
        spec, d0, nominal.times, candidates, params, horizon_steps, cfg,
        interp)
    scores, idx = _rank(returns, ncandidates)
    return RankedCandidates(times=nominal.times, values=candidates[idx],
                            scores=scores, aux=None)

  def select(rc: RankedCandidates, winner: jax.Array):
    return sampling.SamplingPolicy(times=rc.times, values=rc.values[winner])

  def action(state, time):
    return sampling.action_from_policy(spec, state, time, interp)

  return RankedDelegate(init=init, optimize_candidates=optimize_candidates,
                        select=select, action=action, timestep=cfg.timestep)


def make_cem_delegate(spec: TaskSpec, cfg: cross_entropy.CEMConfig,
                      num_samples: int, num_points: int, horizon_steps: int,
                      interp: int, dtype=jnp.float32) -> RankedDelegate:
  """CEM as a RankedPlanner: the elites are the ranked candidates; the
  per-knot variance refit from them is carried through select() so the
  decorated planner keeps CEM's adaptive exploration."""

  def init():
    return cross_entropy.default_state(spec, num_points, cfg, dtype)

  def optimize_candidates(state, d0, params, key, ncandidates):
    scfg = sampling.SamplingConfig(
        noise_std=cfg.std_initial,
        noise_std2=jnp.zeros_like(cfg.std_initial),
        timestep=cfg.timestep, horizon_time=cfg.horizon_time)
    nominal = sampling.resample_nominal(spec, state.policy, d0.time,
                                        horizon_steps, scfg, interp)
    lo = spec.model.actuator_ctrlrange[:, 0]
    hi = spec.model.actuator_ctrlrange[:, 1]
    std = jnp.maximum(jnp.sqrt(state.variance), cfg.std_min)
    eps = jax.random.normal(key, (num_samples,) + nominal.values.shape,
                            dtype=nominal.values.dtype)
    candidates = jnp.clip(nominal.values[None] + eps * std[None], lo, hi)
    returns = sampling.rollout_candidates(
        spec, d0, nominal.times, candidates, params, horizon_steps, scfg,
        interp)
    scores, idx = _rank(returns, ncandidates)
    elites = candidates[idx]
    elite_mean = jnp.mean(elites, axis=0)
    elite_var = (jnp.sum((elites - elite_mean[None]) ** 2, axis=0)
                 / max(ncandidates - 1, 1))
    return RankedCandidates(times=nominal.times, values=elites,
                            scores=scores, aux=elite_var)

  def select(rc: RankedCandidates, winner: jax.Array):
    return cross_entropy.CEMState(
        policy=sampling.SamplingPolicy(times=rc.times,
                                       values=rc.values[winner]),
        variance=rc.aux)

  def action(state, time):
    return cross_entropy.action_from_policy(spec, state, time, interp)

  return RankedDelegate(init=init, optimize_candidates=optimize_candidates,
                        select=select, action=action, timestep=cfg.timestep)


def make_sample_gradient_delegate(spec: TaskSpec,
                                  cfg: sample_gradient.SGConfig,
                                  num_samples: int, num_gradient: int,
                                  num_points: int, horizon_steps: int,
                                  interp: int,
                                  dtype=jnp.float32) -> RankedDelegate:
  """SampleGradient as a RankedPlanner: noisy + gradient candidates are
  ranked together; the NES-fitted gradient is carried through select()."""

  def init():
    return sample_gradient.default_state(spec, num_points, dtype)

  def optimize_candidates(state, d0, params, key, ncandidates):
    ng = min(num_gradient, num_samples - 1)
    num_noisy = num_samples - ng
    scfg = sampling.SamplingConfig(
        noise_std=cfg.noise_std, noise_std2=jnp.zeros_like(cfg.noise_std),
        timestep=cfg.timestep, horizon_time=cfg.horizon_time)
    nominal = sampling.resample_nominal(spec, state.policy, d0.time,
                                        horizon_steps, scfg, interp)
    lo = spec.model.actuator_ctrlrange[:, 0]
    hi = spec.model.actuator_ctrlrange[:, 1]
    scale = 0.5 * (hi - lo)
    eps = jax.random.normal(
        key, (num_noisy - 1,) + nominal.values.shape,
        dtype=nominal.values.dtype)
    noise = eps * cfg.noise_std * scale[None, None, :]
    noisy = jnp.concatenate([nominal.values[None],
                             nominal.values[None] + noise])
    mixed_grad = (cfg.gradient_filter * state.gradient
                  + (1.0 - cfg.gradient_filter) * state.gradient_prev)
    if ng > 0:
      steps = jnp.logspace(jnp.log10(cfg.min_step), jnp.log10(cfg.max_step),
                           ng, dtype=nominal.values.dtype)
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
    # refit the carried gradient exactly as the plain optimizer does
    noisy_noise = jnp.concatenate(
        [jnp.zeros((1,) + nominal.values.shape,
                   dtype=nominal.values.dtype), noise])
    order = jnp.argsort(returns[:num_noisy])
    w = sample_gradient._fitness_weights(num_noisy, nominal.values.dtype)
    gradient = jnp.einsum('i,ipk->pk', w, noisy_noise[order]) / num_noisy
    scores, idx = _rank(returns, ncandidates)
    return RankedCandidates(times=nominal.times, values=candidates[idx],
                            scores=scores,
                            aux=(gradient, state.gradient))

  def select(rc: RankedCandidates, winner: jax.Array):
    gradient, gradient_prev = rc.aux
    return sample_gradient.SGState(
        policy=sampling.SamplingPolicy(times=rc.times,
                                       values=rc.values[winner]),
        gradient=gradient, gradient_prev=gradient_prev)

  def action(state, time):
    return sampling.action_from_policy(spec, state.policy, time, interp)

  return RankedDelegate(init=init, optimize_candidates=optimize_candidates,
                        select=select, action=action, timestep=cfg.timestep)
