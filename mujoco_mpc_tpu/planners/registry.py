"""Planner registry: uniform interface over all seven planners.

Analog of the reference's LoadPlanners registry
(/root/reference/mjpc/planners/include.cc:30-53) with the same ordering:
0 Sampling, 1 Gradient, 2 iLQG, 3 iLQS, 4 Robust Sampling, 5 Cross Entropy,
6 Sample Gradient. Each planner is wrapped as a pair of pure functions over
an opaque pytree state:

    init(spec, num_points, horizon_steps, dtype) -> state
    optimize(spec, state, d0, params, key) -> (state, info)
    action(spec, state, qpos, qvel, act, time) -> (nu,)

so the Agent, gRPC services and benchmarks dispatch by planner id without
caring about policy representations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.planners import (cross_entropy, gradient_planner, ilqg,
                                     ilqs, ranked, robust, sample_gradient,
                                     sampling)
from mujoco_mpc_tpu.tasks.base import TaskSpec

PLANNER_NAMES = ('Sampling', 'Gradient', 'iLQG', 'iLQS', 'Robust Sampling',
                 'Cross Entropy', 'Sample Gradient')

SAMPLING, GRADIENT, ILQG, ILQS, ROBUST, CEM, SAMPLE_GRADIENT = range(7)


@dataclasses.dataclass(frozen=True)
class PlannerDef:
  init: Callable[..., Any]
  optimize: Callable[..., Tuple[Any, dict]]
  action: Callable[..., jax.Array]
  # action without feedback terms (reference GetAction nominal_action,
  # agent.proto:108-111); differs from `action` only for feedback
  # planners (iLQG / iLQS)
  nominal_action: Callable[..., jax.Array] = None


def make_planner(spec: TaskSpec, planner_id: int, num_samples: int,
                 horizon_steps: int, num_points: int,
                 interp: int = spline.Interp.ZERO,
                 dtype=jnp.float32) -> PlannerDef:
  """Build the uniform interface for one planner on one task."""
  interp = int(interp)

  if planner_id == SAMPLING:
    cfg = sampling.default_config(spec, dtype)

    def init():
      return sampling.default_policy(spec, num_points, dtype)

    def optimize(state, d0, params, key):
      return sampling.optimize(spec, state, d0, params, cfg, key,
                               num_samples, horizon_steps, interp)

    def action(state, qpos, qvel, act, time):
      return sampling.action_from_policy(spec, state, time, interp)

  elif planner_id == GRADIENT:
    cfg = gradient_planner.default_config(spec, dtype)

    def init():
      return sampling.default_policy(spec, num_points, dtype)

    def optimize(state, d0, params, key):
      return gradient_planner.optimize(spec, state, d0, params, cfg,
                                       num_samples, horizon_steps, interp)

    def action(state, qpos, qvel, act, time):
      return sampling.action_from_policy(spec, state, time, interp)

  elif planner_id == ILQG:
    cfg = ilqg.default_config(spec, dtype)

    def init():
      return ilqg.default_state(spec, horizon_steps, dtype)

    def optimize(state, d0, params, key):
      return ilqg.optimize(spec, state, d0, params, cfg, num_samples,
                           horizon_steps)

    def action(state, qpos, qvel, act, time):
      return ilqg.action_from_policy(spec, state.policy, qpos, qvel, act,
                                     time)

    def nominal_action(state, qpos, qvel, act, time):
      return ilqg.nominal_action_from_policy(spec, state.policy, time)

  elif planner_id == ILQS:
    scfg = sampling.default_config(spec, dtype)
    icfg = ilqg.default_config(spec, dtype)

    def init():
      return ilqs.default_state(spec, num_points, horizon_steps, dtype)

    def optimize(state, d0, params, key):
      return ilqs.optimize(spec, state, d0, params, scfg, icfg, key,
                           num_samples, max(num_samples // 4, 4),
                           horizon_steps, interp)

    def action(state, qpos, qvel, act, time):
      return ilqs.action_from_policy(spec, state, qpos, qvel, act, time,
                                     interp)

    def nominal_action(state, qpos, qvel, act, time):
      return ilqs.nominal_action_from_policy(spec, state, time, interp)

  elif planner_id == ROBUST:
    # decorator over any RankedPlanner (reference planner.h:84-102); the
    # delegate family comes from the `robust_delegate` MJCF custom numeric
    # (0 Sampling — the reference's instantiation, include.cc:48-49 —
    # 5 Cross Entropy, 6 Sample Gradient)
    rcfg = robust.default_config(spec, dtype)
    delegate_id = int(spec.config.get('robust_delegate', SAMPLING))
    if delegate_id == CEM:
      delegate = ranked.make_cem_delegate(
          spec, cross_entropy.default_config(spec, dtype), num_samples,
          num_points, horizon_steps, interp, dtype)
    elif delegate_id == SAMPLE_GRADIENT:
      delegate = ranked.make_sample_gradient_delegate(
          spec, sample_gradient.default_config(spec, dtype), num_samples,
          min(8, max(num_samples // 8, 1)), num_points, horizon_steps,
          interp, dtype)
    else:
      delegate = ranked.make_sampling_delegate(
          spec, sampling.default_config(spec, dtype), num_samples,
          num_points, horizon_steps, interp, dtype)

    def init():
      return delegate.init()

    def optimize(state, d0, params, key):
      return robust.optimize_ranked(
          spec, delegate, state, d0, params, rcfg, key,
          min(robust.DEFAULT_NCANDIDATES, num_samples),
          robust.DEFAULT_NREPETITIONS, horizon_steps, interp)

    def action(state, qpos, qvel, act, time):
      return delegate.action(state, time)

  elif planner_id == CEM:
    cfg = cross_entropy.default_config(spec, dtype)

    def init():
      return cross_entropy.default_state(spec, num_points, cfg, dtype)

    def optimize(state, d0, params, key):
      return cross_entropy.optimize(
          spec, state, d0, params, cfg, key, num_samples,
          max(num_samples // 10, 2), horizon_steps, interp)

    def action(state, qpos, qvel, act, time):
      return cross_entropy.action_from_policy(spec, state, time, interp)

  elif planner_id == SAMPLE_GRADIENT:
    cfg = sample_gradient.default_config(spec, dtype)

    def init():
      return sample_gradient.default_state(spec, num_points, dtype)

    def optimize(state, d0, params, key):
      return sample_gradient.optimize(
          spec, state, d0, params, cfg, key, num_samples,
          min(8, max(num_samples // 8, 1)), horizon_steps, interp)

    def action(state, qpos, qvel, act, time):
      return sampling.action_from_policy(spec, state.policy, time, interp)

  else:
    raise ValueError(f'unknown planner id {planner_id}')

  nom = nominal_action if planner_id in (ILQG, ILQS) else action
  return PlannerDef(init=init, optimize=optimize, action=action,
                    nominal_action=nom)
