"""Gradient (Pontryagin) planner: adjoint sweep + log-spaced line search.

TPU-native re-design of the reference GradientPlanner
(/root/reference/mjpc/planners/gradient/planner.cc, gradient.cc). The
backward adjoint recursion Vx_t = cx_t + A_t' Vx_{t+1}, Qu_t = cu_t +
B_t' Vx_{t+1} is a lax.scan in reverse; the per-step action gradient is
mapped to spline-knot space through the (transposed) spline mapping matrix
— a dense matmul — and the candidate set is a log-spaced line search
[1.0 .. min_step] plus a zero step, evaluated as batched rollouts.
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import derivatives, rollout, sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec

# reference: gradient/settings.h:23
MIN_LINESEARCH_STEP = 1.0e-8


@struct.dataclass
class GradientConfig:
  timestep: jax.Array
  horizon_time: jax.Array


def default_config(spec: TaskSpec, dtype=jnp.float32) -> GradientConfig:
  cfg = spec.config
  return GradientConfig(
      timestep=jnp.asarray(cfg.get('agent_timestep',
                                   float(spec.mj_model.opt.timestep)), dtype),
      horizon_time=jnp.asarray(cfg.get('agent_horizon', 1.0), dtype))


def adjoint_sweep(derivs: derivatives.Derivatives):
  """Backward sweep -> per-step action gradient Qu (T-1, nu) and dV."""
  a, b, cx, cu = derivs.a, derivs.b, derivs.cx, derivs.cu

  def body(vx, inp):
    at, bt, cxt, cut = inp
    qu = cut + bt.T @ vx
    vx_new = cxt + at.T @ vx
    return vx_new, qu

  _, qu = jax.lax.scan(
      body, cx[-1], (a, b, cx[:-1], cu[:-1]), reverse=True)
  k = -qu                                  # action improvement
  dv = jnp.sum(k * qu)
  return qu, k, dv


def optimize(spec: TaskSpec, policy: sampling.SamplingPolicy, d0: Data,
             params: TaskParams, cfg: GradientConfig, num_candidates: int,
             horizon_steps: int,
             interp: int) -> Tuple[sampling.SamplingPolicy, dict]:
  """One gradient-descent planning iteration."""
  scfg = sampling.SamplingConfig(
      noise_std=jnp.zeros((), dtype=policy.values.dtype),
      noise_std2=jnp.zeros((), dtype=policy.values.dtype),
      timestep=cfg.timestep, horizon_time=cfg.horizon_time)
  nominal = sampling.resample_nominal(spec, policy, d0.time, horizon_steps,
                                      scfg, interp)

  # nominal rollout + derivatives
  actions = sampling.candidate_actions(nominal.times, nominal.values,
                                       horizon_steps, cfg.timestep, interp)
  traj = derivatives.nominal_trajectory(spec, d0, actions, params)
  derivs = derivatives.compute(spec, d0, traj, params)
  qu, k, dv = adjoint_sweep(derivs)

  # map per-step action improvement to spline knots: update = M^T k
  rollout_times = traj.time[:-1]
  mapping = derivatives.spline_mapping(nominal.times, rollout_times, interp)
  update = mapping.T @ k                      # (P, nu)

  # log-spaced line search, last candidate = zero step (nominal)
  steps = jnp.concatenate([
      jnp.logspace(0.0, jnp.log10(MIN_LINESEARCH_STEP),
                   num_candidates - 1, dtype=update.dtype),
      jnp.zeros(1, dtype=update.dtype)])
  lo = spec.model.actuator_ctrlrange[:, 0]
  hi = spec.model.actuator_ctrlrange[:, 1]
  candidates = jnp.clip(nominal.values[None]
                        + steps[:, None, None] * update[None], lo, hi)

  returns = sampling.rollout_candidates(
      spec, d0, nominal.times, candidates, params, horizon_steps, scfg,
      interp)
  winner = jnp.argmin(returns)
  nominal_return = returns[-1]

  new_policy = sampling.SamplingPolicy(times=nominal.times,
                                       values=candidates[winner])
  info = {
      'best_return': returns[winner],
      'nominal_return': nominal_return,
      'improvement': jnp.maximum(nominal_return - returns[winner], 0.0),
      'action_step': steps[winner],
      'expected': -steps[winner] * dv - 1.0e-16,
      'qu_norm': jnp.linalg.norm(qu),
  }
  return new_policy, info
