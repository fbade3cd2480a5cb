"""iLQS planner: sampling / iLQG hybrid.

TPU-native re-design of the reference iLQSPlanner
(/root/reference/mjpc/planners/ilqs/planner.cc:87-240). Each iteration first
tries predictive sampling; if a noisy candidate beat the nominal, sampling
wins and iLQG is skipped (lax.cond keeps the runtime cost of the untaken
branch at zero). Otherwise iLQG runs, seeded with the active policy's
nominal. Representation conversions:

  * iLQG trajectory -> spline: least-squares fit of knot values through the
    spline mapping pseudo-inverse (planner.cc:113-169, (M'M)^{-1} M' a);
  * spline -> iLQG: expand knots to the action grid, roll out open loop
    (zero feedback gains).
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import derivatives, ilqg, sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec

ACTIVE_SAMPLING = 0
ACTIVE_ILQG = 1


@struct.dataclass
class ILQSState:
  sampling_policy: sampling.SamplingPolicy
  ilqg_state: ilqg.ILQGState
  active: jax.Array   # 0 = sampling, 1 = iLQG


def default_state(spec: TaskSpec, num_points: int, horizon_steps: int,
                  dtype=jnp.float32) -> ILQSState:
  return ILQSState(
      sampling_policy=sampling.default_policy(spec, num_points, dtype=dtype),
      ilqg_state=ilqg.default_state(spec, horizon_steps, dtype=dtype),
      active=jnp.asarray(ACTIVE_SAMPLING, jnp.int32))


def _trajectory_to_spline(spec: TaskSpec, policy: ilqg.ILQGPolicy,
                          num_points: int, horizon_steps: int,
                          timestep: jax.Array,
                          interp: int) -> sampling.SamplingPolicy:
  """Least-squares spline fit of the iLQG nominal actions."""
  t0 = policy.times[0]
  horizon_time = (horizon_steps - 1) * timestep
  knot_t = spline.knot_times(t0, horizon_time, num_points, interp)
  mapping = derivatives.spline_mapping(knot_t, policy.times[:-1], interp)
  mtm = mapping.T @ mapping + 1e-8 * jnp.eye(num_points,
                                             dtype=mapping.dtype)
  values = jnp.linalg.solve(mtm, mapping.T @ policy.actions[:-1])
  lo = spec.model.actuator_ctrlrange[:, 0]
  hi = spec.model.actuator_ctrlrange[:, 1]
  return sampling.SamplingPolicy(times=knot_t,
                                 values=jnp.clip(values, lo, hi))


def optimize(spec: TaskSpec, state: ILQSState, d0: Data, params: TaskParams,
             scfg: sampling.SamplingConfig, icfg: ilqg.ILQGConfig,
             key: jax.Array, num_samples: int, num_ilqg_candidates: int,
             horizon_steps: int,
             interp: int) -> Tuple[ILQSState, dict]:
  """One iLQS iteration."""
  num_points = state.sampling_policy.times.shape[0]

  # sampling nominal: active plan, converting from iLQG if needed
  converted = _trajectory_to_spline(
      spec, state.ilqg_state.policy, num_points, horizon_steps,
      scfg.timestep, interp)
  nominal = jax.tree.map(
      lambda s, c: jnp.where(state.active == ACTIVE_SAMPLING, s, c),
      state.sampling_policy, converted)

  pol_s, info_s = sampling.optimize(
      spec, nominal, d0, params, scfg, key, num_samples, horizon_steps,
      interp)
  sampling_improved = jnp.logical_and(
      info_s['winner'] > 0,
      info_s['best_return'] < info_s['nominal_return'])

  # seed iLQG with the active nominal: replace its plan by the sampling
  # nominal when sampling was active (open loop, zero gains)
  def seeded_ilqg_state():
    acts = sampling.candidate_actions(nominal.times, nominal.values,
                                      horizon_steps, scfg.timestep, interp)
    traj = derivatives.nominal_trajectory(spec, d0, acts, params)
    pol = state.ilqg_state.policy.replace(
        times=traj.time, qpos=traj.qpos, qvel=traj.qvel, act=traj.act,
        actions=acts,
        feedback_gain=jnp.zeros_like(state.ilqg_state.policy.feedback_gain),
        action_improvement=jnp.zeros_like(
            state.ilqg_state.policy.action_improvement))
    return state.ilqg_state.replace(policy=pol)

  ilqg_seed = jax.tree.map(
      lambda a, b: jnp.where(state.active == ACTIVE_SAMPLING, a, b),
      seeded_ilqg_state(), state.ilqg_state)

  def run_ilqg(_):
    # eager order: iLQS's arbitration compares the improvement applied
    # WITHIN this call against sampling's (ilqs/planner.cc:87-240), so
    # the pipelined apply-previous/compute-next split does not fit here
    st, info = ilqg.optimize(spec, ilqg_seed, d0, params, icfg,
                             num_ilqg_candidates, horizon_steps,
                             pipelined=False)
    better = info['best_return'] < info_s['best_return']
    return st, info['best_return'], better

  def skip_ilqg(_):
    return (ilqg_seed, info_s['best_return'], jnp.array(False))

  ilqg_state, ilqg_ret, ilqg_better = jax.lax.cond(
      sampling_improved, skip_ilqg, run_ilqg, operand=None)

  active = jnp.where(
      sampling_improved, ACTIVE_SAMPLING,
      jnp.where(ilqg_better, ACTIVE_ILQG, state.active)).astype(jnp.int32)

  new_state = ILQSState(sampling_policy=pol_s, ilqg_state=ilqg_state,
                        active=active)
  info = {
      'best_return': jnp.where(sampling_improved, info_s['best_return'],
                               jnp.minimum(info_s['best_return'], ilqg_ret)),
      'sampling_return': info_s['best_return'],
      'ilqg_return': ilqg_ret,
      'active': active,
  }
  return new_state, info


def action_from_policy(spec: TaskSpec, state: ILQSState, qpos, qvel, act,
                       time, interp: int) -> jax.Array:
  u_s = sampling.action_from_policy(
      spec, state.sampling_policy, time, interp)
  u_i = ilqg.action_from_policy(spec, state.ilqg_state.policy, qpos, qvel,
                                act, time)
  return jnp.where(state.active == ACTIVE_SAMPLING, u_s, u_i)


def nominal_action_from_policy(spec: TaskSpec, state: ILQSState, time,
                               interp: int) -> jax.Array:
  """Active policy's action without feedback terms (GetAction
  nominal_action semantics; only the iLQG branch has feedback)."""
  u_s = sampling.action_from_policy(
      spec, state.sampling_policy, time, interp)
  u_i = ilqg.nominal_action_from_policy(spec, state.ilqg_state.policy, time)
  return jnp.where(state.active == ACTIVE_SAMPLING, u_s, u_i)
