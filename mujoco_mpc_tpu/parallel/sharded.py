"""Multi-device planning: shard the candidate axis over a TPU mesh.

TPU-native replacement for the reference's in-process parallel reductions
(/root/reference/mjpc/planners/sampling/planner.cc:342-380 ThreadPool fanout,
partial_sort winner selection; SURVEY.md §5.8). The candidate/sample axis is
sharded with shard_map over a 1-D 'samples' mesh (ICI within a slice; add a
host axis for pods); winner selection is a two-phase argmin: local argmin on
each device, then an all_gather of (return, knots) pairs — tiny payload —
followed by a replicated global argmin. Elite means (CEM) use psum.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec

AXIS = 'samples'


def make_mesh(devices=None) -> Mesh:
  """1-D mesh over all (or given) devices for the sample axis."""
  if devices is None:
    devices = jax.devices()
  import numpy as np
  return Mesh(np.asarray(devices), (AXIS,))


def optimize_sharded(spec: TaskSpec, policy: sampling.SamplingPolicy,
                     d0: Data, params: TaskParams,
                     cfg: sampling.SamplingConfig, key: jax.Array,
                     num_samples: int, horizon_steps: int, interp: int,
                     mesh: Mesh) -> Tuple[sampling.SamplingPolicy, dict]:
  """One predictive-sampling iteration with the sample axis sharded.

  Equivalent to sampling.optimize but each device rolls out
  num_samples / n_devices candidates (plus the replicated nominal).
  """
  n_dev = mesh.devices.size
  assert num_samples % n_dev == 0, (num_samples, n_dev)
  local_samples = num_samples // n_dev

  nominal = sampling.resample_nominal(spec, policy, d0.time, horizon_steps,
                                      cfg, interp)
  keys = jax.random.split(key, n_dev)

  def shard_fn(keys_shard):
    k = keys_shard[0]
    # promote the replicated initial state to device-varying so the rollout
    # scan carry has a consistent varying-manual-axes type
    d_local = jax.tree.map(lambda x: jax.lax.pcast(x, AXIS, to='varying'), d0)
    # candidates: index 0 is the (replicated) nominal, rest are local noise
    cands = sampling.sample_candidates(spec, nominal, local_samples, cfg, k)
    rets = sampling.rollout_candidates(
        spec, d_local, nominal.times, cands, params, horizon_steps, cfg,
        interp)
    local_best = jnp.argmin(rets)
    # two-phase winner selection across devices
    all_best_ret = jax.lax.all_gather(rets[local_best], AXIS)      # (n_dev,)
    all_best_val = jax.lax.all_gather(cands[local_best], AXIS)     # (n_dev,P,nu)
    w = jnp.argmin(all_best_ret)
    return (all_best_val[w][None], all_best_ret[w][None], rets[0][None])

  # check_vma=False: the rollout pipeline mixes device-varying state with
  # structurally-constant fields (e.g. joint axes of fixed-base models),
  # which the varying-manual-axes analysis can't type; correctness is
  # covered by tests against the single-device planner.
  shard = jax.shard_map(
      shard_fn, mesh=mesh, in_specs=P(AXIS),
      out_specs=(P(AXIS), P(AXIS), P(AXIS)), check_vma=False)
  values_all, best_ret_all, nominal_ret_all = shard(keys)
  # every device computed the same winner; take replica 0
  best_values = values_all[0]
  best_return = best_ret_all[0]
  nominal_return = nominal_ret_all[0]

  new_policy = sampling.SamplingPolicy(times=nominal.times,
                                       values=best_values)
  info = {
      'best_return': best_return,
      'nominal_return': nominal_return,
      'improvement': jnp.maximum(nominal_return - best_return, 0.0),
  }
  return new_policy, info


def optimize_cem_sharded(spec: TaskSpec, state, d0: Data,
                         params: TaskParams, cfg, key: jax.Array,
                         num_samples: int, n_elite: int, horizon_steps: int,
                         interp: int, mesh: Mesh):
  """One Cross-Entropy iteration with the sample axis sharded over a mesh.

  The elite statistics are the reference's "mean over elites" reduction
  (cross_entropy/planner.cc:227-262, SURVEY.md section 5.8) expressed as
  collectives: returns are all_gather'd (tiny: one scalar per candidate),
  elite membership is decided replicated, and elite mean/variance are
  psum'd masked local sums — no device ever materializes the full
  candidate set.
  """
  from mujoco_mpc_tpu.planners import cross_entropy as cem

  n_dev = mesh.devices.size
  assert num_samples % n_dev == 0, (num_samples, n_dev)
  local = num_samples // n_dev
  n_elite = min(n_elite, num_samples)

  scfg = sampling.SamplingConfig(
      noise_std=cfg.std_initial, noise_std2=jnp.zeros_like(cfg.std_initial),
      timestep=cfg.timestep, horizon_time=cfg.horizon_time)
  nominal = sampling.resample_nominal(spec, state.policy, d0.time,
                                      horizon_steps, scfg, interp)
  lo = spec.model.actuator_ctrlrange[:, 0]
  hi = spec.model.actuator_ctrlrange[:, 1]
  std = jnp.maximum(jnp.sqrt(state.variance), cfg.std_min)
  keys = jax.random.split(key, n_dev)

  def shard_fn(keys_shard):
    k = keys_shard[0]
    d_local = jax.tree.map(lambda x: jax.lax.pcast(x, AXIS, to='varying'),
                           d0)
    eps = jax.random.normal(k, (local,) + nominal.values.shape,
                            dtype=nominal.values.dtype)
    cands = jnp.clip(nominal.values[None] + eps * std[None], lo, hi)
    rets = sampling.rollout_candidates(
        spec, d_local, nominal.times, cands, params, horizon_steps, scfg,
        interp)
    # replicated elite threshold from the gathered return vector
    all_rets = jax.lax.all_gather(rets, AXIS).reshape(-1)  # (num_samples,)
    neg_top, _ = jax.lax.top_k(-all_rets, n_elite)
    thresh = -neg_top[-1]
    # masked local elite statistics -> global psum
    is_elite = rets <= thresh                              # (local,)
    wsum = jax.lax.psum(jnp.sum(is_elite), AXIS)
    mask = is_elite.astype(cands.dtype)[:, None, None]
    local_sum = jnp.sum(cands * mask, axis=0)
    elite_mean = jax.lax.psum(local_sum, AXIS) / jnp.maximum(wsum, 1)
    local_sq = jnp.sum(((cands - elite_mean[None]) ** 2) * mask, axis=0)
    elite_var = jax.lax.psum(local_sq, AXIS) / jnp.maximum(wsum - 1, 1)
    best = -neg_top[0]
    avg = jnp.mean(-neg_top)
    return (elite_mean[None], elite_var[None], best[None], avg[None])

  shard = jax.shard_map(
      shard_fn, mesh=mesh, in_specs=P(AXIS),
      out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)), check_vma=False)
  mean_all, var_all, best_all, avg_all = shard(keys)
  new_state = cem.CEMState(
      policy=sampling.SamplingPolicy(times=nominal.times,
                                     values=mean_all[0]),
      variance=var_all[0])
  info = {
      'best_return': best_all[0],
      'elite_avg_return': avg_all[0],
      'improvement': jnp.maximum(avg_all[0] - best_all[0], 0.0),
  }
  return new_state, info
