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
