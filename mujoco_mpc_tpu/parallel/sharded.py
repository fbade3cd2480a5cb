"""Multi-device planning: shard the candidate axis over a TPU mesh.

TPU-native replacement for the reference's in-process parallel reductions
(/root/reference/mjpc/planners/sampling/planner.cc:342-380 ThreadPool fanout,
partial_sort winner selection; SURVEY.md §5.8). The candidate/sample axis is
sharded with shard_map over a mesh — 1-D ('samples',) inside a slice (ICI),
or 2-D ('hosts', 'samples') with the host axis over DCN for multi-host pods
(see init_distributed / make_mesh_2d). Winner selection is a two-phase
argmin: local argmin on each device, then an all_gather of (return, knots)
pairs — tiny payload — followed by a replicated global argmin. Elite means
(CEM) use psum.

Seed-exactness: every device draws the FULL candidate noise tensor from the
same replicated key and takes its contiguous slice (the draw is tiny next to
the rollouts), so the sharded planner selects bit-identical winners to the
single-device `sampling.optimize` (tests/test_sharded.py winner-equivalence).

The varying-manual-axes analysis runs (no check_vma escape hatch): the
replicated initial state and key are explicitly promoted with jax.lax.pcast
where they enter device-varying computations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec

AXIS = 'samples'
HOST_AXIS = 'hosts'


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
  """Initialize jax.distributed for multi-host (DCN) meshes.

  No-op when already initialized or when running single-process. On a pod
  slice launched with the standard TPU env vars, the no-arg form
  auto-discovers the coordinator (jax.distributed docs)."""
  try:
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
  except (RuntimeError, ValueError):
    pass  # already initialized or single-process


def make_mesh(devices=None) -> Mesh:
  """1-D mesh over all (or given) devices for the sample axis."""
  if devices is None:
    devices = jax.devices()
  return Mesh(np.asarray(devices), (AXIS,))


def make_mesh_2d(devices=None, num_hosts: Optional[int] = None) -> Mesh:
  """2-D ('hosts', 'samples') mesh: host axis over DCN, samples over ICI.

  Devices are laid out host-major (jax.devices() orders by process), so
  the 'samples' axis stays within each host's ICI domain and only the tiny
  two-phase winner reduction crosses DCN."""
  if devices is None:
    devices = jax.devices()
  devices = np.asarray(devices)
  if num_hosts is None:
    num_hosts = max(jax.process_count(), 1)
  assert devices.size % num_hosts == 0, (devices.size, num_hosts)
  return Mesh(devices.reshape(num_hosts, devices.size // num_hosts),
              (HOST_AXIS, AXIS))


def _mesh_axes(mesh: Mesh) -> Tuple[str, ...]:
  return tuple(mesh.axis_names)


def optimize_sharded(spec: TaskSpec, policy: sampling.SamplingPolicy,
                     d0: Data, params: TaskParams,
                     cfg: sampling.SamplingConfig, key: jax.Array,
                     num_samples: int, horizon_steps: int, interp: int,
                     mesh: Mesh) -> Tuple[sampling.SamplingPolicy, dict]:
  """One predictive-sampling iteration with the sample axis sharded.

  Seed-exact with sampling.optimize at equal num_samples: same candidate
  stream, same winner (two-phase argmin over contiguous chunks preserves
  first-minimum ordering)."""
  axes = _mesh_axes(mesh)
  n_dev = mesh.devices.size
  assert num_samples % n_dev == 0, (num_samples, n_dev)
  local = num_samples // n_dev

  nominal = sampling.resample_nominal(spec, policy, d0.time, horizon_steps,
                                      cfg, interp)

  def shard_fn(key_rep):
    idx = jax.lax.axis_index(axes)        # flattened device index
    # promote the replicated initial state to device-varying so the
    # rollout scan carry has a consistent varying-manual-axes type
    d_local = jax.tree.map(lambda x: jax.lax.pcast(x, axes, to='varying'), d0)
    # contiguous slice of the exact single-device candidate stream;
    # index 0 is the (replicated) nominal on every shard
    cands = sampling.sample_candidates_slice(
        spec, nominal, num_samples, cfg, key_rep, idx * local, local)
    rets = sampling.rollout_candidates(
        spec, d_local, jax.lax.pcast(nominal.times, axes, to='varying'), cands, params,
        horizon_steps, cfg, interp)
    local_best = jnp.argmin(rets)
    # two-phase winner selection across devices
    all_best_ret = jax.lax.all_gather(rets[local_best], axes)   # (n_dev,)
    all_best_val = jax.lax.all_gather(cands[local_best], axes)
    w = jnp.argmin(all_best_ret)
    return (all_best_val[w][None], all_best_ret[w][None], rets[0][None])

  shard = jax.shard_map(
      shard_fn, mesh=mesh, in_specs=P(),
      out_specs=(P(axes), P(axes), P(axes)))
  values_all, best_ret_all, nominal_ret_all = shard(key)
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

  axes = _mesh_axes(mesh)
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

  def shard_fn(key_rep):
    idx = jax.lax.axis_index(axes)
    d_local = jax.tree.map(lambda x: jax.lax.pcast(x, axes, to='varying'), d0)
    # full replicated draw, contiguous local slice (seed-exact chunking)
    eps = jax.random.normal(key_rep, (num_samples,) + nominal.values.shape,
                            dtype=nominal.values.dtype)
    eps_local = jax.lax.dynamic_slice_in_dim(eps, idx * local, local, 0)
    cands = jnp.clip(nominal.values[None] + eps_local * std[None], lo, hi)
    rets = sampling.rollout_candidates(
        spec, d_local, jax.lax.pcast(nominal.times, axes, to='varying'), cands, params,
        horizon_steps, scfg, interp)
    # replicated elite selection from the gathered return vector: the SAME
    # top_k call as the single-device refit (cross_entropy.optimize), so tie
    # handling (index order) matches and exactly n_elite members are chosen
    # — `rets <= thresh` previously admitted every tie with the n_elite-th
    # return, skewing the psum'd mean vs the single-device path
    all_rets = jax.lax.all_gather(rets, axes).reshape(-1)  # (num_samples,)
    neg_top, elite_idx = jax.lax.top_k(-all_rets, n_elite)
    # local elite membership by global candidate index (contiguous chunks)
    gidx = idx * local + jnp.arange(local)
    is_elite = jnp.any(elite_idx[None, :] == gidx[:, None], axis=1)
    mask = is_elite.astype(cands.dtype)[:, None, None]
    local_sum = jnp.sum(cands * mask, axis=0)
    elite_mean = jax.lax.psum(local_sum, axes) / n_elite
    local_sq = jnp.sum(((cands - elite_mean[None]) ** 2) * mask, axis=0)
    elite_var = jax.lax.psum(local_sq, axes) / max(n_elite - 1, 1)
    best = -neg_top[0]
    avg = jnp.mean(-neg_top)
    return (elite_mean[None], elite_var[None], best[None], avg[None])

  shard = jax.shard_map(
      shard_fn, mesh=mesh, in_specs=P(),
      out_specs=(P(axes), P(axes), P(axes), P(axes)))
  mean_all, var_all, best_all, avg_all = shard(key)
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
