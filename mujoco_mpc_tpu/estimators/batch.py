"""Batch estimator: recursive fixed-lag smoother over the Direct optimizer.

TPU-native re-design of the reference Batch estimator
(/root/reference/mjpc/estimators/batch.{h,cc}): a sliding window of
configurations optimized with the Direct cost plus a prior
0.5 ||z - z_prior||^2 * scale_prior anchoring the window to previous
estimates; on each update the window shifts by one (batch.h:127 Shift) and
the newest slot is seeded with the newest measurement prior.
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.estimators import direct as direct_mod
from mujoco_mpc_tpu.physics.model import Data, Model

# reference: batch.h:35
MAX_FILTER_HISTORY = 64


@struct.dataclass
class BatchState:
  qpos_window: jax.Array    # (T, nq) current window estimates
  sensor_window: jax.Array  # (T, ns)
  force_window: jax.Array   # (T, nv)
  times: jax.Array          # (T,)
  filled: jax.Array         # scalar int: number of valid slots


def init_state(p: direct_mod.DirectProblem, dtype=jnp.float32) -> BatchState:
  m = p.model
  t = p.horizon
  return BatchState(
      qpos_window=jnp.tile(m.qpos0.astype(dtype), (t, 1)),
      sensor_window=jnp.zeros((t, p.sensor_dim), dtype=dtype),
      force_window=jnp.zeros((t, m.nv), dtype=dtype),
      times=jnp.arange(t, dtype=dtype) * float(1.0),
      filled=jnp.zeros((), jnp.int32))


def update(p: direct_mod.DirectProblem, state: BatchState,
           settings: direct_mod.DirectSettings, sensor: jax.Array,
           force: jax.Array, time: jax.Array,
           timestep: jax.Array) -> Tuple[BatchState, dict]:
  """Shift the window, append the new measurement, re-optimize."""
  # shift left by one, append newest (duplicate last config as seed)
  qpos_w = jnp.concatenate([state.qpos_window[1:],
                            state.qpos_window[-1:]])
  sensor_w = jnp.concatenate([state.sensor_window[1:], sensor[None]])
  force_w = jnp.concatenate([state.force_window[1:], force[None]])
  times = jnp.concatenate([state.times[1:], time[None]])

  data = direct_mod.DirectData(
      qpos_ref=qpos_w, sensor_meas=sensor_w, force_meas=force_w,
      times=times)
  # prior anchors displacements to the previous estimates (z_prior = 0
  # around qpos_ref, which holds the shifted previous solution)
  z_prior = jnp.zeros(p.horizon * p.model.nv, dtype=qpos_w.dtype)
  z, info = direct_mod.optimize(p, data, settings, z_prior=z_prior)

  new_state = BatchState(
      qpos_window=info['qpos'], sensor_window=sensor_w,
      force_window=force_w, times=times,
      filled=jnp.minimum(state.filled + 1, p.horizon))
  info['qpos_estimate'] = info['qpos'][-2]   # newest fully-constrained slot
  return new_state, info
