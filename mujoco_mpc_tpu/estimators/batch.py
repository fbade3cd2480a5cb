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
  # band-structured prior weight matrix P (reference batch.h:162
  # weight_prior_): block-tridiagonal, P_diag (T, nv, nv) + lower
  # off-diagonal P_off1 (T-1, nv, nv)
  prior_diag: jax.Array
  prior_off1: jax.Array


def init_state(p: direct_mod.DirectProblem, dtype=jnp.float32,
               scale_prior: float = 1.0) -> BatchState:
  m = p.model
  t = p.horizon
  eye = jnp.eye(m.nv, dtype=dtype)
  return BatchState(
      qpos_window=jnp.tile(m.qpos0.astype(dtype), (t, 1)),
      sensor_window=jnp.zeros((t, p.sensor_dim), dtype=dtype),
      force_window=jnp.zeros((t, m.nv), dtype=dtype),
      times=jnp.arange(t, dtype=dtype) * float(1.0),
      filled=jnp.zeros((), jnp.int32),
      prior_diag=jnp.tile(scale_prior * eye, (t, 1, 1)),
      prior_off1=jnp.zeros((t - 1, m.nv, m.nv), dtype=dtype))


def _dense_hessian(diag, off1, off2):
  """Assemble the dense (T*nv, T*nv) Hessian from block-banded parts."""
  t, nv, _ = diag.shape
  h = jnp.zeros((t * nv, t * nv), dtype=diag.dtype)
  for i in range(t):
    h = h.at[i * nv:(i + 1) * nv, i * nv:(i + 1) * nv].set(diag[i])
  for i in range(t - 1):
    h = h.at[(i + 1) * nv:(i + 2) * nv, i * nv:(i + 1) * nv].set(off1[i])
    h = h.at[i * nv:(i + 1) * nv, (i + 1) * nv:(i + 2) * nv].set(
        off1[i].T)
  for i in range(t - 2):
    h = h.at[(i + 2) * nv:(i + 3) * nv, i * nv:(i + 1) * nv].set(off2[i])
    h = h.at[i * nv:(i + 1) * nv, (i + 2) * nv:(i + 3) * nv].set(
        off2[i].T)
  return h


def marginalize_prior(h: jax.Array, nv: int, scale_prior,
                      damping: float = 1e-6):
  """Recursive prior weight update (reference batch.cc:356-388
  ConditionMatrix + DenseToBlockBand): marginalize the oldest nv
  variables out of the window Hessian with a Schur complement, shift, pad
  the newest slot with scale_prior * I, and truncate to the
  block-tridiagonal band. Returns (prior_diag (T,nv,nv),
  prior_off1 (T-1,nv,nv)) for a window of the SAME length T."""
  n = h.shape[0]
  t = n // nv
  a = h[:nv, :nv] + damping * jnp.eye(nv, dtype=h.dtype)
  b = h[nv:, :nv]
  hc = h[nv:, nv:] - b @ jnp.linalg.solve(a, b.T)
  diag = jnp.zeros((t, nv, nv), dtype=h.dtype)
  off1 = jnp.zeros((t - 1, nv, nv), dtype=h.dtype)
  for i in range(t - 1):
    diag = diag.at[i].set(hc[i * nv:(i + 1) * nv, i * nv:(i + 1) * nv])
  for i in range(t - 2):
    off1 = off1.at[i].set(
        hc[(i + 1) * nv:(i + 2) * nv, i * nv:(i + 1) * nv])
  diag = diag.at[t - 1].set(scale_prior * jnp.eye(nv, dtype=h.dtype))
  return diag, off1


def update(p: direct_mod.DirectProblem, state: BatchState,
           settings: direct_mod.DirectSettings, sensor: jax.Array,
           force: jax.Array, time: jax.Array,
           timestep: jax.Array,
           recursive_prior: bool = False) -> Tuple[BatchState, dict]:
  """Shift the window, append the new measurement, re-optimize.

  With recursive_prior (reference filter_settings.recursive_prior_update,
  batch.cc:356-388 — OFF by default there too, batch.h:157), the prior
  weight matrix for the next window is the marginal information of this
  window's Gauss-Newton Hessian over the dropped oldest configuration
  (Schur complement, band-truncated)."""
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
  z, info = direct_mod.optimize(p, data, settings, z_prior=z_prior,
                                prior_diag=state.prior_diag,
                                prior_off1=state.prior_off1)

  if recursive_prior:
    diag, off1, off2, _ = direct_mod._banded_normal_equations(
        p, data, z, settings)
    diag = diag + state.prior_diag
    off1 = off1 + state.prior_off1
    h = _dense_hessian(diag, off1, off2)
    p_diag, p_off1 = marginalize_prior(h, p.model.nv,
                                       settings.prior_weight)
  else:
    p_diag, p_off1 = state.prior_diag, state.prior_off1

  new_state = BatchState(
      qpos_window=info['qpos'], sensor_window=sensor_w,
      force_window=force_w, times=times,
      filled=jnp.minimum(state.filled + 1, p.horizon),
      prior_diag=p_diag, prior_off1=p_off1)
  info['qpos_estimate'] = info['qpos'][-2]   # newest fully-constrained slot
  return new_state, info
