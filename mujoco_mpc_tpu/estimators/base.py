"""Estimator framework: shared state pytree and ground-truth estimator.

TPU-native re-design of the reference Estimator interface
(/root/reference/mjpc/estimators/estimator.h:33-210). Estimators are pure
update functions over an EstimatorState pytree, so they jit/vmap (e.g. a
bank of filters for multi-hypothesis estimation) and run on-device next to
the planner.
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import sensors as sensors_mod
from mujoco_mpc_tpu.physics import support
from mujoco_mpc_tpu.physics.model import Data, Model, make_data


@struct.dataclass
class EstimatorState:
  """Filter state: physics state + tangent-space covariance + noise."""
  qpos: jax.Array          # (nq,)
  qvel: jax.Array          # (nv,)
  act: jax.Array           # (na,)
  time: jax.Array
  covariance: jax.Array    # (ndx, ndx)
  noise_process: jax.Array  # (ndx,) diagonal
  noise_sensor: jax.Array   # (nsensor_sel,) diagonal


def ndx(m: Model) -> int:
  return 2 * m.nv + m.na


def init_state(m: Model, dtype=jnp.float32,
               sensor_slice: Tuple[int, int] = None,
               covariance_scale: float = 1e-4,
               process_noise: float = 1e-5,
               sensor_noise: float = 1e-4) -> EstimatorState:
  nd = ndx(m)
  nsel = _sensor_dim(m, sensor_slice)
  return EstimatorState(
      qpos=m.qpos0.astype(dtype),
      qvel=jnp.zeros(m.nv, dtype=dtype),
      act=jnp.zeros(m.na, dtype=dtype),
      time=jnp.zeros((), dtype=dtype),
      covariance=covariance_scale * jnp.eye(nd, dtype=dtype),
      noise_process=jnp.full((nd,), process_noise, dtype=dtype),
      noise_sensor=jnp.full((nsel,), sensor_noise, dtype=dtype))


def _sensor_range(m: Model, sensor_slice):
  """(data_start, data_dim) for the selected sensor index range."""
  if sensor_slice is None:
    start_idx, count = 0, len(m.sensor_type)
  else:
    start_idx, count = sensor_slice
  if count == 0:
    return 0, 0
  adr0 = m.sensor_adr[start_idx]
  last = start_idx + count - 1
  adr1 = m.sensor_adr[last] + m.sensor_dim[last]
  return adr0, adr1 - adr0


def _sensor_dim(m: Model, sensor_slice):
  return _sensor_range(m, sensor_slice)[1]


def measure(m: Model, template: Data, qpos, qvel, act, time, ctrl,
            sensor_slice=None) -> jax.Array:
  """Predicted measurement h(x, u): forward + sensordata slice."""
  d = template.replace(qpos=qpos, qvel=qvel, act=act, time=time, ctrl=ctrl)
  d = fwd.forward(m, d)
  sd = sensors_mod.sensordata(m, d)
  adr0, dim = _sensor_range(m, sensor_slice)
  return jax.lax.dynamic_slice(sd, (adr0,), (dim,))


def predict(m: Model, template: Data, qpos, qvel, act, time, ctrl):
  """One dynamics step f(x, u)."""
  d = template.replace(qpos=qpos, qvel=qvel, act=act, time=time, ctrl=ctrl)
  d = fwd.step(m, d)
  return d.qpos, d.qvel, d.act, d.time


def perturb(m: Model, qpos, qvel, act, dx):
  """x ⊕ dx on the state manifold."""
  nv, na = m.nv, m.na
  qp = fwd.integrate_pos(m, qpos, dx[:nv], 1.0)
  qv = qvel + dx[nv:2 * nv]
  a = act + dx[2 * nv:] if na else act
  return qp, qv, a


def difference(m: Model, qpos0, qvel0, act0, qpos1, qvel1, act1):
  """x1 ⊖ x0 in tangent space."""
  parts = [support.state_diff(m, qpos0, qpos1), qvel1 - qvel0]
  if m.na:
    parts.append(act1 - act0)
  return jnp.concatenate(parts)


# ---------------------------------------------------------------------------
# Ground-truth estimator (reference: estimator.h:201-210 — just steps a copy)
# ---------------------------------------------------------------------------


def ground_truth_update(m: Model, template: Data, state: EstimatorState,
                        ctrl: jax.Array,
                        sensor: jax.Array = None) -> EstimatorState:
  qpos, qvel, act, time = predict(m, template, state.qpos, state.qvel,
                                  state.act, state.time, ctrl)
  return state.replace(qpos=qpos, qvel=qvel, act=act, time=time)
