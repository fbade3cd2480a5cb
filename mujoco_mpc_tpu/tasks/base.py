"""Task framework: residual functions, weighted norm costs, risk transform.

TPU-native re-design of the reference's Task/ResidualFn machinery
(/root/reference/mjpc/task.{h,cc}). A task is a static spec (norm types and
term dimensions are compile-time structure) plus a `TaskParams` pytree of
weights / norm parameters / residual parameters / risk that can be mutated
by the agent API without recompilation — the analog of the reference's GUI
sliders writing into Task fields (task.cc:147-245 parses the same MJCF
user-sensor convention).

Residual functions are pure: (Model, Data, residual_params) -> (num_residual,)
evaluated on post-forward Data (sensors at (x_t, u_t)), matching where the
reference copies data->sensordata inside Trajectory::Rollout
(trajectory.cc:141-180).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.ops import norms
from mujoco_mpc_tpu.physics.model import Data, Model

# reference: task.h:29
RISK_NEUTRAL_TOLERANCE = 1.0e-6
# reference: task.h:32
MAX_NORM_PARAMS = 3


@struct.dataclass
class TaskParams:
  """Tunable task parameters (pytree leaves; no recompilation on change)."""
  weights: jax.Array          # (num_term,)
  norm_params: jax.Array      # (num_term, MAX_NORM_PARAMS)
  residual_params: jax.Array  # (n_residual_params,) task-specific
  risk: jax.Array             # scalar


ResidualFn = Callable[[Model, Data, jax.Array], jax.Array]
# pure transition: (Model, Data, TaskParams, key) -> (Data, TaskParams)
TransitionFn = Callable[..., Any]


@dataclasses.dataclass(frozen=True)
class TaskSpec:
  """Static task definition."""
  name: str
  model: Model                      # planning model pytree
  mj_model: Any                     # host-side mujoco.MjModel (oracle/GUI)
  term_names: Tuple[str, ...]
  norm_types: Tuple[int, ...]       # per-term norm enum
  term_dims: Tuple[int, ...]        # residual slice sizes
  residual_fn: ResidualFn
  default_params: TaskParams
  config: Dict[str, float]          # agent_* / planner_* custom numerics
  transition_fn: Optional[TransitionFn] = None
  # GUI metadata: slider ranges for weights
  weight_ranges: Tuple[Tuple[float, float], ...] = ()
  residual_param_names: Tuple[str, ...] = ()
  residual_param_ranges: Tuple[Tuple[float, float], ...] = ()

  @property
  def num_term(self) -> int:
    return len(self.term_dims)

  @property
  def num_residual(self) -> int:
    return sum(self.term_dims)

  def cost_terms(self, residual: jax.Array, params: TaskParams,
                 weighted: bool = True) -> jax.Array:
    """Per-term norm costs (reference: BaseResidualFn::CostTerms)."""
    terms = []
    offset = 0
    for k in range(self.num_term):
      dim = self.term_dims[k]
      r = jax.lax.slice_in_dim(residual, offset, offset + dim, axis=-1)
      val = norms.norm_value(r, params.norm_params[k], self.norm_types[k])
      terms.append(params.weights[k] * val if weighted else val)
      offset += dim
    return jnp.stack(terms, axis=-1)

  def cost(self, residual: jax.Array, params: TaskParams) -> jax.Array:
    """Total weighted cost + exponential risk transform
    (reference: BaseResidualFn::CostValue, task.cc:91-110)."""
    c = jnp.sum(self.cost_terms(residual, params), axis=-1)
    risk = params.risk
    neutral = jnp.abs(risk) < RISK_NEUTRAL_TOLERANCE
    safe_risk = jnp.where(neutral, 1.0, risk)
    transformed = (jnp.exp(safe_risk * c) - 1.0) / safe_risk
    return jnp.where(neutral, c, transformed)


def parse_user_sensors(mj_model) -> Tuple[Tuple[str, ...], Tuple[int, ...],
                                          Tuple[int, ...], np.ndarray,
                                          np.ndarray, Tuple[Tuple[float,
                                                                  float], ...]]:
  """Parse cost terms from MJCF user sensors.

  Convention (same as the reference, docs/OVERVIEW.md:115-204): each cost
  term is a user sensor declared first in the model, with
  user="<norm> <weight> <weight_lo> <weight_hi> <norm params...>".
  Returns (names, norm_types, dims, weights, norm_params, weight_ranges).
  """
  import mujoco
  names, types_, dims, weights, params, ranges = [], [], [], [], [], []
  for i in range(mj_model.nsensor):
    if mj_model.sensor_type[i] != mujoco.mjtSensor.mjSENS_USER:
      break
    adr = mj_model.name_sensoradr[i]
    end = mj_model.names.find(b'\x00', adr)
    names.append(mj_model.names[adr:end].decode())
    dims.append(int(mj_model.sensor_dim[i]))
    u = mj_model.sensor_user[i]
    norm_type = int(u[0])
    types_.append(norm_type)
    weights.append(float(u[1]))
    ranges.append((float(u[2]), float(u[3])))
    nnp = norms.num_norm_parameters(norm_type)
    row = np.zeros(MAX_NORM_PARAMS)
    row[:nnp] = u[4:4 + nnp]
    params.append(row)
  return (tuple(names), tuple(types_), tuple(dims),
          np.array(weights), np.stack(params) if params else
          np.zeros((0, MAX_NORM_PARAMS)), tuple(ranges))


def parse_custom_numerics(mj_model) -> Dict[str, float]:
  """Custom numeric fields (agent_*, sampling_*, ...) as a config dict
  (the reference reads these via GetNumberOrDefault, utilities.h:61-64)."""
  out = {}
  for i in range(mj_model.nnumeric):
    adr = mj_model.name_numericadr[i]
    end = mj_model.names.find(b'\x00', adr)
    name = mj_model.names[adr:end].decode()
    dadr = mj_model.numeric_adr[i]
    size = mj_model.numeric_size[i]
    vals = mj_model.numeric_data[dadr:dadr + size]
    out[name] = float(vals[0]) if size == 1 else np.array(vals)
  return out
