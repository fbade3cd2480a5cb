"""Task registry: built-in task definitions.

The analog of the reference's GetTasks() registry
(/root/reference/mjpc/tasks/tasks.cc:46-73). Each task pairs an original
MJCF model (mujoco_mpc_tpu/models/*.xml) with a pure JAX residual function
and optional pure transition function. Residual semantics follow the
corresponding reference task (cited per task below).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import support
from mujoco_mpc_tpu.physics.model import load_model
from mujoco_mpc_tpu.tasks import base

_MODELS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'models')

_REGISTRY: Dict[str, Callable[[], base.TaskSpec]] = {}


def register(name: str):
  def deco(fn):
    _REGISTRY[name] = fn
    return fn
  return deco


def task_names():
  return tuple(_REGISTRY)


@functools.lru_cache(maxsize=None)
def get_task(name: str) -> base.TaskSpec:
  return _REGISTRY[name]()


def _build(name: str, xml: str, residual_fn, transition_fn=None,
           dtype=jnp.float32) -> base.TaskSpec:
  """Assemble a TaskSpec from an MJCF file + residual function."""
  path = os.path.join(_MODELS_DIR, xml)
  model, mjm = load_model(path, dtype=dtype)
  (term_names, norm_types, term_dims, weights, norm_params,
   weight_ranges) = base.parse_user_sensors(mjm)
  config = base.parse_custom_numerics(mjm)

  # residual_* numerics -> residual parameters (reference:
  # Task::SetFeatureParameters, task.cc:40-65: value is the first entry,
  # remaining entries are the GUI slider range)
  rp_names, rp_vals, rp_ranges = [], [], []
  for key, val in config.items():
    if key.startswith('residual_') and not key.startswith('residual_select_'):
      arr = np.atleast_1d(np.asarray(val, dtype=np.float64))
      rp_names.append(key[len('residual_'):])
      rp_vals.append(arr[0])
      rp_ranges.append((float(arr[1]), float(arr[2])) if arr.size >= 3
                       else (0.0, 1.0))

  params = base.TaskParams(
      weights=jnp.asarray(weights, dtype=dtype),
      norm_params=jnp.asarray(norm_params, dtype=dtype),
      residual_params=jnp.asarray(np.array(rp_vals or [0.0]), dtype=dtype),
      risk=jnp.asarray(config.get('task_risk', 0.0), dtype=dtype),
  )

  return base.TaskSpec(
      name=name, model=model, mj_model=mjm,
      term_names=term_names, norm_types=norm_types, term_dims=term_dims,
      residual_fn=residual_fn, default_params=params, config=config,
      transition_fn=transition_fn, weight_ranges=weight_ranges,
      residual_param_names=tuple(rp_names),
      residual_param_ranges=tuple(rp_ranges))


# ---------------------------------------------------------------------------
# Cartpole (reference: mjpc/tasks/cartpole/cartpole.cc Residual)
# ---------------------------------------------------------------------------


def _cartpole_residual(m, d, rp):
  return jnp.stack([
      jnp.cos(d.qpos[1]) - 1.0,   # Vertical
      d.qpos[0] - rp[0],          # Centered (goal parameter)
      d.qvel[1],                  # Velocity
      d.ctrl[0],                  # Control
  ])


@register('Cartpole')
def _cartpole() -> base.TaskSpec:
  return _build('Cartpole', 'cartpole.xml', _cartpole_residual)


# ---------------------------------------------------------------------------
# Particle (reference: mjpc/tasks/particle/particle.cc)
# ---------------------------------------------------------------------------


def _particle_goal_of_time(t):
  return jnp.stack([0.25 * jnp.sin(t), 0.25 * jnp.cos(t / jnp.pi)])


def _particle_residual_impl(spec_model, m, d, goal):
  tip = spec_model.site('tip')
  pos = d.site_xpos[tip][:2] - goal
  vel = support.site_linvel(m, d, tip)[:2]
  return jnp.concatenate([pos, vel, d.ctrl])


@register('Particle')
def _particle() -> base.TaskSpec:
  spec_model, _ = load_model(os.path.join(_MODELS_DIR, 'particle.xml'))

  def residual(m, d, rp):
    goal = _particle_goal_of_time(d.time)
    return _particle_residual_impl(spec_model, m, d, goal)

  def transition(m, d, params, key):
    goal = _particle_goal_of_time(d.time)
    mocap = d.mocap_pos.at[0, :2].set(goal)
    return d.replace(mocap_pos=mocap), params

  return _build('Particle', 'particle.xml', residual, transition)


@register('ParticleFixed')
def _particle_fixed() -> base.TaskSpec:
  spec_model, _ = load_model(os.path.join(_MODELS_DIR, 'particle.xml'))

  def residual(m, d, rp):
    return _particle_residual_impl(spec_model, m, d, d.mocap_pos[0, :2])

  return _build('ParticleFixed', 'particle.xml', residual)


# ---------------------------------------------------------------------------
# Acrobot (reference: mjpc/tasks/acrobot/acrobot.cc)
# ---------------------------------------------------------------------------


@register('Acrobot')
def _acrobot() -> base.TaskSpec:
  spec_model, _ = load_model(os.path.join(_MODELS_DIR, 'acrobot.xml'))
  goal, tip = spec_model.site('goal'), spec_model.site('tip')

  def residual(m, d, rp):
    return jnp.stack([
        d.site_xpos[goal][2] - d.site_xpos[tip][2],
        d.site_xpos[goal][0] - d.site_xpos[tip][0],
        d.qvel[0],
        d.qvel[1],
        d.ctrl[0],
    ])

  return _build('Acrobot', 'acrobot.xml', residual)


# ---------------------------------------------------------------------------
# Walker (reference: mjpc/tasks/walker/walker.cc)
# ---------------------------------------------------------------------------


@register('Walker')
def _walker() -> base.TaskSpec:
  spec_model, _ = load_model(os.path.join(_MODELS_DIR, 'walker.xml'))
  torso_site = spec_model.site('torso_site')
  torso_body = spec_model.body('torso')

  def residual(m, d, rp):
    height = d.site_xpos[torso_site][2]
    torso_up = d.xmat[torso_body][2, 2]
    com_vel = support.subtree_linvel(m, d, torso_body)[0]
    return jnp.concatenate([
        d.ctrl,                                   # Control
        jnp.stack([height - rp[0],                # Height (parameter 0)
                   torso_up - 1.0,                # Rotation: stay upright
                   com_vel - rp[1]]),             # Speed (parameter 1)
    ])

  return _build('Walker', 'walker.xml', residual)


# ---------------------------------------------------------------------------
# Quadrotor (reference: mjpc/tasks/quadrotor/quadrotor.cc)
# ---------------------------------------------------------------------------


@register('Quadrotor')
def _quadrotor() -> base.TaskSpec:
  spec_model, mjm = load_model(os.path.join(_MODELS_DIR, 'quadrotor.xml'))
  center = spec_model.site('center')
  quad = spec_model.body('quad')
  goal_mocap = spec_model.body_mocapid[spec_model.body('goal')]
  total_mass = float(np.sum(mjm.body_mass))
  g = 9.81
  hover = total_mass * g / 4.0

  def residual(m, d, rp):
    pos = d.site_xpos[center] - d.mocap_pos[goal_mocap]
    linvel = support.point_velocity(m, d, quad, d.xipos[quad])
    angvel = d.cvel[quad, :3]
    return jnp.concatenate([pos, linvel, angvel, d.ctrl - hover])

  def transition(m, d, params, key):
    # circular waypoint path (the reference steps mocap through waypoints)
    t = d.time
    goal = jnp.stack([0.5 * jnp.cos(0.5 * t), 0.5 * jnp.sin(0.5 * t),
                      1.0 + 0.2 * jnp.sin(0.25 * t)])
    mocap = d.mocap_pos.at[goal_mocap].set(goal.astype(d.mocap_pos.dtype))
    return d.replace(mocap_pos=mocap), params

  return _build('Quadrotor', 'quadrotor.xml', residual, transition)


# ---------------------------------------------------------------------------
# Swimmer (reference: mjpc/tasks/swimmer/swimmer.cc)
# ---------------------------------------------------------------------------


@register('Swimmer')
def _swimmer() -> base.TaskSpec:
  spec_model, _ = load_model(os.path.join(_MODELS_DIR, 'swimmer.xml'))
  nose = spec_model.site('nose')
  target_body = spec_model.body('target')
  target_mocap = spec_model.body_mocapid[target_body]

  def residual(m, d, rp):
    nose_xy = d.site_xpos[nose][:2]
    target_xy = d.mocap_pos[target_mocap][:2]
    return jnp.concatenate([d.ctrl, nose_xy - target_xy])

  def transition(m, d, params, key):
    nose_xy = d.site_xpos[nose][:2]
    target_xy = d.mocap_pos[target_mocap][:2]
    reached = jnp.linalg.norm(target_xy - nose_xy) < 0.04
    new_xy = jax.random.uniform(key, (2,), minval=-0.8, maxval=0.8,
                                dtype=d.mocap_pos.dtype)
    xy = jnp.where(reached, new_xy, target_xy)
    mocap = d.mocap_pos.at[target_mocap, :2].set(xy)
    return d.replace(mocap_pos=mocap), params

  return _build('Swimmer', 'swimmer.xml', residual, transition)
