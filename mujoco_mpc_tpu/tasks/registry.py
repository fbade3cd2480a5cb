"""Task registry: built-in task definitions.

The analog of the reference's GetTasks() registry
(/root/reference/mjpc/tasks/tasks.cc:46-73). Each task pairs an original
MJCF model (mujoco_mpc_tpu/models/*.xml) with a pure JAX residual function
and optional pure transition function. Residual semantics follow the
corresponding reference task (cited per task below).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.physics import support
from mujoco_mpc_tpu.physics.model import load_model
from mujoco_mpc_tpu.utils import tpu_math as tm
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
           dtype=jnp.float32, xml_string: str = None,
           xml_path: str = None, state_params=(),
           mj_patch=None) -> base.TaskSpec:
  """Assemble a TaskSpec from an MJCF file + residual function.

  xml: filename relative to the built-in models dir; xml_path: absolute
  path (e.g. a staged reference task.xml); xml_string: inline MJCF;
  mj_patch: applied to the MjModel before compile (procedural hfields)."""
  if xml_string is not None:
    model, mjm = load_model(xml_string=xml_string, dtype=dtype,
                            mj_patch=mj_patch)
  else:
    path = xml_path or os.path.join(_MODELS_DIR, xml)
    model, mjm = load_model(path, dtype=dtype, mj_patch=mj_patch)
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
  # residual_select_* numerics -> integer-valued selection parameters
  # (reference: dropdown GUI selections, e.g. quadruped Gait / Gait switch,
  # task_flat.xml:18-30), appended after the numeric parameters so numeric
  # rp indices are stable.
  for key, val in config.items():
    if key.startswith('residual_select_'):
      arr = np.atleast_1d(np.asarray(val, dtype=np.float64))
      rp_names.append('select_' + key[len('residual_select_'):])
      rp_vals.append(arr[0])
      rp_ranges.append((0.0, float(arr[1]) if arr.size >= 2 else 10.0))

  # hidden task-state slots (mode timers, filters, snapshots) carried in
  # residual_params so stateful reference transitions (quadruped modes,
  # rubik unscramble, tracking clock) stay pure-functional here
  for sname, sval in state_params:
    rp_names.append(sname)
    rp_vals.append(float(sval))
    rp_ranges.append((0.0, 0.0))

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


# ---------------------------------------------------------------------------
# Quadruped (reference: mjpc/tasks/quadruped/quadruped.cc, task_flat.xml)
# Same cost-term set (Upright/Height/Position/Gait/Balance/Effort/Posture/
# Orientation/Angmom), gait phase machinery, and goal-mocap transition, on an
# original capsule quadruped model.
# ---------------------------------------------------------------------------

# normalized gait phase offsets per foot [FL, FR, HL, HR] and per-gait
# (duty ratio, cadence scale, amplitude scale) rows; gaits:
# stand, walk, trot, canter, gallop (classic footfall signatures, cf.
# reference quadruped.h kGaitPhase/kGaitParam)
_QUAD_GAIT_PHASE = np.array([
    [0.0, 0.0, 0.0, 0.0],      # stand
    [0.0, 0.5, 0.75, 0.25],    # walk (lateral sequence)
    [0.0, 0.5, 0.5, 0.0],      # trot
    [0.0, 0.33, 0.33, 0.66],   # canter
    [0.0, 0.05, 0.4, 0.35],    # gallop
])
_QUAD_GAIT_DUTY = np.array([1.0, 0.75, 0.45, 0.4, 0.3])
_QUAD_FOOT_RADIUS = 0.025
_QUAD_HEIGHT_GOAL = 0.33


def _fractal_terrain(n: int = 33, octaves: int = 4,
                     seed: int = 7) -> np.ndarray:
  """Procedural fractal-noise elevation grid in [0, 1] (the reference
  hill terrain is a fractal-noise PNG hfield, task_hill.xml asset
  fractal.xml: hfield size 5 5 1 2)."""
  rng = np.random.RandomState(seed)
  out = np.zeros((n, n))
  amp = 1.0
  for o in range(octaves):
    k = 2 ** (o + 2) + 1
    coarse = rng.rand(k, k)
    x = np.linspace(0, k - 1, n)
    i = np.clip(np.floor(x).astype(int), 0, k - 2)
    t = x - i
    rows = coarse[:, i] * (1 - t) + coarse[:, i + 1] * t          # (k, n)
    vals = (rows[i, :] * (1 - t)[:, None]
            + rows[i + 1, :] * t[:, None])                        # (n, n)
    out += amp * vals
    amp *= 0.5
  out -= out.min()
  out /= max(float(np.ptp(out)), 1e-9)
  # flatten the center so the home stance starts on level ground
  cx = np.linspace(-1, 1, n)
  r2 = cx[None, :] ** 2 + cx[:, None] ** 2
  out *= np.clip((r2 - 0.02) / 0.1, 0.0, 1.0)
  return out


def _quadruped_hill_xml() -> str:
  """Rough-terrain quadruped MJCF: the flat model over a fractal-noise
  heightfield (reference QuadrupedHill, task_hill.xml + assets/
  fractal.xml); elevations are filled procedurally via mj_patch since
  MJCF only sources hfield data from image files."""
  with open(os.path.join(_MODELS_DIR, 'quadruped.xml')) as f:
    xml = f.read()
  asset = ('  <asset>\n    <hfield name="terrain" nrow="33" ncol="33"'
           ' size="4 4 0.22 0.4"/>\n  </asset>\n')
  terrain = ('    <geom name="terrain" type="hfield" hfield="terrain"'
             ' friction="1.0" contype="1" conaffinity="2"/>')
  xml = xml.replace('<mujoco model="Quadruped">',
                    '<mujoco model="Quadruped Hill">\n' + asset)
  return xml.replace('  </worldbody>', terrain + '\n  </worldbody>')


def _hill_patch(mj) -> None:
  mj.hfield_data[:] = _fractal_terrain().ravel()


def _make_quadruped(name: str, xml: str, xml_string: str = None,
                    mj_patch=None) -> base.TaskSpec:
  """Quadruped locomotion with the reference's full mode set
  (mjpc/tasks/quadruped/quadruped.{h,cc}): modes Quadruped / Biped / Walk /
  Scramble / Flip (quadruped.h:40-47), speed-based automatic gait
  switching (quadruped.cc:254-285), terrain raycast for foot targets
  (Ground(), utilities.cc:538-556), and the backflip trajectory
  (FlipHeight/FlipQuat, quadruped.cc:677-714). Stateful mode machinery
  (timers, filters, orientation snapshots) lives in hidden residual-param
  slots updated by the pure transition function."""
  if xml_string is not None:
    spec_model, _ = load_model(xml_string=xml_string, mj_patch=mj_patch)
  else:
    spec_model, _ = load_model(os.path.join(_MODELS_DIR, xml))
  torso = spec_model.site('torso_site')
  head = spec_model.site('head_site')
  trunk = spec_model.body('trunk')
  goal_mocap = spec_model.body_mocapid[spec_model.body('goal')]
  feet = [spec_model.geom(f'{f}_foot') for f in ('fl', 'fr', 'hl', 'hr')]
  home_qpos = None    # bound below after model load
  crouch_qpos = None
  idx = {}            # residual-param name -> index, bound after build
  widx = {}           # weight term name -> index

  gait_phase = jnp.asarray(_QUAD_GAIT_PHASE, dtype=jnp.float32)
  gait_duty = jnp.asarray(_QUAD_GAIT_DUTY, dtype=jnp.float32)
  # per-gait (duty, cadence, amplitude, balance_w, upright_w, height_w)
  # applied on gait switch (reference kGaitParam, quadruped.h:88-97)
  gait_table = jnp.asarray([
      [1.0, 1.0, 0.00, 0.0, 1.0, 1.0],
      [0.75, 1.0, 0.03, 0.0, 1.0, 1.0],
      [0.45, 2.0, 0.03, 0.2, 1.0, 1.0],
      [0.4, 4.0, 0.05, 0.03, 0.5, 0.2],
      [0.3, 3.5, 0.10, 0.03, 0.2, 0.1]], dtype=jnp.float32)
  # auto-gait speed thresholds (reference kGaitAuto)
  gait_auto = jnp.asarray([0.0, 0.02, 0.02, 0.6, 2.0, 1e9],
                          dtype=jnp.float32)

  # backflip trajectory constants (reference quadruped.cc:560-600)
  _g = 9.81
  _hq, _hcrouch, _hleap, _hmax = _QUAD_HEIGHT_GOAL, 0.15, 0.5, 0.8
  _jump_vel = float(np.sqrt(2 * _g * (_hmax - _hleap)))
  _flight_time = 2 * _jump_vel / _g
  _jump_acc = _jump_vel ** 2 / (2 * (_hleap - _hcrouch))
  _crouch_time = float(np.sqrt(2 * (_hq - _hcrouch) / _jump_acc))
  _leap_time = _jump_vel / _jump_acc
  _jump_time = _crouch_time + _leap_time
  _crouch_vel = -_jump_acc * _crouch_time
  _land_time = 2 * (_hleap - _hq) / _jump_vel
  _land_acc = _jump_vel / _land_time
  _flight_rot_vel = 1.25 * np.pi / _flight_time
  _jump_rot_vel = np.pi / _leap_time - _flight_rot_vel
  _jump_rot_acc = (_flight_rot_vel - _jump_rot_vel) / _leap_time
  _land_rot_acc = (2 * (_flight_rot_vel * _land_time - np.pi / 4)
                   / _land_time ** 2)
  _flip_total = _jump_time + _flight_time + _land_time

  def _flip_height(t, ground):
    h_jump = _hq + t * _crouch_vel + 0.5 * _jump_acc * t * t
    tf = t - _jump_time
    h_flight = _hleap + _jump_vel * tf - 0.5 * _g * tf * tf
    tl = t - _jump_time - _flight_time
    h_land = _hleap - _jump_vel * tl + 0.5 * _land_acc * tl * tl
    h = jnp.where(t < _jump_time, h_jump,
                  jnp.where(t < _jump_time + _flight_time, h_flight,
                            jnp.where(t < _flip_total, h_land, _hq)))
    return h + ground

  def _flip_angle(t):
    tc = t - _crouch_time
    a_leap = 0.5 * _jump_rot_acc * tc * tc + _jump_rot_vel * tc
    tf = t - _jump_time
    a_flight = jnp.pi / 2 + _flight_rot_vel * tf
    tl = t - _jump_time - _flight_time
    a_land = (1.75 * jnp.pi + _flight_rot_vel * tl
              - 0.5 * _land_rot_acc * tl * tl)
    return jnp.where(t < _crouch_time, 0.0,
                     jnp.where(t < _jump_time, a_leap,
                               jnp.where(t < _jump_time + _flight_time,
                                         a_flight,
                                         jnp.where(t < _flip_total, a_land,
                                                   2 * jnp.pi))))

  def residual(m, d, rp):
    dtype = d.qpos.dtype
    cadence, amplitude, duty_param = rp[0], rp[1], rp[2]
    walk_speed, heading = rp[3], rp[4]
    gait = jnp.clip(jnp.round(rp[idx['select_Gait']]).astype(jnp.int32),
                    0, 4)
    mode = jnp.clip(jnp.round(rp[idx['select_Mode']]).astype(jnp.int32),
                    0, 4)
    handstand = jnp.round(rp[idx['select_Biped type']]) > 0.5
    is_biped = mode == 1
    is_walk = mode == 2
    is_scramble = mode == 3
    is_flip = mode == 4
    mode_time = d.time - rp[idx['_mode_start']]
    flip_quat0 = rp[idx['_flip_quat_w']:idx['_flip_quat_w'] + 4]
    flip_ground = rp[idx['_flip_ground']]

    foot_pos = jnp.stack([d.geom_xpos[g] for g in feet])   # (4, 3)
    torso_pos = d.site_xpos[torso]
    head_pos = d.site_xpos[head]
    up = d.xmat[trunk][:, 2]

    # biped average foot: front or hind pair only (AverageFootPos)
    biped_pair = jnp.where(handstand, foot_pos[:2].mean(0),
                           foot_pos[2:].mean(0))
    avg_foot = jnp.where(is_biped, biped_pair, foot_pos.mean(0))

    # Upright: trunk z-axis vs world up; biped: x-axis vertical; flip:
    # orientation tracks the flip quaternion trajectory
    r_upright_quad = up - jnp.array([0.0, 0.0, 1.0], dtype=dtype)
    sgn = jnp.where(handstand, -1.0, 1.0)
    r_upright_biped = jnp.concatenate(
        [(d.xmat[trunk][2, 0] - sgn)[None], jnp.zeros(2, dtype=dtype)])
    axis = jnp.array([0.0, 1.0, 0.0], dtype=dtype)
    fq = tm.quat_mul(flip_quat0,
                     tm.axis_angle_to_quat(axis, _flip_angle(mode_time)))
    r_upright_flip = tm.quat_sub(d.xquat[trunk], fq)
    r_upright = jnp.where(is_flip, r_upright_flip,
                          jnp.where(is_biped, r_upright_biped,
                                    r_upright_quad))

    # Height
    height_goal = jnp.where(is_biped, 0.5, _QUAD_HEIGHT_GOAL)
    r_height_std = torso_pos[2] - avg_foot[2] - height_goal
    r_height_flip = torso_pos[2] - _flip_height(mode_time, flip_ground)
    r_height = jnp.where(is_scramble, 0.0,
                         jnp.where(is_flip, r_height_flip,
                                   r_height_std))[None]

    # Position: head to goal (walk target computed by the transition and
    # written into the goal mocap, so planning stays stateless here)
    goal = d.mocap_pos[goal_mocap]
    r_pos_z = jnp.where(is_scramble, 2.0 * (head_pos[2] - goal[2]), 0.0)
    r_position = jnp.concatenate([head_pos[:2] - goal[:2], r_pos_z[None]])

    # Gait: per-foot swing-height tracking over raycast terrain height.
    duty = jnp.where(duty_param > 0, duty_param,
                     gait_duty[gait]).astype(dtype)
    phase = jnp.mod(cadence * d.time + gait_phase[gait], 1.0)
    swing_frac = jnp.maximum(1.0 - duty, 1e-3)
    swing = jnp.clip((phase - duty) / swing_frac, 0.0, 1.0)
    target_h = amplitude * jnp.sin(jnp.pi * swing)
    is_stand = (gait == 0)
    target_h = jnp.where(is_stand, 0.0, target_h)
    ground = jnp.stack([support.ground_height(m, d, foot_pos[i])
                        for i in range(4)])
    r_gait = foot_pos[:, 2] - ground - _QUAD_FOOT_RADIUS - target_h
    # scramble: feet above target not penalized
    r_gait = jnp.where(is_scramble, jnp.minimum(r_gait, 0.0), r_gait)
    # biped: free the "hands"
    hand_mask = jnp.where(handstand,
                          jnp.array([0.0, 0.0, 1.0, 1.0], dtype=dtype),
                          jnp.array([1.0, 1.0, 0.0, 0.0], dtype=dtype))
    r_gait = jnp.where(is_biped, r_gait * hand_mask, r_gait)

    # Balance: capture point vs feet centroid
    com = d.subtree_com[trunk]
    com_vel = support.subtree_linvel(m, d, trunk)
    fall_time = jnp.sqrt(jnp.maximum(torso_pos[2] - avg_foot[2], 0.01)
                         / 9.81)
    capture = com[:2] + fall_time * com_vel[:2]
    r_balance = capture - avg_foot[:2]

    # Effort
    r_effort = 0.02 * d.actuator_force

    # Posture: home; crouch keyframe during flip crouch; free in flight
    posture_ref = jnp.where(
        jnp.logical_and(is_flip, mode_time < _crouch_time),
        crouch_qpos[7:], home_qpos[7:])
    r_posture = d.qpos[7:] - posture_ref
    in_flight = jnp.logical_and(
        is_flip, jnp.logical_and(mode_time >= _crouch_time,
                                 mode_time < _jump_time + _flight_time))
    r_posture = jnp.where(in_flight, 0.0, r_posture)
    # biped: loosen the hand legs (reference quadruped.cc:180-195)
    leg_scale = jnp.ones(12, dtype=dtype)
    front_loose = jnp.asarray([1, .03, .03, 1, .03, .03, 1, 1, 1, 1, 1, 1],
                              dtype=dtype)
    hind_loose = jnp.asarray([1, 1, 1, 1, 1, 1, 1, .03, .03, 1, .03, .03],
                             dtype=dtype)
    biped_scale = jnp.where(handstand, hind_loose, front_loose)
    r_posture = r_posture * jnp.where(is_biped, biped_scale, leg_scale)

    # Orientation: trunk heading vs goal direction / commanded heading;
    # biped: vertical axis becomes the heading axis
    fwd_quad = d.xmat[trunk][:2, 0]
    fwd_biped = sgn * d.xmat[trunk][:2, 2]
    fwd_vec = jnp.where(is_biped, fwd_biped, fwd_quad)
    fwd_vec = fwd_vec / jnp.maximum(jnp.linalg.norm(fwd_vec), 1e-6)
    to_goal = goal[:2] - torso_pos[:2]
    to_goal = to_goal / jnp.maximum(jnp.linalg.norm(to_goal), 1e-6)
    cmd_dir = jnp.stack([jnp.cos(heading), jnp.sin(heading)])
    desired = jnp.where(walk_speed > 1e-3, cmd_dir, to_goal)
    r_orient = fwd_vec - desired.astype(dtype)

    # Angmom
    r_angmom = support.subtree_angmom(m, d, trunk)

    return jnp.concatenate([
        r_upright, r_height, r_position, r_gait, r_balance,
        r_effort, r_posture, r_orient, r_angmom])

  def transition(m, d, params, key):
    """Mode state machine (reference TransitionLocked, quadruped.cc:225+):
    auto-gait switching on filtered com speed, per-gait parameter/weight
    presets, Walk goal trajectory, Flip entry snapshots."""
    rp = params.residual_params
    w = params.weights
    dtype = rp.dtype
    mode = jnp.clip(jnp.round(rp[idx['select_Mode']]).astype(jnp.int32),
                    0, 4)
    dt = jnp.maximum(d.time - rp[idx['_last_t']], 0.0)

    # filtered com speed (kAutoGaitFilter = 0.2 s)
    beta = jnp.exp(-dt / 0.2)
    com_vel = support.subtree_linvel(m, d, trunk)[:2]
    filt = (beta * rp[idx['_comvel_x']:idx['_comvel_x'] + 2]
            + (1 - beta) * com_vel)
    rp = jax.lax.dynamic_update_slice(rp, filt.astype(dtype),
                                      (idx['_comvel_x'],))

    # automatic gait switching (quadruped.cc:254-285): biped always trots
    speed = jnp.linalg.norm(filt)
    auto_on = jnp.round(rp[idx['select_Gait switch']]) > 0.5
    cur_gait = jnp.clip(jnp.round(rp[idx['select_Gait']]).astype(jnp.int32),
                        0, 4)
    waited = (d.time - rp[idx['_gait_switch_t']]) > 1.0
    in_range = jnp.logical_and(speed > gait_auto[:5],
                               speed <= gait_auto[1:6])
    in_range = in_range.at[4].set(speed > gait_auto[4])
    # scramble requires non-static gait
    in_range = in_range.at[0].set(
        jnp.logical_and(in_range[0], mode != 3))
    auto_gait = jnp.argmax(in_range)
    switch = jnp.logical_and(auto_on, jnp.logical_and(
        waited, auto_gait != cur_gait))
    new_gait = jnp.where(mode == 1, 2,
                         jnp.where(switch, auto_gait, cur_gait))
    rp = rp.at[idx['select_Gait']].set(new_gait.astype(dtype))
    rp = rp.at[idx['_gait_switch_t']].set(
        jnp.where(switch, d.time, rp[idx['_gait_switch_t']]))

    # apply per-gait presets on gait change (kGaitParam semantics)
    gait_changed = new_gait != jnp.clip(
        jnp.round(rp[idx['_cur_gait']]).astype(jnp.int32), 0, 4)
    preset = gait_table[new_gait]
    def put(r, i, v):
      return r.at[i].set(jnp.where(gait_changed, v, r[i]))
    rp = put(rp, 0, preset[1])                      # cadence
    rp = put(rp, 1, preset[2])                      # amplitude
    rp = put(rp, 2, preset[0])                      # duty
    w = w.at[widx['Balance']].set(
        jnp.where(gait_changed, preset[3], w[widx['Balance']]))
    w = w.at[widx['Upright']].set(
        jnp.where(gait_changed, preset[4], w[widx['Upright']]))
    w = w.at[widx['Height']].set(
        jnp.where(gait_changed, preset[5], w[widx['Height']]))
    rp = rp.at[idx['_cur_gait']].set(new_gait.astype(dtype))

    # mode entry: snapshot time / orientation / ground for Flip & Walk
    prev_mode = jnp.clip(jnp.round(rp[idx['_cur_mode']]).astype(jnp.int32),
                         0, 4)
    entered = mode != prev_mode
    rp = rp.at[idx['_mode_start']].set(
        jnp.where(entered, d.time, rp[idx['_mode_start']]))
    com = d.subtree_com[trunk]
    rp = jax.lax.dynamic_update_slice(
        rp,
        jnp.where(entered, d.xquat[trunk],
                  rp[idx['_flip_quat_w']:idx['_flip_quat_w'] + 4]
                  ).astype(dtype),
        (idx['_flip_quat_w'],))
    rp = rp.at[idx['_flip_ground']].set(
        jnp.where(entered, support.ground_height(m, d, com),
                  rp[idx['_flip_ground']]))
    # walk origin/heading snapshot
    torso_xy = d.xpos[trunk][:2]
    fwd = d.xmat[trunk][:2, 0]
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-6)
    leftward = jnp.stack([-fwd[1], fwd[0]])
    wspeed, wturn = rp[3], rp[idx['Walk turn']]
    use_turn = jnp.abs(wturn) > 0.01
    axis_xy = torso_xy + jnp.where(use_turn, (wspeed / jnp.where(
        use_turn, wturn, 1.0)) * leftward, 0.0)
    goal_xy = d.mocap_pos[goal_mocap][:2]
    rp = jax.lax.dynamic_update_slice(
        rp, jnp.where(entered, axis_xy,
                      rp[idx['_walk_pos_x']:idx['_walk_pos_x'] + 2]
                      ).astype(dtype), (idx['_walk_pos_x'],))
    rp = jax.lax.dynamic_update_slice(
        rp, jnp.where(entered, goal_xy - axis_xy,
                      rp[idx['_walk_head_x']:idx['_walk_head_x'] + 2]
                      ).astype(dtype), (idx['_walk_head_x'],))
    rp = rp.at[idx['_cur_mode']].set(mode.astype(dtype))
    rp = rp.at[idx['_last_t']].set(d.time)

    # Walk: move the goal along the circle/line (quadruped.cc:627-643)
    t_mode = d.time - rp[idx['_mode_start']]
    pos0 = rp[idx['_walk_pos_x']:idx['_walk_pos_x'] + 2]
    head0 = rp[idx['_walk_head_x']:idx['_walk_head_x'] + 2]
    hd_norm = head0 / jnp.maximum(jnp.linalg.norm(head0), 1e-6)
    straight = pos0 + head0 + t_mode * wspeed * hd_norm
    ang = t_mode * wturn
    rot = jnp.stack([jnp.stack([jnp.cos(ang), -jnp.sin(ang)]),
                     jnp.stack([jnp.sin(ang), jnp.cos(ang)])])
    circle = pos0 + rot @ head0
    walk_goal = jnp.where(use_turn, circle, straight)
    mocap = d.mocap_pos
    mocap = mocap.at[goal_mocap, :2].set(
        jnp.where(mode == 2, walk_goal.astype(dtype),
                  mocap[goal_mocap, :2]))

    # Quadruped/Scramble: re-randomize goal when reached
    reached = jnp.linalg.norm(torso_xy - goal_xy) < 0.25
    new_xy = jax.random.uniform(key, (2,), minval=-3.0, maxval=3.0,
                                dtype=mocap.dtype)
    randomize = jnp.logical_and(reached,
                                jnp.logical_or(mode == 0, mode == 3))
    mocap = mocap.at[goal_mocap, :2].set(
        jnp.where(randomize, new_xy, mocap[goal_mocap, :2]))

    return (d.replace(mocap_pos=mocap),
            params.replace(residual_params=rp, weights=w))

  spec = _build(name, xml, residual, transition, xml_string=xml_string,
                mj_patch=mj_patch,
                state_params=[
                    ('_mode_start', 0.0), ('_flip_quat_w', 1.0),
                    ('_flip_quat_x', 0.0), ('_flip_quat_y', 0.0),
                    ('_flip_quat_z', 0.0), ('_flip_ground', 0.0),
                    ('_comvel_x', 0.0), ('_comvel_y', 0.0),
                    ('_gait_switch_t', -10.0), ('_last_t', 0.0),
                    ('_cur_gait', 2.0), ('_cur_mode', 0.0),
                    ('_walk_pos_x', 0.0), ('_walk_pos_y', 0.0),
                    ('_walk_head_x', 1.0), ('_walk_head_y', 0.0)])
  home_qpos = spec.model.keyframe_qpos('home')
  crouch_qpos = spec.model.keyframe_qpos('crouch')
  for pname in spec.residual_param_names:
    idx[pname] = spec.residual_param_names.index(pname)
  for tname in spec.term_names:
    widx[tname] = spec.term_names.index(tname)
  return spec


@register('Quadruped Flat')
def _quadruped_flat() -> base.TaskSpec:
  return _make_quadruped('Quadruped Flat', 'quadruped.xml')


@register('Quadruped Hill')
def _quadruped_hill() -> base.TaskSpec:
  # rough-terrain variant (reference: QuadrupedHill, task_hill.xml) —
  # same residual machinery over a fractal-noise heightfield.
  return _make_quadruped('Quadruped Hill', 'quadruped.xml',
                         xml_string=_quadruped_hill_xml(),
                         mj_patch=_hill_patch)


# ---------------------------------------------------------------------------
# Humanoid Stand / Walk (reference: mjpc/tasks/humanoid/humanoid.cc —
# H1Stand/H1Walk cost-term sets) on an original capsule humanoid model.
# ---------------------------------------------------------------------------


def _make_humanoid(name: str, walk: bool,
                   xml: str = 'humanoid.xml') -> base.TaskSpec:
  spec_model, _ = load_model(os.path.join(_MODELS_DIR, xml))
  torso = spec_model.body('torso')
  head = spec_model.site('head_site')
  feet = [spec_model.site('right_foot_site'),
          spec_model.site('left_foot_site')]

  def residual(m, d, rp):
    dtype = d.qpos.dtype
    height_goal = rp[0]
    speed_goal = rp[1] if walk else jnp.zeros((), dtype=d.qpos.dtype)

    foot_pos = jnp.stack([d.site_xpos[s] for s in feet])
    avg_foot_z = jnp.mean(foot_pos[:, 2])

    # Height: head height above feet vs goal
    r_height = (d.site_xpos[head][2] - avg_foot_z - height_goal)[None]

    # Balance: capture point vs feet centroid
    com = d.subtree_com[torso]
    com_vel = support.subtree_linvel(m, d, torso)
    fall_time = jnp.sqrt(jnp.maximum(com[2] - avg_foot_z, 0.01) / 9.81)
    capture = com[:2] + fall_time * com_vel[:2]
    r_balance = capture - jnp.mean(foot_pos[:, :2], axis=0)

    # CoM Vel.: track commanded forward speed (0 for Stand)
    fwd_vec = d.xmat[torso][:2, 0]
    fwd_vec = fwd_vec / jnp.maximum(jnp.linalg.norm(fwd_vec), 1e-6)
    target_v = speed_goal * fwd_vec if walk else jnp.zeros(2, dtype=dtype)
    r_comvel = com_vel[:2] - target_v

    # Joint Vel. + Control regularizers
    r_jvel = 0.1 * d.qvel[6:]
    r_ctrl = d.ctrl

    # Upright: torso z-axis vs world up
    r_upright = d.xmat[torso][:, 2] - jnp.array([0., 0., 1.], dtype=dtype)

    return jnp.concatenate([r_height, r_balance, r_comvel, r_jvel, r_ctrl,
                            r_upright])

  return _build(name, xml, residual)


@register('Humanoid Stand')
def _humanoid_stand() -> base.TaskSpec:
  return _make_humanoid('Humanoid Stand', walk=False)


@register('Humanoid Walk')
def _humanoid_walk() -> base.TaskSpec:
  spec = _make_humanoid('Humanoid Walk', walk=True)
  # walk defaults: nonzero speed goal
  rp = np.array(spec.default_params.residual_params)
  rp[1] = 1.0
  params = spec.default_params.replace(
      residual_params=jnp.asarray(rp, dtype=spec.default_params
                                  .residual_params.dtype))
  return dataclasses.replace(spec, default_params=params)


# ---------------------------------------------------------------------------
# FreeFingers (reference: mjpc/tasks/fingers/fingers.cc — Reach/Bring/Control
# term set: two fingers reach a free cube and bring it to a mocap target)
# ---------------------------------------------------------------------------


@register('FreeFingers')
def _fingers() -> base.TaskSpec:
  spec_model, _ = load_model(os.path.join(_MODELS_DIR, 'fingers.xml'))
  tip_a = spec_model.site('finger_a_site')
  tip_b = spec_model.site('finger_b_site')
  obj = spec_model.site('object_site')
  target_mocap = spec_model.body_mocapid[spec_model.body('target')]

  def residual(m, d, rp):
    o = d.site_xpos[obj]
    reach = jnp.concatenate([d.site_xpos[tip_a] - o, d.site_xpos[tip_b] - o])
    bring = o - d.mocap_pos[target_mocap]
    return jnp.concatenate([reach, bring, d.ctrl])

  def transition(m, d, params, key):
    o = d.site_xpos[obj]
    t = d.mocap_pos[target_mocap]
    reached = jnp.linalg.norm(o - t) < 0.02
    new_xy = jax.random.uniform(key, (2,), minval=-0.15, maxval=0.15,
                                dtype=d.mocap_pos.dtype)
    xy = jnp.where(reached, new_xy, t[:2])
    mocap = d.mocap_pos.at[target_mocap, :2].set(xy)
    return d.replace(mocap_pos=mocap), params

  return _build('FreeFingers', 'fingers.xml', residual, transition)


# ---------------------------------------------------------------------------
# Panda (reference: mjpc/tasks/panda/panda.cc — Reach/Bring) and
# Panda Bring (reference: mjpc/tasks/manipulation/manipulation.cc —
# Reach/Bring/Careful/Away with goal-pose machinery), both on an original
# primitive-geometry 7-dof arm + pinch gripper.
# ---------------------------------------------------------------------------

_PANDA_BRING_SENSORS = """  <sensor>
    <user name="Reach" dim="3" user="2 1.0 0.0 5.0 0.005"/>
    <user name="Bring" dim="8" user="6 0.2 0.0 1.0 0.01"/>
    <user name="Careful" dim="1" user="6 0.2 0.0 1.0 0.01"/>
    <user name="Away" dim="1" user="6 0.0 0.0 1.0 0.01"/>
    <framepos name="object_position" objtype="site" objname="object_site"/>
  </sensor>"""


@register('Panda')
def _panda() -> base.TaskSpec:
  spec_model, _ = load_model(os.path.join(_MODELS_DIR, 'panda.xml'))
  pinch = spec_model.site('pinch_site')
  obj_site = spec_model.site('object_site')
  obj_body = spec_model.body('object')
  goal_mocap = spec_model.body_mocapid[spec_model.body('goal')]

  def residual(m, d, rp):
    o = d.site_xpos[obj_site]
    reach = d.site_xpos[pinch] - o
    bring_pos = o - d.mocap_pos[goal_mocap]
    # keep the cube upright while bringing
    from mujoco_mpc_tpu.utils import tpu_math as tm
    bring_rot = tm.quat_sub(d.xquat[obj_body], d.mocap_quat[goal_mocap])
    return jnp.concatenate([reach, bring_pos, bring_rot])

  def transition(m, d, params, key):
    o = d.site_xpos[obj_site]
    g = d.mocap_pos[goal_mocap]
    reached = jnp.linalg.norm(o - g) < 0.03
    new_xy = jax.random.uniform(key, (2,), minval=-0.45, maxval=0.45,
                                dtype=d.mocap_pos.dtype)
    xy = jnp.where(reached, new_xy, g[:2])
    mocap = d.mocap_pos.at[goal_mocap, :2].set(xy)
    return d.replace(mocap_pos=mocap), params

  return _build('Panda', 'panda.xml', residual, transition)


@register('Panda Bring')
def _panda_bring() -> base.TaskSpec:
  with open(os.path.join(_MODELS_DIR, 'panda.xml')) as f:
    xml = f.read()
  # swap the sensor cost spec for the manipulation term set
  start = xml.index('  <sensor>')
  end = xml.index('</sensor>') + len('</sensor>')
  xml = xml[:start] + _PANDA_BRING_SENSORS + xml[end:]
  xml = xml.replace('<mujoco model="Panda">', '<mujoco model="Panda Bring">')

  spec_model, _ = load_model(xml_string=xml)
  pinch = spec_model.site('pinch_site')
  obj_site = spec_model.site('object_site')
  obj_body = spec_model.body('object')
  goal_mocap = spec_model.body_mocapid[spec_model.body('goal')]

  def residual(m, d, rp):
    from mujoco_mpc_tpu.utils import tpu_math as tm
    o = d.site_xpos[obj_site]
    g = d.mocap_pos[goal_mocap]
    hand = d.site_xpos[pinch]
    reach = hand - o
    dist_to_goal = jnp.linalg.norm(o - g)
    at_goal = dist_to_goal < 0.03
    obj_vel = support.point_velocity(m, d, obj_body, o)
    bring = jnp.concatenate([
        o - g,
        tm.quat_sub(d.xquat[obj_body], d.mocap_quat[goal_mocap]),
        obj_vel[:2],
    ])
    # Careful: damp object speed when approaching the goal
    careful = (obj_vel @ obj_vel) * jnp.exp(-10.0 * dist_to_goal)
    # Away: once the object is at the goal, retract the hand
    away = jnp.where(at_goal,
                     jnp.maximum(0.0, 0.1 - jnp.linalg.norm(hand - o)), 0.0)
    return jnp.concatenate([reach, bring, careful[None], away[None]])

  def transition(m, d, params, key):
    o = d.site_xpos[obj_site]
    g = d.mocap_pos[goal_mocap]
    reached = jnp.linalg.norm(o - g) < 0.02
    new_xy = jax.random.uniform(key, (2,), minval=-0.45, maxval=0.45,
                                dtype=d.mocap_pos.dtype)
    xy = jnp.where(reached, new_xy, g[:2])
    mocap = d.mocap_pos.at[goal_mocap, :2].set(xy)
    return d.replace(mocap_pos=mocap), params

  return _build('Panda Bring', 'panda.xml', residual, transition,
                xml_string=xml)


# ---------------------------------------------------------------------------
# Dexterous hand tasks (reference: mjpc/tasks/shadow_reorient/hand.cc,
# mjpc/tasks/allegro/allegro.cc, mjpc/tasks/rubik/solve.cc). Original
# generated hand models (models/hands.py); same goal machinery:
# reorient-to-goal-quaternion with drop recovery, and the Rubik task's
# N-move unscramble sequence redesigned as a device-pure goal schedule in
# userdata (the reference runs a second mjModel + host state machine,
# solve.cc:35-49,140+).
# ---------------------------------------------------------------------------


def _hand_task(name: str, n_fingers: int,
               goal_schedule: Optional[np.ndarray] = None,
               mesh_cube: bool = False) -> base.TaskSpec:
  from mujoco_mpc_tpu.models import hands
  from mujoco_mpc_tpu.utils import tpu_math as tm

  xml = hands.hand_xml(name, n_fingers, mesh_cube=mesh_cube)
  spec_model, _ = load_model(xml_string=xml)
  cube = spec_model.body('cube')
  cube_site = spec_model.site('cube_site')
  palm_site = spec_model.site('palm_site')
  goal_mocap = spec_model.body_mocapid[spec_model.body('goal')]
  cube_qadr = 0  # cube free joint is first in the tree
  schedule = (jnp.asarray(goal_schedule, dtype=jnp.float32)
              if goal_schedule is not None else None)

  def goal_quat_of(d):
    if schedule is None:
      return d.mocap_quat[goal_mocap]
    idx = jnp.clip(d.userdata[0].astype(jnp.int32), 0,
                   schedule.shape[0] - 1)
    return schedule[idx].astype(d.qpos.dtype)

  def residual(m, d, rp):
    cube_pos = d.site_xpos[cube_site]
    # hold the cube above the palm center
    r_pos = cube_pos - (d.site_xpos[palm_site] +
                        jnp.array([0., 0., 0.045], dtype=d.qpos.dtype))
    r_quat = tm.quat_sub(d.xquat[cube], goal_quat_of(d))
    r_vel = 0.3 * d.cvel[cube]
    r_act = d.ctrl
    return jnp.concatenate([r_pos, r_quat, r_vel, r_act])

  def transition(m, d, params, key):
    err = jnp.linalg.norm(tm.quat_sub(d.xquat[cube], goal_quat_of(d)))
    solved = err < 0.25
    dropped = d.site_xpos[cube_site][2] < -0.12

    if schedule is None:
      # new random goal orientation on success (reference hand.cc goal
      # mocap resampling)
      q = jax.random.normal(key, (4,), dtype=d.mocap_quat.dtype)
      q = q / jnp.maximum(jnp.linalg.norm(q), 1e-9)
      new_quat = jnp.where(solved, q, d.mocap_quat[goal_mocap])
      d = d.replace(mocap_quat=d.mocap_quat.at[goal_mocap].set(new_quat))
    else:
      # advance the unscramble schedule (reference solve.cc state machine)
      idx = d.userdata[0]
      idx = jnp.where(solved, jnp.minimum(idx + 1,
                                          float(schedule.shape[0] - 1)), idx)
      d = d.replace(userdata=d.userdata.at[0].set(idx))
      d = d.replace(mocap_quat=d.mocap_quat.at[goal_mocap].set(
          goal_quat_of(d)))

    # drop recovery: teleport the cube back above the palm
    qpos = d.qpos
    reset_pose = jnp.concatenate([
        jnp.array([0., 0., 0.065, 1., 0., 0., 0.], dtype=qpos.dtype),
        qpos[7:]])
    qpos = jnp.where(dropped, reset_pose, qpos)
    qvel = jnp.where(dropped, jnp.zeros_like(d.qvel), d.qvel)
    return d.replace(qpos=qpos, qvel=qvel), params

  return _build(name, 'hands.py', residual, transition, xml_string=xml)


@register('Shadow Reorient')
def _shadow_reorient() -> base.TaskSpec:
  # chamfered-mesh cube: the contact-rich flagship runs on the convex
  # mesh-hull collision path (reference uses a rounded-cube mesh asset)
  return _hand_task('Shadow Reorient', n_fingers=4, mesh_cube=True)


@register('Allegro Cube')
def _allegro() -> base.TaskSpec:
  return _hand_task('Allegro Cube', n_fingers=3)


@register('Cube Solving')
def _cube_solving() -> base.TaskSpec:
  """Rubik solving on an INTERLOCKED 3x3x3 (reference:
  mjpc/tasks/rubik/solve.cc + cube_3x3x3.xml.patch): 26 cubelets — 6
  hinged centers + 20 ball-jointed edge/corner cubelets coupled through
  frictionless chamfered-hull contact — unscrambled move-by-move through
  the reference's goal-cache state machine. Scrambles are the exact
  group action (models/rubik.apply_move) instead of the reference's
  host-stepped transition model."""
  from mujoco_mpc_tpu.models import rubik as rubik_mod

  n_moves = 5
  states_np, cache_np, _moves = rubik_mod.scramble_states(n_moves, seed=11)
  xml = rubik_mod.rubik3x3_xml('Cube Solving', n_fingers=4,
                               cube_qpos=states_np[-1])
  spec_model, _ = load_model(xml_string=xml)
  cube = spec_model.body('cube')
  cube_site = spec_model.site('cube_site')
  palm_site = spec_model.site('palm_site')
  goal_mocap = spec_model.body_mocapid[spec_model.body('goal')]
  cache = jnp.asarray(cache_np, dtype=jnp.float32)   # (n_moves+1, 6)
  states = jnp.asarray(states_np, dtype=jnp.float32)  # (n_moves+1, 93)
  nhand = spec_model.nu
  face_qadr = 7                     # cube free joint (7) then 6 face dofs
  hand_qadr = 93                    # free 7 + hinges 6 + 20 ring quats 80
  idx = {}
  home_qpos = None

  def _rings_near(qring, gi):
    """True when every ring ball quat is within the cam-backlash cone
    (0.6 rad) of the exact group state `gi` — real layer transport
    (a ratcheted center leaves its ring a quarter-turn = 1.57 away)."""
    qq = qring.reshape(20, 4)
    tq = states[gi, 13:93].reshape(20, 4)
    dots = jnp.abs(jnp.sum(qq * tq, axis=1))
    ang = 2.0 * jnp.arccos(jnp.clip(dots, 0.0, 1.0))
    return jnp.all(ang < 0.6)

  def residual(m, d, rp):
    dtype = d.qpos.dtype
    cube_pos = d.site_xpos[cube_site]
    r_pos = cube_pos - (d.site_xpos[palm_site]
                        + jnp.array([0., 0., 0.05], dtype=dtype))
    r_quat = tm.quat_sub(d.xquat[cube], d.mocap_quat[goal_mocap])
    r_vel = d.cvel[cube][3:]
    r_act = d.actuator_force * 0.1
    # face-angle goals (solve.cc Residual (3)); zeroed in Wait mode
    mode = jnp.round(rp[idx['_mode']])
    faces = d.qpos[face_qadr:face_qadr + 6]
    r_faces = jnp.where(mode > 0.5, faces - rp[0:6], jnp.zeros(6, dtype))
    r_hand = d.qpos[hand_qadr:hand_qadr + nhand] - home_qpos[hand_qadr:]
    # progress bonus: remaining unscramble depth (solve.cc Residual (6))
    r_progress = rp[idx['_goal_index']][None]
    return jnp.concatenate([r_pos, r_quat, r_vel, r_act, r_faces, r_hand,
                            r_progress])

  def transition(m, d, params, key):
    """Unscramble state machine (solve.cc:209-230): face goals come from
    the cache at _goal_index; a move counts as achieved when the hinge
    is within the cam backlash of the goal AND every ring cubelet sits
    in the goal state's slot (real layer transport, not a ratcheted
    center). Achieving a goal snaps the cube's internal coordinates onto
    the exact group state — the detent a real cube's springs provide,
    realized as the same host-side qpos surgery the reference transition
    performs (solve.cc:167-189). At 0 -> Wait. Drop -> reset the cube
    into the hand, keep the schedule."""
    rp = params.residual_params
    dtype = rp.dtype
    gi = jnp.clip(jnp.round(rp[idx['_goal_index']]).astype(jnp.int32),
                  0, n_moves)
    mode = jnp.round(rp[idx['_mode']])
    faces = d.qpos[face_qadr:face_qadr + 6]
    goal = cache[gi].astype(dtype)
    err = jnp.linalg.norm(faces - goal)
    rings_ok = _rings_near(d.qpos[13:93], gi)
    achieved = jnp.logical_and(mode > 0.5,
                               jnp.logical_and(err < 0.4, rings_ok))
    solved = jnp.logical_and(achieved, gi == 0)
    gi_new = jnp.where(jnp.logical_and(achieved, gi > 0), gi - 1, gi)
    mode_new = jnp.where(solved, 0.0, mode)
    rp = rp.at[idx['_goal_index']].set(gi_new.astype(dtype))
    rp = rp.at[idx['_mode']].set(mode_new)
    # publish current goal into the visible face-goal parameters
    rp = jax.lax.dynamic_update_slice(
        rp, cache[gi_new].astype(dtype), (0,))

    # detent snap of the cube-internal coordinates (free pose + hand
    # untouched); zero the snapped dofs' velocities
    snap_qpos = jnp.concatenate([
        d.qpos[:7], states[gi][7:].astype(d.qpos.dtype), d.qpos[93:]])
    qpos = jnp.where(achieved, snap_qpos, d.qpos)
    cube_vel_mask = jnp.zeros_like(d.qvel).at[6:72].set(1.0)
    qvel = jnp.where(achieved, d.qvel * (1.0 - cube_vel_mask), d.qvel)

    dropped = d.site_xpos[cube_site][2] < -0.12
    reset_pose = jnp.concatenate([
        jnp.asarray([0., 0., 0.072, 1., 0., 0., 0.], dtype=d.qpos.dtype),
        qpos[7:]])
    qpos = jnp.where(dropped, reset_pose, qpos)
    qvel = jnp.where(dropped, jnp.zeros_like(d.qvel), qvel)
    return (d.replace(qpos=qpos, qvel=qvel),
            params.replace(residual_params=rp))

  spec = _build('Cube Solving', 'hands.py', residual, transition,
                xml_string=xml,
                state_params=[('_goal_index', float(n_moves - 1)),
                              ('_mode', 1.0)])
  home_qpos = spec.model.keyframe_qpos('home')
  for pname in spec.residual_param_names:
    idx[pname] = spec.residual_param_names.index(pname)
  # start face goals at the first unscramble target
  rp0 = np.array(spec.default_params.residual_params)
  rp0[0:6] = cache_np[n_moves - 1]
  params = spec.default_params.replace(
      residual_params=jnp.asarray(rp0, dtype=jnp.float32))
  return dataclasses.replace(spec, default_params=params)



# ---------------------------------------------------------------------------
# Bimanual tasks (reference: mjpc/tasks/bimanual/{handover,insert,reorient})
# on an original generated two-arm workcell (models/bimanual.py). The
# reference's contact-normal Grasp term (handover.cc:60-100 sums contact
# normals per finger) is redesigned as a device-pure antipodality measure
# over fingertip-to-object directions.
# ---------------------------------------------------------------------------


def _grasp_quality(d, tip_sites, obj_pos):
  """0 when fingertips oppose each other around the object."""
  dirs = []
  for s in tip_sites:
    v = obj_pos - d.site_xpos[s]
    dirs.append(v / jnp.maximum(jnp.linalg.norm(v), 1e-6))
  return jnp.linalg.norm(sum(dirs) / len(dirs))


def _bimanual_arm_sites(spec_model):
  gl = spec_model.site('left_gripper_site')
  gr = spec_model.site('right_gripper_site')
  tips_l = [spec_model.site('left_fa_site'), spec_model.site('left_fb_site')]
  tips_r = [spec_model.site('right_fa_site'),
            spec_model.site('right_fb_site')]
  return gl, gr, tips_l, tips_r


@register('Bimanual Handover')
def _bimanual_handover() -> base.TaskSpec:
  from mujoco_mpc_tpu.models import bimanual
  xml = bimanual.bimanual_xml('Bimanual Handover',
                              bimanual.HANDOVER_OBJECTS,
                              bimanual.HANDOVER_SENSORS)
  spec_model, _ = load_model(xml_string=xml)
  gl, gr, tips_l, tips_r = _bimanual_arm_sites(spec_model)
  obj = spec_model.site('object_site')
  target_mocap = spec_model.body_mocapid[spec_model.body('target')]

  def residual(m, d, rp):
    o = d.site_xpos[obj]
    # reach terms weight lateral alignment doubly (reference
    # handover.cc:36-46 scales the gripper-frame y/z components)
    scale = jnp.array([1.0, 2.0, 2.0], dtype=d.qpos.dtype)
    reach_l = (d.site_xpos[gl] - o) * scale
    reach_r = (d.site_xpos[gr] - o) * scale
    # nearest gripper does the grasping
    dl = jnp.linalg.norm(d.site_xpos[gl] - o)
    dr = jnp.linalg.norm(d.site_xpos[gr] - o)
    grasp = jnp.where(dl < dr, _grasp_quality(d, tips_l, o),
                      _grasp_quality(d, tips_r, o))
    bring = o - d.mocap_pos[target_mocap]
    return jnp.concatenate([reach_l, reach_r, grasp[None], bring])

  def transition(m, d, params, key):
    o = d.site_xpos[obj]
    t = d.mocap_pos[target_mocap]
    reached = jnp.linalg.norm(o - t) < 0.03
    kx, ky = jax.random.split(key)
    new_pos = jnp.stack([
        jax.random.uniform(kx, (), minval=-0.25, maxval=0.25),
        jax.random.uniform(ky, (), minval=-0.3, maxval=0.3),
        0.25]).astype(d.mocap_pos.dtype)
    pos = jnp.where(reached, new_pos, t)
    return d.replace(mocap_pos=d.mocap_pos.at[target_mocap].set(pos)), params

  return _build('Bimanual Handover', 'bimanual.py', residual, transition,
                xml_string=xml)


@register('Bimanual Insert')
def _bimanual_insert() -> base.TaskSpec:
  from mujoco_mpc_tpu.models import bimanual
  from mujoco_mpc_tpu.utils import tpu_math as tm
  xml = bimanual.bimanual_xml('Bimanual Insert', bimanual.INSERT_OBJECTS,
                              bimanual.INSERT_SENSORS)
  spec_model, _ = load_model(xml_string=xml)
  gl, gr, tips_l, tips_r = _bimanual_arm_sites(spec_model)
  peg = spec_model.body('peg')
  peg_site = spec_model.site('peg_site')
  peg_tip = spec_model.site('peg_tip')
  socket = spec_model.site('socket_site')

  def residual(m, d, rp):
    p = d.site_xpos[peg_site]
    reach_l = d.site_xpos[gl] - p
    reach_r = d.site_xpos[gr] - p
    grasp_l = _grasp_quality(d, tips_l, p)
    grasp_r = _grasp_quality(d, tips_r, p)
    lift = jnp.maximum(0.0, 0.12 - p[2])
    # insert: peg tip into socket opening, peg axis vertical
    tip_err = d.site_xpos[peg_tip] - d.site_xpos[socket]
    axis = d.xmat[peg][:, 2]
    axis_err = axis - jnp.array([0., 0., 1.], dtype=d.qpos.dtype)
    return jnp.concatenate([reach_l, reach_r, grasp_l[None], grasp_r[None],
                            lift[None], tip_err, axis_err])

  return _build('Bimanual Insert', 'bimanual.py', residual, xml_string=xml)


@register('Bimanual Reorient')
def _bimanual_reorient() -> base.TaskSpec:
  from mujoco_mpc_tpu.models import bimanual
  from mujoco_mpc_tpu.utils import tpu_math as tm
  xml = bimanual.bimanual_xml('Bimanual Reorient', bimanual.REORIENT_OBJECTS,
                              bimanual.REORIENT_SENSORS)
  spec_model, _ = load_model(xml_string=xml)
  gl, gr, tips_l, tips_r = _bimanual_arm_sites(spec_model)
  obj = spec_model.body('object')
  obj_site = spec_model.site('object_site')
  goal_mocap = spec_model.body_mocapid[spec_model.body('goal')]

  def residual(m, d, rp):
    o = d.site_xpos[obj_site]
    reach_l = d.site_xpos[gl] - o
    reach_r = d.site_xpos[gr] - o
    grasp_l = _grasp_quality(d, tips_l, o)
    grasp_r = _grasp_quality(d, tips_r, o)
    bring = jnp.concatenate([
        o - d.mocap_pos[goal_mocap] * jnp.array([1., 1., 0.],
                                                dtype=d.qpos.dtype)
        - jnp.array([0., 0., 0.025], dtype=d.qpos.dtype),
        tm.quat_sub(d.xquat[obj], d.mocap_quat[goal_mocap])])
    return jnp.concatenate([reach_l, reach_r, grasp_l[None], grasp_r[None],
                            bring])

  def transition(m, d, params, key):
    err = jnp.linalg.norm(tm.quat_sub(d.xquat[obj],
                                      d.mocap_quat[goal_mocap]))
    solved = err < 0.2
    q = jax.random.normal(key, (4,), dtype=d.mocap_quat.dtype)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-9)
    # restrict goals to rotations about z (objects stay on the table)
    q = jnp.stack([q[0], 0. * q[1], 0. * q[2], q[3]])
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-9)
    new_quat = jnp.where(solved, q, d.mocap_quat[goal_mocap])
    return d.replace(
        mocap_quat=d.mocap_quat.at[goal_mocap].set(new_quat)), params

  return _build('Bimanual Reorient', 'bimanual.py', residual, transition,
                xml_string=xml)


@register('OP3 Stand')
def _op3_stand() -> base.TaskSpec:
  # reference: mjpc/tasks/op3/stand.cc — small-biped standing balance;
  # shares the biped stand residual machinery on an original OP3-scale model
  return _make_humanoid('OP3 Stand', walk=False, xml='op3.xml')


# ---------------------------------------------------------------------------
# Humanoid Track (reference: mjpc/tasks/humanoid/tracking/tracking.cc —
# mocap clips baked as model keyframes at a fixed fps, linear keyframe
# interpolation inside the residual, tracking.cc:40-54,101-110). The clip
# here is an original procedural walk cycle; the tracking machinery
# (keyframe bake + device-side interpolation) is the capability.
# ---------------------------------------------------------------------------

_TRACK_FPS = 30.0
_TRACK_SECONDS = 12.0
_TRACK_MARKERS = (
    'torso', 'pelvis', 'right_thigh', 'right_shin', 'right_foot',
    'left_thigh', 'left_shin', 'left_foot', 'right_upper_arm',
    'right_lower_arm', 'left_upper_arm', 'left_lower_arm')


def _track_clip_qpos() -> np.ndarray:
  """A 12 s, 30 fps multi-phase motion clip for humanoid.xml (nq=24):
  walk straight -> 90-degree turn -> walk -> slow to a stop. No-egress
  stand-in for the reference's CMU clips (tracking.cc:41-54) with the
  same structure: a long clip whose per-body marker trajectories are
  baked and tracked (not just qpos)."""
  n = int(_TRACK_FPS * _TRACK_SECONDS)
  freq, amp = 1.4, 0.5
  qs = np.zeros((n, 24))
  x, y, yaw = 0.0, 0.0, 0.0
  for i in range(n):
    t = i / _TRACK_FPS
    # phase plan: speed and turn rate
    if t < 4.0:
      speed, yaw_rate = 0.8, 0.0
    elif t < 6.0:
      speed, yaw_rate = 0.6, np.pi / 4    # 90 degrees over 2 s
    elif t < 10.0:
      speed, yaw_rate = 0.8, 0.0
    else:
      speed, yaw_rate = max(0.0, 0.8 * (12.0 - t) / 2.0), 0.0
    yaw += yaw_rate / _TRACK_FPS
    x += speed * np.cos(yaw) / _TRACK_FPS
    y += speed * np.sin(yaw) / _TRACK_FPS
    ph = 2 * np.pi * freq * t
    gait = min(speed / 0.8, 1.0)          # gait amplitude scales w/ speed
    q = np.zeros(24)
    q[0], q[1] = x, y
    q[2] = 1.33 + 0.01 * gait * np.cos(2 * ph)
    q[3], q[6] = np.cos(yaw / 2), np.sin(yaw / 2)
    q[7] = 0.04 * gait * np.sin(ph)
    q[11] = -amp * gait * np.sin(ph) - 0.1
    q[12] = 0.4 * gait * max(0.0, np.sin(ph + np.pi / 2)) + 0.1
    q[13] = -0.15 * gait * np.sin(ph)
    q[15] = amp * gait * np.sin(ph) - 0.1
    q[16] = 0.4 * gait * max(0.0, -np.sin(ph + np.pi / 2)) + 0.1
    q[17] = 0.15 * gait * np.sin(ph)
    q[19], q[20] = 0.25 * gait * np.sin(ph), -0.3
    q[22], q[23] = -0.25 * gait * np.sin(ph), -0.3
    qs[i] = q
  return qs


# reference marker name -> (our body, local site offset): the 16 CMU
# mocap markers (tracking.cc body_names) placed on the equivalent points
# of our original humanoid (models/humanoid.xml)
_CMU_SITE_MAP = (
    ('pelvis', 'pelvis', '0 0 0'),
    ('head', 'torso', '0 0 0.33'),
    ('ltoe', 'left_foot', '0.135 0 -0.02'),
    ('rtoe', 'right_foot', '0.135 0 -0.02'),
    ('lheel', 'left_foot', '-0.045 0 -0.02'),
    ('rheel', 'right_foot', '-0.045 0 -0.02'),
    ('lknee', 'left_shin', '0 0 0'),
    ('rknee', 'right_shin', '0 0 0'),
    ('lhand', 'left_lower_arm', '0 0 -0.24'),
    ('rhand', 'right_lower_arm', '0 0 -0.24'),
    ('lelbow', 'left_lower_arm', '0 0 0'),
    ('relbow', 'right_lower_arm', '0 0 0'),
    ('lshoulder', 'left_upper_arm', '0 0 0'),
    ('rshoulder', 'right_upper_arm', '0 0 0'),
    ('lhip', 'left_thigh', '0 0 0'),
    ('rhip', 'right_thigh', '0 0 0'),
)


def _track_xml(nmark: int) -> str:
  """Humanoid model with marker sites + the tracking cost terms."""
  with open(os.path.join(_MODELS_DIR, 'humanoid.xml')) as f:
    xml = f.read()
  sensors = f"""  <sensor>
    <user name="Joint Vel" dim="17" user="0 0.01 0.0 0.1"/>
    <user name="Control" dim="17" user="0 0.01 0.0 0.1"/>
    <user name="Avg Pos" dim="3" user="2 5.0 0.0 10.0 0.01"/>
    <user name="Marker Pos" dim="{3 * nmark}" user="2 2.0 0.0 10.0 0.02"/>
    <user name="Marker Vel" dim="{3 * nmark}" user="0 0.05 0.0 0.5"/>
    <framepos name="torso_position" objtype="site" objname="torso_site"/>
  </sensor>"""
  start = xml.index('  <sensor>')
  end = xml.index('</sensor>') + len('</sensor>')
  xml = xml[:start] + sensors + xml[end:]
  xml = xml.replace('<mujoco model="Humanoid">',
                    '<mujoco model="Humanoid Track">')
  # inject the marker sites right after each body's opening tag
  for marker, body, off in _CMU_SITE_MAP:
    open_tag = f'<body name="{body}"'
    i = xml.index(open_tag)
    j = xml.index('>', i) + 1
    xml = (xml[:j] + f'<site name="marker[{marker}]" pos="{off}"/>'
           + xml[j:])
  return xml


@register('Humanoid Track')
def _humanoid_track() -> base.TaskSpec:
  """Mocap tracking on the reference's real CMU clips (reference:
  mjpc/tasks/humanoid/tracking/tracking.cc): the 10 CMU motions shipped
  in the reference checkout (task.xml keyframe includes) are parsed as
  16-marker position streams at 30 fps (tasks/reference.load_cmu_clips),
  with linear inter-frame interpolation, the centered per-marker
  position residual (tracking.cc:152-187), finite-difference marker
  velocity residuals (tracking.cc:189-210), and a reference-time
  transition (tracking.cc:263-296). Motion id selected by the `_clip`
  parameter (the reference's mode). Falls back to a procedural gait
  clip when the reference checkout is absent."""
  from mujoco_mpc_tpu.tasks import reference as ref_mod

  use_cmu = ref_mod.cmu_clips_available()
  if use_cmu:
    mpos, starts_np, lengths_np = ref_mod.load_cmu_clips()
    nmark = len(ref_mod.CMU_MARKERS)
    marker_names = [f'marker[{n}]' for n in ref_mod.CMU_MARKERS]
    default_clip = 9.0                       # walk (CMU-137-137_40)
  else:
    nmark = len(_TRACK_MARKERS)
    marker_names = None
    default_clip = 0.0

  xml = _track_xml(nmark)
  spec_model, mjm_probe = load_model(xml_string=xml)

  if use_cmu:
    marker_sites = np.asarray([spec_model.site(n) for n in marker_names],
                              dtype=np.int32)
    markers_np = mpos                         # (N, 16, 3) real CMU data
    starts = jnp.asarray(starts_np)
    lengths = jnp.asarray(lengths_np)
  else:
    # procedural fallback: bake marker tracks from the sine-gait clip
    import mujoco
    marker_bodies = [spec_model.body(b) for b in _TRACK_MARKERS]
    nclip = int(_TRACK_FPS * _TRACK_SECONDS)
    clip_q = _track_clip_qpos()
    mjd_probe = mujoco.MjData(mjm_probe)
    markers_np = np.zeros((nclip, nmark, 3))
    for i in range(nclip):
      mjd_probe.qpos[:] = clip_q[i]
      mujoco.mj_kinematics(mjm_probe, mjd_probe)
      for k, b in enumerate(marker_bodies):
        markers_np[i, k] = mjd_probe.xpos[b]
    marker_sites = None
    starts = jnp.asarray([0], dtype=jnp.int32)
    lengths = jnp.asarray([nclip], dtype=jnp.int32)

  markers_j = jnp.asarray(markers_np, dtype=jnp.float32)
  idx = {}

  def _frames(t, clip):
    """Reference ComputeInterpolationValues (tracking.cc:28-39) with the
    per-motion start/length window (tracking.cc:57-66)."""
    start = starts[clip]
    last = start + lengths[clip] - 1
    ft = jnp.clip(t * _TRACK_FPS + start, start, last)
    i0 = jnp.floor(ft).astype(jnp.int32)
    return i0, jnp.minimum(i0 + 1, last), ft - i0

  def residual(m, d, rp):
    dtype = d.qpos.dtype
    clip = jnp.clip(jnp.round(rp[idx['_clip']]).astype(jnp.int32),
                    0, starts.shape[0] - 1)
    t = d.time - rp[idx['_ref_time']]
    i0, i1, a = _frames(t, clip)
    m0 = markers_j[i0].astype(dtype)            # (nmark, 3)
    m1 = markers_j[i1].astype(dtype)
    target = (1.0 - a) * m0 + a * m1

    if marker_sites is not None:
      cur = d.site_xpos[jnp.asarray(marker_sites)]
      cur_v = jnp.stack([support.site_linvel(m, d, int(s))
                         for s in marker_sites])
    else:
      mb = [spec_model.body(b) for b in _TRACK_MARKERS]
      cur = d.xpos[jnp.asarray(mb)]
      cur_v = jnp.stack([support.point_velocity(m, d, b, d.xpos[b])
                         for b in mb])
    avg_t = target.mean(axis=0)
    avg_c = cur.mean(axis=0)
    r_avg = avg_t - avg_c
    r_pos = ((target - avg_t) - (cur - avg_c)).reshape(-1)

    # finite-difference marker velocity (tracking.cc:189-210): the
    # reference differences the UNWEIGHTED bracketing frames
    target_v = (m1 - m0) * _TRACK_FPS
    r_vel = (target_v - cur_v).reshape(-1)

    return jnp.concatenate([d.qvel[6:], d.ctrl, r_avg, r_pos, r_vel])

  def transition(m, d, params, key):
    """Reference-time handling (tracking.cc TransitionLocked): on a time
    reset (sim reset / rewind), restart the clip from the current time."""
    rp = params.residual_params
    jumped_back = d.time < rp[idx['_last_time']]
    ref = jnp.where(jumped_back, d.time, rp[idx['_ref_time']])
    rp = rp.at[idx['_ref_time']].set(ref.astype(rp.dtype))
    rp = rp.at[idx['_last_time']].set(d.time.astype(rp.dtype))
    return d, params.replace(residual_params=rp)

  spec = _build('Humanoid Track', 'humanoid.xml', residual, transition,
                xml_string=xml,
                state_params=[('_ref_time', 0.0), ('_last_time', 0.0),
                              ('_clip', default_clip)])
  for pname in spec.residual_param_names:
    idx[pname] = spec.residual_param_names.index(pname)
  # start the sim aligned with the clip's first frame: free-joint pose
  # from the pelvis marker + hip-line yaw
  key_qpos = spec.model.key_qpos
  if 'home' in spec.model.keyframe_names:
    k = spec.model.keyframe_names.index('home')
    q0 = np.array(np.asarray(key_qpos[k]))
    if use_cmu:
      f0 = markers_np[int(starts_np[int(default_clip)])]
      pelvis = f0[0]
      lhip, rhip = f0[14], f0[15]
      yaw = float(np.arctan2(*(lhip - rhip)[[0, 1]][::-1])) - np.pi / 2.0
      # our torso sits 0.41 above the pelvis at home
      q0[:3] = [pelvis[0], pelvis[1], pelvis[2] + 0.41]
      q0[3:7] = [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]
    else:
      q0 = np.asarray(_track_clip_qpos()[0])
    key_qpos = key_qpos.at[k].set(jnp.asarray(q0, dtype=key_qpos.dtype))
  model = spec.model.replace(key_qpos=key_qpos)
  return dataclasses.replace(spec, model=model)


# ---------------------------------------------------------------------------
# Humanoid Interact (reference: mjpc/tasks/humanoid/interact/interact.cc —
# contact-keyframe-driven sit/stand interaction with scene objects) —
# redesigned as a chair-sitting task with a seat target.
# ---------------------------------------------------------------------------


# number of contact-pair slots in a keyframe
# (reference kNumberOfContactPairsInteract, contact_keyframe.h:28)
_INTERACT_NPAIRS = 5
# per-mode weight presets over the 13 terms, applied on mode switch by the
# transition (reference default_weights + TransitionLocked, interact.h:42-48,
# interact.cc:200-206); rows: Sitting, Standing, Relaxing, StayingStill
_INTERACT_MODE_WEIGHTS = (
    (10., 10., 5., 5., 0., 20., 30., 0., 0., 0., 0.01, 0.1, 80.),
    (10., 0., 1., 1., 80., 0., 0., 100., 0., 0., 0.01, 0.025, 0.),
    (0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.01, 0.8, 80.),
    (0., 0., 0., 0., 0., 0., 0., 0., 0., 50., 20., 0.025, 80.),
)


@register('Humanoid Interact')
def _humanoid_interact() -> base.TaskSpec:
  """Humanoid scene interaction with contact keyframes.

  Reference parity: mjpc/tasks/humanoid/interact/{interact.cc,
  contact_keyframe.h} — a ContactKeyframe holds up to 5 contact pairs
  (body1/local_pos1 <-> body2/local_pos2), an xy facing target, and
  per-mode weight presets (Sitting/Standing/Relaxing/StayingStill).
  Here the keyframe lives in residual parameters (kf{i}_* slots), so the
  GUI/RPC can retarget contacts live without recompiling, and the mode
  preset swap runs in the pure transition function."""
  with open(os.path.join(_MODELS_DIR, 'humanoid.xml')) as f:
    xml = f.read()
  chair = """    <body name="chair" pos="-0.4 0 0">
      <geom name="seat" type="box" size="0.25 0.3 0.03" pos="0 0 0.42"
            contype="1" conaffinity="2" friction="1.0"/>
      <geom name="chair_leg1" type="box" size="0.03 0.03 0.2"
            pos="0.2 0.25 0.2" contype="0" conaffinity="0"/>
      <geom name="chair_leg2" type="box" size="0.03 0.03 0.2"
            pos="0.2 -0.25 0.2" contype="0" conaffinity="0"/>
      <geom name="chair_leg3" type="box" size="0.03 0.03 0.2"
            pos="-0.2 0.25 0.2" contype="0" conaffinity="0"/>
      <geom name="chair_leg4" type="box" size="0.03 0.03 0.2"
            pos="-0.2 -0.25 0.2" contype="0" conaffinity="0"/>
      <site name="seat_site" pos="0 0 0.48"/>
    </body>
"""
  # 13 cost terms in the reference's residual order (interact.cc:165-199)
  sensors = """  <sensor>
    <user name="Up Torso" dim="1" user="0 10.0 0.0 20.0"/>
    <user name="Up Pelvis" dim="1" user="0 10.0 0.0 20.0"/>
    <user name="Up Foot R" dim="1" user="0 5.0 0.0 20.0"/>
    <user name="Up Foot L" dim="1" user="0 5.0 0.0 20.0"/>
    <user name="Head Height" dim="1" user="0 0.0 0.0 100.0"/>
    <user name="Torso Height" dim="1" user="0 20.0 0.0 100.0"/>
    <user name="Knee Feet XY" dim="1" user="0 30.0 0.0 100.0"/>
    <user name="COM Feet XY" dim="1" user="0 0.0 0.0 100.0"/>
    <user name="Facing" dim="1" user="0 0.0 0.0 10.0"/>
    <user name="COM Vel" dim="2" user="0 0.0 0.0 100.0"/>
    <user name="Joint Vel" dim="17" user="0 0.01 0.0 20.0"/>
    <user name="Control" dim="17" user="0 0.1 0.0 1.0"/>
    <user name="Contact" dim="15" user="0 80.0 0.0 200.0"/>
    <framepos name="torso_position" objtype="site" objname="torso_site"/>
  </sensor>"""
  numerics = ['    <numeric name="residual_head_height" data="1.5 0 2"/>',
              '    <numeric name="residual_torso_height" data="1.1 0 2"/>',
              '    <numeric name="residual_facing_x" data="0 -3 3"/>',
              '    <numeric name="residual_facing_y" data="0 -3 3"/>',
              '    <numeric name="residual_facing_active" data="0 0 1"/>']
  for i in range(_INTERACT_NPAIRS):
    numerics.append(
        f'    <numeric name="residual_kf{i}_body1" data="-1 -1 40"/>')
    numerics.append(
        f'    <numeric name="residual_kf{i}_body2" data="-1 -1 40"/>')
    for fld in ('l1x', 'l1y', 'l1z', 'l2x', 'l2y', 'l2z'):
      numerics.append(
          f'    <numeric name="residual_kf{i}_{fld}" data="0 -1 1"/>')
  numerics.append('    <numeric name="residual_select_mode" data="0 3"/>')
  custom = '  <custom>\n' + '\n'.join(numerics) + '\n  </custom>\n'

  start = xml.index('  <sensor>')
  end = xml.index('</sensor>') + len('</sensor>')
  xml = xml[:start] + sensors + xml[end:]
  xml = xml.replace('<mujoco model="Humanoid">',
                    '<mujoco model="Humanoid Interact">\n' + custom)
  xml = xml.replace('    <body name="torso" pos="0 0 1.4">',
                    chair + '    <body name="torso" pos="0 0 1.4">')

  spec_model, _ = load_model(xml_string=xml)
  torso = spec_model.body('torso')
  pelvis_b = spec_model.body('pelvis')
  feet_b = [spec_model.body('right_foot'), spec_model.body('left_foot')]
  knees_b = [spec_model.body('right_shin'), spec_model.body('left_shin')]
  head_s = spec_model.site('head_site')
  torso_s = spec_model.site('torso_site')
  nbody = len(spec_model.body_parentid)
  idx = {}   # residual-param name -> index, bound after build

  def _up(d, body):
    return jnp.abs(d.xmat[body][2, 2] - 1.0)

  def residual(m, d, rp):
    dtype = d.qpos.dtype
    up = jnp.stack([_up(d, torso), _up(d, pelvis_b), _up(d, feet_b[0]),
                    _up(d, feet_b[1])])
    head_h = jnp.abs(d.site_xpos[head_s][2] - rp[idx['head_height']])
    torso_h = jnp.abs(d.site_xpos[torso_s][2] - rp[idx['torso_height']])
    knee_xy = 0.5 * (d.xpos[knees_b[0]][:2] + d.xpos[knees_b[1]][:2])
    foot_xy = 0.5 * (d.xpos[feet_b[0]][:2] + d.xpos[feet_b[1]][:2])
    knee_feet = jnp.linalg.norm(knee_xy - foot_xy)
    com = d.subtree_com[torso]
    com_feet = jnp.linalg.norm(com[:2] - foot_xy)
    # facing-direction residual (interact.cc:96-113)
    tpos = d.site_xpos[torso_s][:2]
    target = jnp.stack([rp[idx['facing_x']], rp[idx['facing_y']]]) - tpos
    target = target / jnp.maximum(jnp.linalg.norm(target), 1e-6)
    fwd = d.xmat[torso][:2, 0]
    facing = (jnp.linalg.norm(target - fwd)
              * (rp[idx['facing_active']] > 0.5))
    com_vel = support.subtree_linvel(m, d, torso)[:2]
    # contact-pair residual (interact.cc:115-144): per-pair |p1 - p2| xyz
    contacts = []
    for i in range(_INTERACT_NPAIRS):
      b1f = rp[idx[f'kf{i}_body1']]
      b2f = rp[idx[f'kf{i}_body2']]
      b1 = jnp.clip(jnp.round(b1f).astype(jnp.int32), 0, nbody - 1)
      b2 = jnp.clip(jnp.round(b2f).astype(jnp.int32), 0, nbody - 1)
      l1 = rp[idx[f'kf{i}_l1x']:idx[f'kf{i}_l1x'] + 3]
      l2 = rp[idx[f'kf{i}_l2x']:idx[f'kf{i}_l2x'] + 3]
      g1 = d.xpos[b1] + d.xmat[b1] @ l1
      g2 = d.xpos[b2] + d.xmat[b2] @ l2
      active = jnp.logical_and(b1f >= -0.5, b2f >= -0.5).astype(dtype)
      contacts.append(jnp.abs(g1 - g2) * active)
    return jnp.concatenate([
        up, head_h[None], torso_h[None], knee_feet[None], com_feet[None],
        facing[None], com_vel, d.qvel[6:], d.ctrl] + contacts)

  widx = {}  # weight term index, bound after build
  mode_w = jnp.asarray(_INTERACT_MODE_WEIGHTS, dtype=jnp.float32)

  def transition(m, d, params, key):
    """Apply the per-mode weight preset when the mode changes
    (reference TransitionLocked, interact.cc:200-206)."""
    rp = params.residual_params
    mode = jnp.clip(jnp.round(rp[idx['select_mode']]).astype(jnp.int32),
                    0, 3)
    prev = jnp.clip(jnp.round(rp[idx['_cur_mode']]).astype(jnp.int32), 0, 3)
    changed = mode != prev
    preset = mode_w[mode]
    w = params.weights
    order = [widx[n] for n in
             ('Up Torso', 'Up Pelvis', 'Up Foot R', 'Up Foot L',
              'Head Height', 'Torso Height', 'Knee Feet XY', 'COM Feet XY',
              'Facing', 'COM Vel', 'Joint Vel', 'Control', 'Contact')]
    new_w = w.at[jnp.asarray(order)].set(preset.astype(w.dtype))
    w = jnp.where(changed, new_w, w)
    rp = rp.at[idx['_cur_mode']].set(mode.astype(rp.dtype))
    return d, params.replace(weights=w, residual_params=rp)

  spec = _build('Humanoid Interact', 'humanoid.xml', residual,
                transition_fn=transition, xml_string=xml,
                state_params=(('_cur_mode', 0.0),))
  idx.update({n: i for i, n in enumerate(spec.residual_param_names)})
  widx.update({n: i for i, n in enumerate(spec.term_names)})
  return spec
