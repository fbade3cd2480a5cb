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
           xml_path: str = None) -> base.TaskSpec:
  """Assemble a TaskSpec from an MJCF file + residual function.

  xml: filename relative to the built-in models dir; xml_path: absolute
  path (e.g. a staged reference task.xml); xml_string: inline MJCF."""
  if xml_string is not None:
    model, mjm = load_model(xml_string=xml_string, dtype=dtype)
  else:
    path = xml_path or os.path.join(_MODELS_DIR, xml)
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


def _quadruped_hill_xml() -> str:
  """Rough-terrain quadruped MJCF: the flat model plus fixed box steps
  (reference QuadrupedHill uses a heightfield, task_hill.xml; box steps
  give the same capability on the primitive-collider pipeline)."""
  with open(os.path.join(_MODELS_DIR, 'quadruped.xml')) as f:
    xml = f.read()
  rng = np.random.RandomState(7)
  boxes = []
  for i in range(12):
    x = float(rng.uniform(0.8, 3.2))
    y = float(rng.uniform(-2.0, 2.0))
    h = float(rng.uniform(0.02, 0.07))
    sx = float(rng.uniform(0.15, 0.4))
    sy = float(rng.uniform(0.15, 0.4))
    yaw = float(rng.uniform(0, 180))
    boxes.append(
        f'    <geom name="step{i}" type="box" pos="{x:.3f} {y:.3f} {h:.3f}"'
        f' size="{sx:.3f} {sy:.3f} {h:.3f}" euler="0 0 {yaw:.1f}"'
        f' friction="1.0" contype="1" conaffinity="2"/>')
  terrain = '\n'.join(boxes)
  return xml.replace('<mujoco model="Quadruped">',
                     '<mujoco model="Quadruped Hill">').replace(
      '  </worldbody>', terrain + '\n  </worldbody>')


def _make_quadruped(name: str, xml: str, xml_string: str = None
                    ) -> base.TaskSpec:
  if xml_string is not None:
    spec_model, _ = load_model(xml_string=xml_string)
  else:
    spec_model, _ = load_model(os.path.join(_MODELS_DIR, xml))
  torso = spec_model.site('torso_site')
  trunk = spec_model.body('trunk')
  goal_mocap = spec_model.body_mocapid[spec_model.body('goal')]
  feet = [spec_model.geom(f'{f}_foot') for f in ('fl', 'fr', 'hl', 'hr')]
  home_qpos = None  # bound below after model load

  gait_phase = jnp.asarray(_QUAD_GAIT_PHASE, dtype=jnp.float32)
  gait_duty = jnp.asarray(_QUAD_GAIT_DUTY, dtype=jnp.float32)

  def residual(m, d, rp):
    dtype = d.qpos.dtype
    cadence, amplitude, duty_param = rp[0], rp[1], rp[2]
    walk_speed, heading = rp[3], rp[4]
    gait = jnp.clip(jnp.round(rp[5]).astype(jnp.int32), 0, 4)

    foot_pos = jnp.stack([d.geom_xpos[g] for g in feet])   # (4, 3)
    torso_pos = d.site_xpos[torso]
    up = d.xmat[trunk][:, 2]

    # Upright: trunk z-axis vs world up
    r_upright = up - jnp.array([0.0, 0.0, 1.0], dtype=dtype)

    # Height: trunk height above average foot height vs target
    avg_foot_z = jnp.mean(foot_pos[:, 2])
    r_height = (torso_pos[2] - avg_foot_z - _QUAD_HEIGHT_GOAL)[None]

    # Position: torso to goal (xy; z free)
    goal = d.mocap_pos[goal_mocap]
    r_position = jnp.concatenate([torso_pos[:2] - goal[:2],
                                  jnp.zeros((1,), dtype=dtype)])

    # Gait: per-foot swing-height tracking. Normalized phase p in [0,1);
    # stance (p < duty) target height 0, swing target = amp * sin bump.
    duty = jnp.where(duty_param > 0, duty_param,
                     gait_duty[gait]).astype(dtype)
    phase = jnp.mod(cadence * d.time + gait_phase[gait], 1.0)
    swing_frac = jnp.maximum(1.0 - duty, 1e-3)
    swing = jnp.clip((phase - duty) / swing_frac, 0.0, 1.0)
    target_h = amplitude * jnp.sin(jnp.pi * swing)
    is_stand = (gait == 0)
    target_h = jnp.where(is_stand, 0.0, target_h)
    r_gait = foot_pos[:, 2] - _QUAD_FOOT_RADIUS - target_h

    # Balance: capture point (com + com_vel * sqrt(h/g)) vs feet centroid
    com = d.subtree_com[trunk]
    com_vel = support.subtree_linvel(m, d, trunk)
    fall_time = jnp.sqrt(jnp.maximum(torso_pos[2] - avg_foot_z, 0.01) / 9.81)
    capture = com[:2] + fall_time * com_vel[:2]
    feet_centroid = jnp.mean(foot_pos[:, :2], axis=0)
    r_balance = capture - feet_centroid

    # Effort: actuator forces (normalized by gear-free position servos)
    r_effort = 0.02 * d.actuator_force

    # Posture: joint angles vs home keyframe
    r_posture = d.qpos[7:] - home_qpos[7:]

    # Orientation: trunk heading vs goal direction (or commanded Heading
    # when Walk speed is set)
    fwd_vec = d.xmat[trunk][:2, 0]
    fwd_vec = fwd_vec / jnp.maximum(jnp.linalg.norm(fwd_vec), 1e-6)
    to_goal = goal[:2] - torso_pos[:2]
    to_goal = to_goal / jnp.maximum(jnp.linalg.norm(to_goal), 1e-6)
    cmd_dir = jnp.stack([jnp.cos(heading), jnp.sin(heading)])
    desired = jnp.where(walk_speed > 1e-3, cmd_dir, to_goal)
    r_orient = fwd_vec - desired.astype(dtype)

    # Angmom: subtree angular momentum about com
    r_angmom = support.subtree_angmom(m, d, trunk)

    return jnp.concatenate([
        r_upright, r_height, r_position, r_gait, r_balance,
        r_effort, r_posture, r_orient, r_angmom])

  def transition(m, d, params, key):
    torso_xy = d.site_xpos[torso][:2]
    goal_xy = d.mocap_pos[goal_mocap][:2]
    reached = jnp.linalg.norm(torso_xy - goal_xy) < 0.25
    new_xy = jax.random.uniform(key, (2,), minval=-3.0, maxval=3.0,
                                dtype=d.mocap_pos.dtype)
    xy = jnp.where(reached, new_xy, goal_xy)
    mocap = d.mocap_pos.at[goal_mocap, :2].set(xy)
    return d.replace(mocap_pos=mocap), params

  spec = _build(name, xml, residual, transition, xml_string=xml_string)
  home_qpos = spec.model.keyframe_qpos('home')
  return spec


@register('Quadruped Flat')
def _quadruped_flat() -> base.TaskSpec:
  return _make_quadruped('Quadruped Flat', 'quadruped.xml')


@register('Quadruped Hill')
def _quadruped_hill() -> base.TaskSpec:
  # rough-terrain variant (reference: QuadrupedHill, task_hill.xml) —
  # same residual machinery over a terrain of fixed box obstacles.
  return _make_quadruped('Quadruped Hill', 'quadruped.xml',
                         xml_string=_quadruped_hill_xml())


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
               goal_schedule: Optional[np.ndarray] = None) -> base.TaskSpec:
  from mujoco_mpc_tpu.models import hands
  from mujoco_mpc_tpu.utils import tpu_math as tm

  xml = hands.hand_xml(name, n_fingers)
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
  return _hand_task('Shadow Reorient', n_fingers=4)


@register('Allegro Cube')
def _allegro() -> base.TaskSpec:
  return _hand_task('Allegro Cube', n_fingers=3)


def _rubik_schedule(n_moves: int = 10, seed: int = 11) -> np.ndarray:
  """Cumulative goal quaternions for an n-move face-turn unscramble:
  each move is a 90-degree rotation about a principal axis."""
  rng = np.random.RandomState(seed)
  goals = [np.array([1.0, 0, 0, 0])]
  q = goals[0]
  for _ in range(n_moves):
    axis = np.zeros(3)
    axis[rng.randint(3)] = 1.0
    sign = rng.choice([-1.0, 1.0])
    half = sign * np.pi / 4
    dq = np.concatenate([[np.cos(half)], np.sin(half) * axis])
    # compose: q' = dq * q
    w0, x0, y0, z0 = dq
    w1, x1, y1, z1 = q
    q = np.array([
        w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
        w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
        w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
    ])
    goals.append(q / np.linalg.norm(q))
  return np.stack(goals)


@register('Cube Solving')
def _cube_solving() -> base.TaskSpec:
  return _hand_task('Cube Solving', n_fingers=4,
                    goal_schedule=_rubik_schedule())


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
_TRACK_SECONDS = 4.0


def _walk_clip_keyframes() -> str:
  """Procedural walking-gait keyframes for humanoid.xml (nq=24)."""
  n = int(_TRACK_FPS * _TRACK_SECONDS)
  speed, freq, amp = 0.8, 1.4, 0.5
  keys = []
  for i in range(n):
    t = i / _TRACK_FPS
    ph = 2 * np.pi * freq * t
    q = np.zeros(24)
    q[0] = speed * t                      # root x advances
    q[2] = 1.33 + 0.01 * np.cos(2 * ph)   # slight bob
    q[3] = 1.0                            # identity quat
    # abdomen_z/y/x
    q[7] = 0.04 * np.sin(ph)
    # right leg: hip_x, hip_y, knee, ankle
    q[10] = 0.0
    q[11] = -amp * np.sin(ph) - 0.1
    q[12] = 0.4 * max(0.0, np.sin(ph + np.pi / 2)) + 0.1
    q[13] = -0.15 * np.sin(ph)
    # left leg (antiphase)
    q[14] = 0.0
    q[15] = amp * np.sin(ph) - 0.1
    q[16] = 0.4 * max(0.0, -np.sin(ph + np.pi / 2)) + 0.1
    q[17] = 0.15 * np.sin(ph)
    # arms swing in antiphase with legs
    q[18], q[19], q[20] = 0.0, 0.25 * np.sin(ph), -0.3
    q[21], q[22], q[23] = 0.0, -0.25 * np.sin(ph), -0.3
    keys.append('    <key name="clip%d" qpos="%s"/>'
                % (i, ' '.join('%.5f' % v for v in q)))
  return '\n'.join(keys)


@register('Humanoid Track')
def _humanoid_track() -> base.TaskSpec:
  with open(os.path.join(_MODELS_DIR, 'humanoid.xml')) as f:
    xml = f.read()
  sensors = """  <sensor>
    <user name="Track Pose" dim="17" user="0 1.0 0.0 5.0"/>
    <user name="Track Root" dim="3" user="2 5.0 0.0 10.0 0.01"/>
    <user name="Track Vel" dim="3" user="0 0.5 0.0 2.0"/>
    <user name="Control" dim="17" user="0 0.01 0.0 0.1"/>
    <framepos name="torso_position" objtype="site" objname="torso_site"/>
  </sensor>"""
  start = xml.index('  <sensor>')
  end = xml.index('</sensor>') + len('</sensor>')
  xml = xml[:start] + sensors + xml[end:]
  xml = xml.replace('<mujoco model="Humanoid">',
                    '<mujoco model="Humanoid Track">')
  xml = xml.replace('  <keyframe>',
                    '  <keyframe>\n' + _walk_clip_keyframes())

  spec_model, _ = load_model(xml_string=xml)
  torso = spec_model.body('torso')
  nclip = int(_TRACK_FPS * _TRACK_SECONDS)

  def clip_qpos(m, t):
    """Linearly interpolated clip pose at time t (reference
    tracking.cc:101-110)."""
    ft = jnp.clip(t * _TRACK_FPS, 0.0, nclip - 1.001)
    i0 = jnp.floor(ft).astype(jnp.int32)
    a = (ft - i0).astype(m.key_qpos.dtype)
    q0 = m.key_qpos[i0]
    q1 = m.key_qpos[jnp.minimum(i0 + 1, nclip - 1)]
    return (1.0 - a) * q0 + a * q1

  def residual(m, d, rp):
    ref = clip_qpos(m, d.time)
    pose = d.qpos[7:] - ref[7:]
    root = d.qpos[:3] - ref[:3]
    com_vel = support.subtree_linvel(m, d, torso)
    target_v = jnp.array([0.8, 0.0, 0.0], dtype=d.qpos.dtype)
    vel = com_vel - target_v
    return jnp.concatenate([pose, root, vel, d.ctrl])

  return _build('Humanoid Track', 'humanoid.xml', residual, xml_string=xml)


# ---------------------------------------------------------------------------
# Humanoid Interact (reference: mjpc/tasks/humanoid/interact/interact.cc —
# contact-keyframe-driven sit/stand interaction with scene objects) —
# redesigned as a chair-sitting task with a seat target.
# ---------------------------------------------------------------------------


@register('Humanoid Interact')
def _humanoid_interact() -> base.TaskSpec:
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
  sensors = """  <sensor>
    <user name="Sit" dim="3" user="2 5.0 0.0 10.0 0.01"/>
    <user name="Upright" dim="3" user="6 3.0 0.0 10.0 0.05"/>
    <user name="Still" dim="2" user="0 1.0 0.0 5.0"/>
    <user name="Control" dim="17" user="0 0.02 0.0 0.1"/>
    <framepos name="torso_position" objtype="site" objname="torso_site"/>
  </sensor>"""
  start = xml.index('  <sensor>')
  end = xml.index('</sensor>') + len('</sensor>')
  xml = xml[:start] + sensors + xml[end:]
  xml = xml.replace('<mujoco model="Humanoid">',
                    '<mujoco model="Humanoid Interact">')
  xml = xml.replace('    <body name="torso" pos="0 0 1.4">',
                    chair + '    <body name="torso" pos="0 0 1.4">')

  spec_model, _ = load_model(xml_string=xml)
  torso = spec_model.body('torso')
  pelvis = spec_model.site('pelvis_site')
  seat = spec_model.site('seat_site')

  def residual(m, d, rp):
    sit = d.site_xpos[pelvis] - d.site_xpos[seat]
    upright = d.xmat[torso][:, 2] - jnp.array([0., 0., 1.],
                                              dtype=d.qpos.dtype)
    com_vel = support.subtree_linvel(m, d, torso)
    return jnp.concatenate([sit, upright, com_vel[:2], d.ctrl])

  return _build('Humanoid Interact', 'humanoid.xml', residual,
                xml_string=xml)
