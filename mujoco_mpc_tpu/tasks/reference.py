"""Interop with the reference mujoco_mpc task configs.

The reference (thowell/mujoco_mpc) builds its mesh-free task models by
patching dm_control suite MJCFs and including them from a task.xml
(reference: mjpc/tasks/CMakeLists.txt `patch -o ..._modified.xml`). This
module reproduces that assembly at run time — copy the dm_control model,
apply the reference's .patch, stage task.xml + common.xml — and builds
TaskSpecs whose residuals mirror the reference C++ residual functions, so
the SAME task configuration (model, cost terms, weights, planner settings)
can be planned by this framework and compared against a MuJoCo oracle
(tests/test_reference_parity.py).

Supported tasks (all mesh-free): Cartpole, Acrobot, Swimmer, Walker,
Particle, Humanoid Stand + Walk (the contact-rich dm_control humanoid),
and the self-contained Fingers (elliptic condim-6 cones, implicit
integrator). Residual semantics: mjpc/tasks/{cartpole/cartpole.cc:36-49,
acrobot/acrobot.cc:36-51, swimmer/swimmer.cc:33-44, walker/walker.cc:38-56,
particle/particle.cc:36-56, humanoid/stand/stand.cc:40-95,
humanoid/walk/walk.cc:44-165, fingers/fingers.cc:30-57}.

The fingers config's <option noslip_iterations="5"/> runs the noslip
post-pass (physics/noslip.py) on both engines; dynamics parity tests
compare with it active.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import jax.numpy as jnp

from mujoco_mpc_tpu.physics import support
from mujoco_mpc_tpu.tasks import base

REFERENCE_ROOT = os.environ.get('MJPC_REFERENCE_ROOT', '/root/reference')

# task dir -> dm_control suite model it is patched from
# (reference: mjpc/tasks/CMakeLists.txt:20-63)
_DM_SOURCE = {
    'cartpole': 'cartpole',
    'acrobot': 'acrobot',
    'swimmer': 'swimmer',
    'walker': 'walker',
    'particle': 'point_mass',
}

# tasks whose task.xml is self-contained (no dm_control base model)
_SELF_CONTAINED = ('fingers',)

# tasks whose loadable config is not named task.xml (reference
# Particle/ParticleFixed load task_timevarying.xml, particle.cc:24)
_TASK_XML = {'particle': 'task_timevarying.xml'}

# tasks whose task.xml lives in a nested dir one level below the patched
# model (reference humanoid/{stand,walk,tracking}/task.xml include
# ../humanoid_modified.xml and ../../common.xml)
_NESTED = {'humanoid_stand': ('humanoid', 'stand'),
           'humanoid_walk': ('humanoid', 'walk')}


def available() -> bool:
  """True if the reference checkout + dm_control + `patch` are present."""
  if not os.path.isdir(os.path.join(REFERENCE_ROOT, 'mjpc', 'tasks')):
    return False
  if shutil.which('patch') is None:
    return False
  try:
    import dm_control  # noqa: F401
  except ImportError:
    return False
  return True


def assemble_task_xml(task: str, cache_dir: Optional[str] = None) -> str:
  """Stage the reference task model; returns the path to a loadable task.xml.

  Mirrors the reference build (mjpc/tasks/CMakeLists.txt): dm_control
  suite XML + reference patch -> <task>_modified.xml, plus the reference's
  task.xml and shared common.xml.
  """
  if (task not in _DM_SOURCE and task not in _SELF_CONTAINED
      and task not in _NESTED):
    raise ValueError(f'unsupported reference task {task!r}; supported: '
                     f'{sorted(_DM_SOURCE) + sorted(_SELF_CONTAINED) + sorted(_NESTED)}')
  if cache_dir is None:
    cache_dir = os.path.join(
        os.environ.get('XDG_CACHE_HOME',
                       os.path.join(os.path.expanduser('~'), '.cache')),
        'mjpc_tpu', 'reference_tasks')

  if task in _NESTED:
    # e.g. humanoid_stand: model dir humanoid/ holds the patched model,
    # humanoid/stand/task.xml is the loadable config
    # (reference mjpc/tasks/CMakeLists.txt:35-41)
    model_name, sub = _NESTED[task]
    model_dir = os.path.join(cache_dir, model_name)
    task_dir = os.path.join(model_dir, sub)
    out_xml = os.path.join(task_dir, 'task.xml')
    if os.path.exists(out_xml):
      return out_xml
    os.makedirs(task_dir, exist_ok=True)
    import dm_control
    dm_xml = os.path.join(os.path.dirname(dm_control.__file__), 'suite',
                          model_name + '.xml')
    base_xml = os.path.join(model_dir, f'{model_name}.xml')
    shutil.copy(dm_xml, base_xml)
    ref_model_dir = os.path.join(REFERENCE_ROOT, 'mjpc', 'tasks',
                                 model_name)
    modified = os.path.join(model_dir, f'{model_name}_modified.xml')
    with open(os.path.join(ref_model_dir,
                           f'{model_name}.xml.patch'), 'rb') as pf:
      subprocess.run(['patch', '-s', '-o', modified, base_xml], stdin=pf,
                     check=True)
    shutil.copy(os.path.join(REFERENCE_ROOT, 'mjpc', 'tasks',
                             'common.xml'),
                os.path.join(cache_dir, 'common.xml'))
    shutil.copy(os.path.join(ref_model_dir, sub, 'task.xml'), out_xml)
    return out_xml

  task_dir = os.path.join(cache_dir, task)
  out_xml = os.path.join(task_dir, 'task.xml')
  ref_task_dir = os.path.join(REFERENCE_ROOT, 'mjpc', 'tasks', task)
  if os.path.exists(out_xml):
    return out_xml
  os.makedirs(task_dir, exist_ok=True)

  if task in _SELF_CONTAINED:
    shutil.copy(os.path.join(REFERENCE_ROOT, 'mjpc', 'tasks',
                             'common.xml'),
                os.path.join(cache_dir, 'common.xml'))
    shutil.copy(os.path.join(ref_task_dir, 'task.xml'), out_xml)
    return out_xml

  import dm_control
  dm_xml = os.path.join(os.path.dirname(dm_control.__file__), 'suite',
                        _DM_SOURCE[task] + '.xml')
  base_xml = os.path.join(task_dir, f'{task}.xml')
  shutil.copy(dm_xml, base_xml)
  patch_file = os.path.join(ref_task_dir, f'{task}.xml.patch')
  modified = os.path.join(task_dir, f'{task}_modified.xml')
  with open(patch_file, 'rb') as pf:
    subprocess.run(['patch', '-s', '-o', modified, base_xml], stdin=pf,
                   check=True)
  shutil.copy(os.path.join(REFERENCE_ROOT, 'mjpc', 'tasks', 'common.xml'),
              os.path.join(cache_dir, 'common.xml'))
  shutil.copy(os.path.join(ref_task_dir, _TASK_XML.get(task, 'task.xml')),
              out_xml)
  return out_xml


# ---------------------------------------------------------------------------
# Residuals mirroring the reference C++ (cited per function)
# ---------------------------------------------------------------------------


def _sensor_meta(m, name):
  """(objtype, objid) of a named (non-user) sensor."""
  idx = m.sensor_names.index(name)
  return m.sensor_objtype[idx], m.sensor_objid[idx]


def _frame_pos(m, d, objtype, objid):
  """Sensor-convention frame position (mj_sensorPos FRAMEPOS)."""
  if objtype == 6:    # site
    return d.site_xpos[objid]
  if objtype == 5:    # geom
    return d.geom_xpos[objid]
  if objtype == 1:    # body (inertial frame)
    return d.xipos[objid]
  return d.xpos[objid]


def _cartpole_residual(m, d, rp):
  # reference: cartpole.cc:36-49
  return jnp.stack([
      jnp.cos(d.qpos[1]) - 1.0,   # Vertical
      d.qpos[0] - rp[0],          # Centered
      d.qvel[1],                  # Velocity
      d.ctrl[0],                  # Control
  ])


def _make_acrobot_residual(m):
  # reference: acrobot.cc:36-51 (site 0 = goal, site 1 = tip)
  def residual(m_, d, rp):
    goal = d.site_xpos[0]
    tip = d.site_xpos[1]
    return jnp.stack([
        goal[2] - tip[2],
        goal[0] - tip[0],
        d.qvel[0],
        d.qvel[1],
        d.ctrl[0],
    ])
  return residual


def _make_swimmer_residual(m):
  # reference: swimmer.cc:33-44 (controls; nose->target XY displacement)
  nose_t, nose_i = _sensor_meta(m, 'nose')
  targ_t, targ_i = _sensor_meta(m, 'target')

  def residual(m_, d, rp):
    nose = _frame_pos(m_, d, nose_t, nose_i)
    target = _frame_pos(m_, d, targ_t, targ_i)
    return jnp.concatenate([d.ctrl, (nose - target)[:2]])
  return residual


def _make_walker_residual(m):
  # reference: walker.cc:38-56
  torso = m.body('torso')

  def residual(m_, d, rp):
    height = d.xpos[torso][2]
    torso_up = d.xmat[torso][2, 2]
    com_vel = support.subtree_linvel(m_, d, torso)[0]
    return jnp.concatenate([
        d.ctrl,
        jnp.stack([height - rp[0], torso_up - 1.0, com_vel - rp[1]]),
    ])
  return residual


def _make_particle_residual(m, fixed=False):
  # reference: particle.cc:36-56 — position - goal (2d), velocity (2d),
  # control (2d). Particle tracks a Lissajous goal analytic in time
  # (particle.cc:55-56: 0.25 sin(t), 0.25 cos(t/pi)); ParticleFixed reads
  # the goal mocap body.
  pos_t, pos_i = _sensor_meta(m, 'position')
  vel_t, vel_i = _sensor_meta(m, 'velocity')

  def residual(m_, d, rp):
    if fixed:
      goal = d.mocap_pos[0][:2]
    else:
      goal = 0.25 * jnp.stack([jnp.sin(d.time),
                               jnp.cos(d.time / jnp.pi)])
    pos = _frame_pos(m_, d, pos_t, pos_i)[:2]
    vel = support.site_linvel(m_, d, vel_i)[:2]
    return jnp.concatenate([pos - goal, vel, d.ctrl])
  return residual


def _make_humanoid_stand_residual(m):
  # reference: humanoid/stand/stand.cc:40-95 — Height (head z above feet
  # sites minus goal), Balance (capture point vs average feet xy), CoM
  # velocity (2d), joint velocity (nv-6), control. Capture point =
  # com + kFallTime * com_vel with kFallTime = 0.2 (stand.cc:60-63).
  sps = [_sensor_meta(m, f'sp{i}') for i in range(4)]
  head = _sensor_meta(m, 'head_position')
  torso = m.body('torso')

  def residual(m_, d, rp):
    f = jnp.stack([_frame_pos(m_, d, *s) for s in sps])      # (4, 3)
    height = _frame_pos(m_, d, *head)[2] - 0.25 * jnp.sum(f[:, 2])
    com = d.subtree_com[torso]
    com_vel = support.subtree_linvel(m_, d, torso)
    capture = com[:2] + 0.2 * com_vel[:2]
    balance = jnp.linalg.norm(0.25 * jnp.sum(f[:, :2], axis=0) - capture)
    return jnp.concatenate([
        jnp.stack([height - rp[0], balance]), com_vel[:2], d.qvel[6:],
        d.ctrl])
  return residual


def _make_humanoid_walk_residual(m):
  # reference: humanoid/walk/walk.cc:44-165 — torso height, pelvis-feet
  # alignment, balance (capture point projected onto the feet segment),
  # upright (torso/pelvis/feet z-axes), posture, walk (com speed along
  # the average forward axis), move-feet, control. All terms scaled by
  # the "standing" factor as in the C++ (walk.cc:89-95).
  torso = m.body('torso')
  pelvis = m.body('pelvis')
  foot_r = m.body('foot_right')
  foot_l = m.body('foot_left')
  waist = m.body('waist_lower')

  def residual(m_, d, rp):
    torso_z = d.xipos[torso][2]
    fr, fl = d.xipos[foot_r], d.xipos[foot_l]
    r_height = torso_z - rp[0]
    r_pf = 0.5 * (fl[2] + fr[2]) - d.xipos[pelvis][2] - 0.2

    com = d.subtree_com[torso]
    com_vel3 = support.subtree_linvel(m_, d, torso)
    capture = com + 0.3 * com_vel3
    capture = capture.at[2].set(1e-3)
    axis = (fr - fl).at[2].set(1e-3)
    axis_norm = jnp.linalg.norm(axis)
    axis_u = axis / jnp.maximum(axis_norm, 1e-12)
    length = 0.5 * axis_norm - 0.05
    center = 0.5 * (fr + fl)
    t = jnp.clip(jnp.dot(capture - center, axis_u), -length, length)
    pcp = center + t * axis_u
    standing = torso_z / jnp.sqrt(torso_z * torso_z + 0.45 * 0.45) - 0.4
    r_balance = standing * (capture[:2] - pcp[:2])

    z_ref = jnp.array([0.0, 0.0, 1.0], dtype=d.qpos.dtype)
    r_up = jnp.concatenate([
        jnp.stack([d.xmat[torso][2, 2] - 1.0,
                   0.3 * (d.xmat[pelvis][2, 2] - 1.0)]),
        0.1 * standing * (d.xmat[foot_r][:, 2] - z_ref),
        0.1 * standing * (d.xmat[foot_l][:, 2] - z_ref)])

    r_post = d.qpos[7:]

    fw = (d.xmat[torso][:2, 0] + d.xmat[pelvis][:2, 0]
          + d.xmat[foot_r][:2, 0] + d.xmat[foot_l][:2, 0])
    fw = fw / jnp.maximum(jnp.linalg.norm(fw), 1e-12)
    torso_vel = support.point_velocity(m_, d, torso, d.xipos[torso])
    com_vel = 0.5 * (support.subtree_linvel(m_, d, waist)[:2]
                     + torso_vel[:2])
    r_walk = standing * (jnp.dot(com_vel, fw) - rp[1])

    frv = support.point_velocity(m_, d, foot_r, fr)[:2]
    flv = support.point_velocity(m_, d, foot_l, fl)[:2]
    r_move = standing * (com_vel - 0.5 * frv - 0.5 * flv)

    return jnp.concatenate([
        jnp.stack([r_height, r_pf]), r_balance, r_up, r_post,
        jnp.stack([r_walk]), r_move, d.ctrl])
  return residual


def _make_fingers_residual(m):
  # reference: fingers.cc:30-57 — reach (finger_a/b -> object, 3d each),
  # bring (3 site-pair distances), control
  fa = _sensor_meta(m, 'finger_a')
  fb = _sensor_meta(m, 'finger_b')
  obj = _sensor_meta(m, 'object')
  pairs = [(_sensor_meta(m, str(i)), _sensor_meta(m, f'{i}t'))
           for i in range(3)]

  def residual(m_, d, rp):
    box = _frame_pos(m_, d, *obj)
    reach_a = _frame_pos(m_, d, *fa) - box
    reach_b = _frame_pos(m_, d, *fb) - box
    bring = jnp.stack([
        jnp.linalg.norm(_frame_pos(m_, d, *p) - _frame_pos(m_, d, *t))
        for p, t in pairs])
    return jnp.concatenate([reach_a, reach_b, bring, d.ctrl])
  return residual


def get_reference_task(task: str, dtype=jnp.float64) -> base.TaskSpec:
  """Build a TaskSpec from the actual reference task configuration.

  Model, cost terms (user sensors), weights, norm types/params and agent/
  planner settings all come from the reference task.xml; only the residual
  function is re-implemented (pure JAX, mirroring the task's .cc)."""
  from mujoco_mpc_tpu.tasks import registry as registry_mod

  xml_path = assemble_task_xml(task)
  name = f'Reference {task.capitalize()}'
  from mujoco_mpc_tpu.physics.model import load_model
  model, mjm = load_model(xml_path, dtype=dtype)

  if task == 'cartpole':
    residual_fn = _cartpole_residual
  elif task == 'acrobot':
    residual_fn = _make_acrobot_residual(model)
  elif task == 'swimmer':
    residual_fn = _make_swimmer_residual(model)
  elif task == 'walker':
    residual_fn = _make_walker_residual(model)
  elif task == 'particle':
    residual_fn = _make_particle_residual(model)
  elif task == 'humanoid_stand':
    residual_fn = _make_humanoid_stand_residual(model)
  elif task == 'humanoid_walk':
    residual_fn = _make_humanoid_walk_residual(model)
  elif task == 'fingers':
    residual_fn = _make_fingers_residual(model)
  else:
    raise ValueError(task)

  # reuse the registry's TaskSpec assembly (user sensors -> terms, custom
  # numerics -> config/residual params)
  spec = registry_mod._build(name, None, residual_fn, dtype=dtype,
                             xml_path=xml_path)
  return spec


# ---------------------------------------------------------------------------
# CMU mocap clips (reference: mjpc/tasks/humanoid/tracking/keyframes/*.xml,
# baked into the tracking task model as keyframes at 30 fps;
# tracking.cc:42-56 hardcodes the per-clip lengths)
# ---------------------------------------------------------------------------

# (file stem, frames) in the reference's motion-id order
# (tracking.cc kMotionLengths + task.xml keyframe include order)
CMU_CLIPS = (
    ('CMU-CMU-02-02_04', 121),    # jump
    ('CMU-CMU-87-87_01', 154),    # kick spin
    ('CMU-CMU-88-88_06', 115),    # spin kick
    ('CMU-CMU-88-88_07', 78),     # cartwheel (1)
    ('CMU-CMU-88-88_08', 145),    # crouch flip
    ('CMU-CMU-88-88_09', 188),    # cartwheel (2)
    ('CMU-CMU-90-90_19', 260),    # monkey flip
    ('CMU-CMU-103-103_08', 279),  # dance
    ('CMU-CMU-108-108_13', 39),   # run
    ('CMU-CMU-137-137_40', 510),  # walk
)

# marker order = the mocap body declaration order in the reference
# tracking task.xml (== tracking.cc body_names)
CMU_MARKERS = ('pelvis', 'head', 'ltoe', 'rtoe', 'lheel', 'rheel',
               'lknee', 'rknee', 'lhand', 'rhand', 'lelbow', 'relbow',
               'lshoulder', 'rshoulder', 'lhip', 'rhip')

CMU_FPS = 30.0


def cmu_clips_available() -> bool:
  return os.path.isdir(os.path.join(
      REFERENCE_ROOT, 'mjpc', 'tasks', 'humanoid', 'tracking', 'keyframes'))


def load_cmu_clips():
  """Parse the in-checkout CMU keyframe XMLs.

  Returns (mpos (N, 16, 3) float32, starts (10,) int, lengths (10,) int)
  with N = sum of clip lengths, frames concatenated in motion-id order —
  the same flat key_mpos layout the reference indexes with
  MotionStartIndex/MotionLength (tracking.cc:57-66)."""
  import numpy as np
  import xml.etree.ElementTree as ET

  kf_dir = os.path.join(REFERENCE_ROOT, 'mjpc', 'tasks', 'humanoid',
                        'tracking', 'keyframes')
  frames = []
  starts, lengths = [], []
  for stem, expect in CMU_CLIPS:
    path = os.path.join(kf_dir, stem + '_poses.xml')
    root = ET.parse(path).getroot()
    keys = root.findall('.//key')
    starts.append(len(frames))
    for k in keys:
      vals = np.fromstring(k.get('mpos'), sep=' ', dtype=np.float64)
      frames.append(vals.reshape(len(CMU_MARKERS), 3))
    lengths.append(len(keys))
    if expect != len(keys):
      raise ValueError(f'{stem}: {len(keys)} frames, expected {expect}')
  return (np.asarray(frames, dtype=np.float32),
          np.asarray(starts, dtype=np.int32),
          np.asarray(lengths, dtype=np.int32))
