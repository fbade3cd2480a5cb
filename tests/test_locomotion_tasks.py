"""Quadruped / Humanoid task specs: residual dims, cost, gait machinery.

Mirrors the reference's task loading test (test/tasks/task_test.cc: every
registered task loads and residual dimension matches the sensor spec).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.tasks import registry

# end-to-end planning tests: minutes on one CPU; the <5-min core suite is
# the unit/parity set (pytest -m "not slow")
pytestmark = pytest.mark.slow

LOCO_TASKS = ['Quadruped Flat', 'Quadruped Hill', 'Humanoid Stand',
              'Humanoid Walk']


@pytest.mark.parametrize('name', LOCO_TASKS)
def test_task_loads_and_residual_dims(name):
  spec = registry.get_task(name)
  d = make_data(spec.model)
  if 'home' in spec.model.keyframe_names:
    d = d.replace(qpos=spec.model.keyframe_qpos('home'))
  d = fwd.forward(spec.model, d)
  r = spec.residual_fn(spec.model, d, spec.default_params.residual_params)
  assert r.shape == (spec.num_residual,)
  c = spec.cost(r, spec.default_params)
  assert np.isfinite(float(c))
  terms = spec.cost_terms(r, spec.default_params)
  assert terms.shape == (spec.num_term,)
  assert np.all(np.isfinite(np.array(terms)))


def test_quadruped_gait_phases():
  """Swing-height targets follow the selected gait's phase signature."""
  spec = registry.get_task('Quadruped Flat')
  rp = np.array(spec.default_params.residual_params)
  d = make_data(spec.model).replace(
      qpos=spec.model.keyframe_qpos('home'))
  d = fwd.forward(spec.model, d)

  names = spec.residual_param_names
  gait_idx = names.index('select_Gait')

  # stand (gait 0): all four gait residuals equal foot clearance (~0)
  rp0 = rp.copy()
  rp0[gait_idx] = 0.0
  r = spec.residual_fn(spec.model, d, jnp.asarray(rp0, dtype=jnp.float32))
  gait_terms = np.array(r[7:11])
  np.testing.assert_allclose(gait_terms, gait_terms[0] * np.ones(4),
                             atol=1e-5)

  # trot (gait 2) at a swing-phase time: diagonal pairs match
  rp2 = rp.copy()
  rp2[gait_idx] = 2.0
  d_mid = d.replace(time=jnp.asarray(0.4, dtype=d.qpos.dtype))
  d_mid = fwd.forward(spec.model, d_mid)
  r2 = np.array(spec.residual_fn(spec.model, d_mid,
                                 jnp.asarray(rp2, dtype=jnp.float32))[7:11])
  # feet order [FL, FR, HL, HR]; trot pairs (FL,HR) and (FR,HL)
  np.testing.assert_allclose(r2[0], r2[3], atol=1e-5)
  np.testing.assert_allclose(r2[1], r2[2], atol=1e-5)


def test_quadruped_stands_under_home_ctrl():
  """With home-keyframe servo targets the quadruped stays upright."""
  spec = registry.get_task('Quadruped Flat')
  m = spec.model
  k = m.keyframe_names.index('home')
  d = make_data(m).replace(qpos=m.key_qpos[k], ctrl=m.key_ctrl[k])

  @jax.jit
  def run(d):
    def body(d, _):
      return fwd.step(m, d), None
    d, _ = jax.lax.scan(body, d, None, length=100)
    return d

  d = run(d)
  z = float(d.qpos[2])
  assert 0.2 < z < 0.5, z
  # trunk roughly upright
  assert float(d.qpos[3]) > 0.9


def test_humanoid_transition_free():
  spec = registry.get_task('Humanoid Stand')
  assert spec.transition_fn is None
  # walk variant defaults to a nonzero speed goal
  walk = registry.get_task('Humanoid Walk')
  sidx = walk.residual_param_names.index('Speed Goal')
  assert float(walk.default_params.residual_params[sidx]) > 0


def test_quadruped_modes_and_flip_trajectory():
  """Mode machinery (reference quadruped.h:40-47): biped/flip residuals
  change, flip tracks FlipHeight/FlipQuat, auto-gait switches with speed."""
  import jax
  spec = registry.get_task('Quadruped Flat')
  names = spec.residual_param_names
  idx = {n: names.index(n) for n in names}
  rp = np.array(spec.default_params.residual_params)
  d = make_data(spec.model).replace(qpos=spec.model.keyframe_qpos('home'))
  d = fwd.forward(spec.model, d)

  # Quadruped vs Biped: upright residual differs
  r_quad = np.array(spec.residual_fn(spec.model, d,
                                     jnp.asarray(rp, jnp.float32)))
  rp_b = rp.copy()
  rp_b[idx['select_Mode']] = 1.0
  r_biped = np.array(spec.residual_fn(spec.model, d,
                                      jnp.asarray(rp_b, jnp.float32)))
  assert abs(r_quad[0] - r_biped[0]) > 0.5  # standing is NOT biped-upright

  # Flip: at mode_time 0 from home orientation, upright residual ~0 and
  # height target ~ stand height; mid-flight the height target is higher
  rp_f = rp.copy()
  rp_f[idx['select_Mode']] = 4.0
  rp_f[idx['_mode_start']] = 0.0
  r_flip0 = np.array(spec.residual_fn(spec.model, d,
                                      jnp.asarray(rp_f, jnp.float32)))
  assert abs(r_flip0[3]) < 0.1   # height ~ stand target at t=0
  # mid-flight (t ~ jump_time + flight_time/2 ~ 0.74 s): the height
  # target approaches the flip apex (~0.8 m)
  d_mid = d.replace(time=jnp.asarray(0.74, dtype=d.qpos.dtype))
  d_mid = fwd.forward(spec.model, d_mid)
  r_mid = np.array(spec.residual_fn(spec.model, d_mid,
                                    jnp.asarray(rp_f, jnp.float32)))
  # height target well above stand -> big negative residual while standing
  assert r_mid[3] < -0.25
  # orientation target rotated away from identity
  assert np.linalg.norm(r_mid[0:3]) > 0.3

  # auto-gait: fast filtered com speed switches the gait up
  rp_a = rp.copy()
  rp_a[idx['select_Gait switch']] = 1.0
  rp_a[idx['select_Gait']] = 0.0
  rp_a[idx['_cur_gait']] = 0.0
  rp_a[idx['_comvel_x']] = 1.0   # pre-filtered ~1 m/s -> canter band
  rp_a[idx['_gait_switch_t']] = -10.0
  rp_a[idx['_last_t']] = 2.0     # dt=0: keep the preset filter value
  params = spec.default_params.replace(
      residual_params=jnp.asarray(rp_a, jnp.float32))
  d_t = d.replace(time=jnp.asarray(2.0, dtype=d.qpos.dtype))
  _, new_params = spec.transition_fn(spec.model, d_t, params,
                                     jax.random.key(0))
  new_gait = float(new_params.residual_params[idx['select_Gait']])
  assert round(new_gait) == 3  # canter band (0.6 < v <= 2)
  # gait preset applied: cadence updated to canter's 4 Hz
  assert abs(float(new_params.residual_params[0]) - 4.0) < 1e-5


def test_quadruped_hill_ground_raycast():
  """Terrain raycast: Hill runs on a fractal-noise heightfield (the
  reference task_hill.xml terrain); ground height is flat at the home
  stance and elevated out on the hills."""
  from mujoco_mpc_tpu.physics import support
  spec = registry.get_task('Quadruped Hill')
  m = spec.model
  assert m.geom_hfield, 'Hill should carry a heightfield'
  d = make_data(m).replace(qpos=spec.model.keyframe_qpos('home'))
  d = fwd.forward(m, d)
  # flattened at the home stance
  h0 = float(support.ground_height(m, d, jnp.asarray([0.0, 0.0, 0.5])))
  assert abs(h0) < 1e-6
  # rough away from the center: some probe point is clearly elevated
  hs = [float(support.ground_height(
      m, d, jnp.asarray([x, y, 0.5])))
        for x in (-2.5, -1.5, 1.5, 2.5) for y in (-2.0, 0.0, 2.0)]
  assert max(hs) > 0.05, hs
  # and the robot stays stable standing on the terrain
  step = jax.jit(fwd.step)
  for _ in range(100):
    d = step(m, d)
  assert 0.2 < float(d.qpos[2]) < 0.6


def test_humanoid_track_markers_over_full_clip():
  """Marker tracking machinery (reference tracking.cc): when the sim pose
  follows the clip exactly, position residuals stay ~0 across the FULL
  12 s clip; a constant offset appears only in the Avg Pos term (the
  per-marker term is centered)."""
  from mujoco_mpc_tpu.tasks.registry import (_track_clip_qpos, _TRACK_FPS,
                                             _TRACK_MARKERS)
  spec = registry.get_task('Humanoid Track')
  m = spec.model
  rp = spec.default_params.residual_params
  clip = _track_clip_qpos()
  nmark = len(_TRACK_MARKERS)

  for i in [0, 90, 180, 270, 359]:     # spread over all 12 s
    t = i / _TRACK_FPS
    d = make_data(m).replace(qpos=jnp.asarray(clip[i], m.qpos0.dtype),
                             time=jnp.asarray(t, m.qpos0.dtype))
    d = fwd.forward(m, d)
    r = np.array(spec.residual_fn(m, d, rp))
    avg = r[34:37]
    marker_pos = r[37:37 + 3 * nmark]
    assert np.abs(avg).max() < 0.02, (i, np.abs(avg).max())
    assert np.abs(marker_pos).max() < 0.02, (i, np.abs(marker_pos).max())

  # offset pose: per-marker residual stays small (centered), avg catches it
  d = make_data(m).replace(
      qpos=jnp.asarray(clip[90], m.qpos0.dtype).at[0].add(0.5),
      time=jnp.asarray(3.0, m.qpos0.dtype))
  d = fwd.forward(m, d)
  r = np.array(spec.residual_fn(m, d, rp))
  assert np.abs(r[34:37]).max() > 0.4
  assert np.abs(r[37:37 + 3 * nmark]).max() < 0.05

  # reference-time transition: rewinding the sim clock restarts the clip
  import jax
  params = spec.default_params
  names = spec.residual_param_names
  d_fwd = d.replace(time=jnp.asarray(5.0, m.qpos0.dtype))
  _, params = spec.transition_fn(m, d_fwd, params, jax.random.key(0))
  d_back = d.replace(time=jnp.asarray(0.5, m.qpos0.dtype))
  _, params = spec.transition_fn(m, d_back, params, jax.random.key(0))
  assert abs(float(params.residual_params[names.index('_ref_time')])
             - 0.5) < 1e-6
