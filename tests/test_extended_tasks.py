"""Hand / bimanual / OP3 / humanoid-track / interact task specs
(reference: mjpc/tasks/{shadow_reorient,allegro,rubik,bimanual,op3,
humanoid/tracking,humanoid/interact})."""

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

EXTENDED_TASKS = [
    'Shadow Reorient', 'Allegro Cube', 'Cube Solving',
    'Bimanual Handover', 'Bimanual Insert', 'Bimanual Reorient',
    'OP3 Stand', 'Humanoid Track', 'Humanoid Interact',
]


@pytest.mark.parametrize('name', EXTENDED_TASKS)
def test_task_loads_and_residual_dims(name):
  spec = registry.get_task(name)
  d = make_data(spec.model)
  if 'home' in spec.model.keyframe_names:
    d = d.replace(qpos=spec.model.keyframe_qpos('home'))
  d = fwd.forward(spec.model, d)
  r = spec.residual_fn(spec.model, d, spec.default_params.residual_params)
  assert r.shape == (spec.num_residual,)
  assert np.all(np.isfinite(np.array(r)))
  c = float(spec.cost(r, spec.default_params))
  assert np.isfinite(c)


def test_registry_covers_reference_task_families():
  """Every reference task family (tasks/tasks.cc:46-73) has a counterpart."""
  names = set(registry.task_names())
  expected = {
      'Acrobot', 'Allegro Cube', 'Bimanual Handover', 'Bimanual Insert',
      'Bimanual Reorient', 'Cartpole', 'FreeFingers', 'Humanoid Interact',
      'Humanoid Stand', 'Humanoid Track', 'Humanoid Walk', 'OP3 Stand',
      'Panda', 'Panda Bring', 'Particle', 'ParticleFixed', 'Quadrotor',
      'Quadruped Flat', 'Quadruped Hill', 'Cube Solving', 'Shadow Reorient',
      'Swimmer', 'Walker',
  }
  missing = expected - names
  assert not missing, missing


def test_shadow_reorient_drop_recovery():
  spec = registry.get_task('Shadow Reorient')
  d = make_data(spec.model)
  qpos = np.array(d.qpos)
  qpos[2] = -0.2  # cube fell below the palm
  d = fwd.forward(spec.model, d.replace(
      qpos=jnp.asarray(qpos, dtype=d.qpos.dtype)))
  d2, _ = spec.transition_fn(spec.model, d, spec.default_params,
                             jax.random.key(1))
  assert float(d2.qpos[2]) > 0.0  # teleported back above the palm


def test_rubik_face_mechanism_and_state_machine():
  """Face-goal state machine (reference solve.cc): goals come from the
  cache, and two consecutive scheduled face-goals advance the unscramble
  state machine. Mechanism-level coupling is tested in
  tests/test_rubik_cube.py."""
  import jax
  import jax.numpy as jnp
  import numpy as np
  from mujoco_mpc_tpu.models import rubik as rubik_mod
  from mujoco_mpc_tpu.physics import forward as fwd
  from mujoco_mpc_tpu.physics.model import make_data
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task('Cube Solving')
  names = spec.residual_param_names
  idx = {n: names.index(n) for n in names}
  scrambled_qpos, cache, _moves = rubik_mod.scramble(5, seed=11)
  m = spec.model
  # interlocked cube: free 7 + 6 face hinges + 20 ring quats + 15 hand
  assert m.nq == 7 + 6 + 80 + 15

  d = make_data(m).replace(qpos=m.keyframe_qpos('home'))
  d = fwd.forward(m, d)
  r = spec.residual_fn(m, d, spec.default_params.residual_params)
  assert r.shape == (spec.num_residual,)

  # scrambled home state: face angles match the schedule's end state
  np.testing.assert_allclose(np.asarray(d.qpos[7:13]), cache[-1],
                             atol=1e-5)

  params = spec.default_params
  gi0 = int(round(float(params.residual_params[idx['_goal_index']])))
  assert gi0 == 4
  # achieve goal 4 (set faces to cache[4]): index decrements to 3 and the
  # published goal becomes cache[3]
  qp = np.array(d.qpos)
  qp[7:13] = cache[4]
  d4 = fwd.forward(m, d.replace(qpos=jnp.asarray(qp, d.qpos.dtype)))
  d4, params = spec.transition_fn(m, d4, params, jax.random.key(0))
  assert int(round(float(params.residual_params[idx['_goal_index']]))) == 3
  np.testing.assert_allclose(np.asarray(params.residual_params[0:6]),
                             cache[3], atol=1e-5)
  # achieve goal 3: decrements again (two consecutive face-goals)
  qp[7:13] = cache[3]
  d3 = fwd.forward(m, d4.replace(qpos=jnp.asarray(qp, d.qpos.dtype)))
  d3, params = spec.transition_fn(m, d3, params, jax.random.key(1))
  assert int(round(float(params.residual_params[idx['_goal_index']]))) == 2
  # walk the rest of the schedule down to solved -> Wait mode
  for k in jax.random.split(jax.random.key(2), 3):
    gi = int(round(float(params.residual_params[idx['_goal_index']])))
    qp[7:13] = cache[gi]
    dk = fwd.forward(m, d3.replace(qpos=jnp.asarray(qp, d.qpos.dtype)))
    _, params = spec.transition_fn(m, dk, params, k)
  assert int(round(float(params.residual_params[idx['_mode']]))) == 0


def test_interact_contact_keyframe_residual():
  """Contact-pair slots in the keyframe drive the Contact residual
  (reference ContactResidual, interact.cc:115-144): inactive pairs give
  zeros; an active pelvis<->chair pair measures the world-frame gap."""
  spec = registry.get_task('Humanoid Interact')
  m = spec.model
  idx = {n: i for i, n in enumerate(spec.residual_param_names)}
  widx = {n: i for i, n in enumerate(spec.term_names)}
  d = fwd.forward(m, make_data(m))
  params = spec.default_params
  r0 = spec.residual_fn(m, d, params.residual_params)
  off = sum(spec.term_dims[:widx['Contact']])
  contact0 = np.array(r0[off:off + 15])
  assert np.allclose(contact0, 0.0)  # no pair selected by default

  # activate pair 0: pelvis body <-> chair body at the seat point
  import mujoco
  mjm = spec.mj_model
  pelvis = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY, 'pelvis')
  chair = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY, 'chair')
  rp = params.residual_params
  rp = rp.at[idx['kf0_body1']].set(float(pelvis))
  rp = rp.at[idx['kf0_body2']].set(float(chair))
  rp = rp.at[idx['kf0_l2z']].set(0.48)
  r1 = spec.residual_fn(m, d, rp)
  contact1 = np.array(r1[off:off + 15])
  assert contact1[:3].max() > 0.1  # pelvis is not on the seat initially
  assert np.allclose(contact1[3:], 0.0)  # other pairs still inactive
  # residual equals |p_pelvis - p_seat| componentwise
  import mujoco as mj
  want = np.abs(np.array(d.xpos[pelvis])
                - (np.array(d.xpos[chair]) + np.array([0, 0, 0.48])))
  np.testing.assert_allclose(contact1[:3], want, atol=1e-5)


def test_interact_mode_presets():
  """Mode switch applies the per-mode weight preset via the transition
  (reference default_weights + TransitionLocked, interact.h:42-48)."""
  spec = registry.get_task('Humanoid Interact')
  m = spec.model
  idx = {n: i for i, n in enumerate(spec.residual_param_names)}
  widx = {n: i for i, n in enumerate(spec.term_names)}
  d = fwd.forward(m, make_data(m))
  params = spec.default_params
  # switch to Standing (mode 1): head-height weight becomes 80
  rp = params.residual_params.at[idx['select_mode']].set(1.0)
  params = params.replace(residual_params=rp)
  _, params = spec.transition_fn(m, d, params, jax.random.key(0))
  w = np.array(params.weights)
  assert w[widx['Head Height']] == 80.0
  assert w[widx['COM Feet XY']] == 100.0
  assert w[widx['Contact']] == 0.0
  # switch to StayingStill (mode 3): COM-vel weight 50, contact back to 80
  rp = params.residual_params.at[idx['select_mode']].set(3.0)
  params = params.replace(residual_params=rp)
  _, params = spec.transition_fn(m, d, params, jax.random.key(0))
  w = np.array(params.weights)
  assert w[widx['COM Vel']] == 50.0
  assert w[widx['Contact']] == 80.0
