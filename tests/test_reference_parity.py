"""Parity vs the reference on its OWN task configs (BASELINE.md requirement).

Loads the actual reference task models (dm_control XML + reference patch +
reference task.xml, staged by tasks/reference.py), then checks:

  1. dynamics parity: our engine reproduces MuJoCo trajectories on the
     reference models under identical control sequences;
  2. planner scoring parity: predictive-sampling candidate returns computed
     by our batched rollout engine match a MuJoCo-oracle scorer on the same
     candidates (same winner selection as sampling/planner.cc:177-181);
  3. planning on the reference configs converges (sampling + iLQG), and the
     optimized plan rolled out on MuJoCo gives the same cost.
"""

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks import reference as ref

pytestmark = pytest.mark.skipif(not ref.available(),
                                reason='reference checkout unavailable')

TASKS = ['cartpole', 'acrobot', 'swimmer', 'walker', 'particle',
         'humanoid_stand', 'humanoid_walk']


def _get(task):
  spec = ref.get_reference_task(task)
  mjm = spec.mj_model
  return spec, mjm


def _home_state(spec, rng, scale=0.01):
  m = spec.model
  d = make_data(m, dtype=jnp.float64)
  if 'home' in m.keyframe_names:
    k = m.keyframe_names.index('home')
    qpos = np.asarray(m.key_qpos[k], dtype=np.float64)
  else:
    qpos = np.asarray(m.qpos0, dtype=np.float64)
  qpos = qpos + scale * rng.standard_normal(m.nq)
  mujoco.mj_normalizeQuat(spec.mj_model, qpos)  # free/ball quats
  qvel = scale * rng.standard_normal(m.nv)
  return d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))


def _sync_oracle(mjm, mjd, d):
  mjd.qpos[:] = np.asarray(d.qpos)
  mjd.qvel[:] = np.asarray(d.qvel)
  mjd.time = float(d.time)
  if mjm.nmocap:
    mjd.mocap_pos[:] = np.asarray(d.mocap_pos)
    mjd.mocap_quat[:] = np.asarray(d.mocap_quat)
  mujoco.mj_forward(mjm, mjd)


@pytest.mark.parametrize('task', TASKS)
def test_dynamics_parity(task):
  """Our engine vs mj_step on the reference task model, same controls."""
  spec, mjm = _get(task)
  m = spec.model
  rng = np.random.default_rng(0)
  d = _home_state(spec, rng)
  mjd = mujoco.MjData(mjm)
  _sync_oracle(mjm, mjd, d)

  nsteps = 100 if task in ('cartpole', 'acrobot') else 50
  if task.startswith('humanoid'):
    nsteps = 30  # 27-dof contact-rich free-fall-to-floor: chaos horizon
  step = jax.jit(fwd.step)
  ctrl_t = 0.3 * np.sin(
      np.linspace(0, 4 * np.pi, nsteps)[:, None]
      * (1.0 + np.arange(mjm.nu)[None, :]))
  for t in range(nsteps):
    mjd.ctrl[:] = ctrl_t[t]
    mujoco.mj_step(mjm, mjd)
    d = step(m, d.replace(ctrl=jnp.asarray(ctrl_t[t])))

  # walker is contact-rich: tiny solver-tolerance differences amplify
  # chaotically over 50 steps (one-step qacc parity is asserted tightly in
  # test_one_step_qacc_parity below), so the trajectory band is looser —
  # and velocities react discontinuously to contact timing, so their band
  # is ~100x the configuration band
  contact_rich = task == 'walker' or task.startswith('humanoid')
  atol = 5e-3 if contact_rich else 1e-6
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=atol,
                             err_msg=f'{task} qpos after {nsteps} steps')
  vel_atol = 0.5 if contact_rich else 10 * atol
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=vel_atol,
                             err_msg=f'{task} qvel after {nsteps} steps')


@pytest.mark.parametrize('task', TASKS)
def test_one_step_qacc_parity(task):
  """Per-step forward-dynamics parity along a MuJoCo-generated trajectory:
  resync to the oracle state each step and compare qacc."""
  spec, mjm = _get(task)
  m = spec.model
  rng = np.random.default_rng(0)
  d0 = _home_state(spec, rng)
  mjd = mujoco.MjData(mjm)
  _sync_oracle(mjm, mjd, d0)
  fwd_jit = jax.jit(fwd.forward)
  worst = 0.0
  for t in range(50):
    u = 0.3 * np.sin(t * 0.2 * (1.0 + np.arange(mjm.nu)))
    mjd.ctrl[:] = u
    oracle = mujoco.MjData(mjm)
    oracle.qpos[:] = mjd.qpos
    oracle.qvel[:] = mjd.qvel
    oracle.ctrl[:] = u
    if mjm.nmocap:
      oracle.mocap_pos[:] = mjd.mocap_pos
      oracle.mocap_quat[:] = mjd.mocap_quat
    mujoco.mj_forward(mjm, oracle)
    d = d0.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                   qvel=jnp.asarray(mjd.qvel.copy()),
                   ctrl=jnp.asarray(u))
    d = fwd_jit(m, d)
    scale = 1.0 + np.abs(oracle.qacc).max()
    worst = max(worst, np.abs(np.asarray(d.qacc) - oracle.qacc).max() / scale)
    mujoco.mj_step(mjm, mjd)
  assert worst < 1e-4, f'{task} worst relative qacc error {worst}'


def _oracle_residual(task, spec, mjm, mjd):
  """Host-side residual mirroring the reference .cc, reading MuJoCo data."""
  def sens(name):
    sid = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_SENSOR, name)
    adr = mjm.sensor_adr[sid]
    return mjd.sensordata[adr:adr + mjm.sensor_dim[sid]]

  rp = np.asarray(spec.default_params.residual_params, dtype=np.float64)
  if task == 'cartpole':
    return np.array([np.cos(mjd.qpos[1]) - 1.0, mjd.qpos[0] - rp[0],
                     mjd.qvel[1], mjd.ctrl[0]])
  if task == 'acrobot':
    goal, tip = mjd.site_xpos[0], mjd.site_xpos[1]
    return np.array([goal[2] - tip[2], goal[0] - tip[0],
                     mjd.qvel[0], mjd.qvel[1], mjd.ctrl[0]])
  if task == 'swimmer':
    return np.concatenate([mjd.ctrl, (sens('nose') - sens('target'))[:2]])
  if task == 'walker':
    height = sens('torso_position')[2]
    torso_up = sens('torso_zaxis')[2]
    com_vel = sens('torso_subtreelinvel')[0]
    return np.concatenate([
        mjd.ctrl, [height - rp[0], torso_up - 1.0, com_vel - rp[1]]])
  if task == 'particle':
    # reference particle.cc:36-56 (Lissajous goal analytic in time)
    goal = np.array([0.25 * np.sin(mjd.time),
                     0.25 * np.cos(mjd.time / np.pi)])
    return np.concatenate([sens('position')[:2] - goal,
                           sens('velocity')[:2], mjd.ctrl])
  if task == 'humanoid_stand':
    # reference humanoid/stand/stand.cc:40-95
    f = [sens(f'sp{i}') for i in range(4)]
    height = sens('head_position')[2] - 0.25 * sum(fi[2] for fi in f)
    com = sens('torso_subtreecom')
    com_vel = sens('torso_subtreelinvel')
    capture = com[:2] + 0.2 * com_vel[:2]
    favg = 0.25 * sum(fi[:2] for fi in f)
    balance = np.linalg.norm(favg - capture)
    return np.concatenate([[height - rp[0], balance], com_vel[:2],
                           mjd.qvel[6:], mjd.ctrl])
  if task == 'humanoid_walk':
    # reference humanoid/walk/walk.cc:44-165
    torso_z = sens('torso_position')[2]
    fr, fl = sens('foot_right'), sens('foot_left')
    r_height = torso_z - rp[0]
    r_pf = 0.5 * (fl[2] + fr[2]) - sens('pelvis_position')[2] - 0.2
    capture = sens('torso_subcom') + 0.3 * sens('torso_subcomvel')
    capture[2] = 1e-3
    axis = fr - fl
    axis[2] = 1e-3
    axis_norm = np.linalg.norm(axis)
    axis_u = axis / max(axis_norm, 1e-12)
    length = 0.5 * axis_norm - 0.05
    center = 0.5 * (fr + fl)
    t = np.clip(np.dot(capture - center, axis_u), -length, length)
    pcp = center + t * axis_u
    standing = torso_z / np.sqrt(torso_z ** 2 + 0.45 ** 2) - 0.4
    r_balance = standing * (capture[:2] - pcp[:2])
    z_ref = np.array([0.0, 0.0, 1.0])
    r_up = np.concatenate([
        [sens('torso_up')[2] - 1.0, 0.3 * (sens('pelvis_up')[2] - 1.0)],
        0.1 * standing * (sens('foot_right_up') - z_ref),
        0.1 * standing * (sens('foot_left_up') - z_ref)])
    r_post = mjd.qpos[7:].copy()
    fw = (sens('torso_forward')[:2] + sens('pelvis_forward')[:2]
          + sens('foot_right_forward')[:2] + sens('foot_left_forward')[:2])
    fw = fw / max(np.linalg.norm(fw), 1e-12)
    com_vel = 0.5 * (sens('waist_lower_subcomvel')[:2]
                     + sens('torso_velocity')[:2])
    r_walk = standing * (np.dot(com_vel, fw) - rp[1])
    r_move = standing * (com_vel - 0.5 * sens('foot_right_velocity')[:2]
                         - 0.5 * sens('foot_left_velocity')[:2])
    return np.concatenate([[r_height, r_pf], r_balance, r_up, r_post,
                           [r_walk], r_move, mjd.ctrl])
  raise ValueError(task)


def _oracle_returns(task, spec, mjm, d0, actions):
  """Score candidate action sequences by stepping MuJoCo (reference
  Trajectory::Rollout semantics: residual at (x_t, u_t) post-forward)."""
  params = spec.default_params
  returns = []
  for acts in actions:
    mjd = mujoco.MjData(mjm)
    _sync_oracle(mjm, mjd, d0)
    res = []
    for t in range(acts.shape[0]):
      mjd.ctrl[:] = acts[t]
      mujoco.mj_forward(mjm, mjd)
      res.append(_oracle_residual(task, spec, mjm, mjd))
      mujoco.mj_step(mjm, mjd)
    costs = spec.cost(jnp.asarray(np.stack(res)), params)
    returns.append(float(jnp.mean(costs)))
  return np.array(returns)


@pytest.mark.parametrize('task', ['cartpole', 'swimmer', 'particle',
                                  'humanoid_stand', 'humanoid_walk'])
def test_planner_scoring_parity(task):
  """Candidate returns from our batched rollout engine match the MuJoCo
  oracle on identical candidates; winner selection agrees."""
  spec, mjm = _get(task)
  m = spec.model
  rng = np.random.default_rng(1)
  d0 = _home_state(spec, rng)

  # plan on the SIM timestep so the oracle and engine step identically
  horizon_steps = 20
  # contact-rich humanoid: solver-tolerance noise amplifies over the
  # horizon; shorter window + looser band (winner agreement still exact)
  rtol = 1e-4
  if task.startswith('humanoid'):
    horizon_steps = 12
    rtol = 2e-3
  num_samples = 8
  num_points = 5
  interp = spline.Interp.ZERO
  cfg = sampling.default_config(spec, dtype=jnp.float64)
  cfg = cfg.replace(timestep=jnp.asarray(float(mjm.opt.timestep),
                                         jnp.float64),
                    horizon_time=jnp.asarray(
                        (horizon_steps - 1) * float(mjm.opt.timestep),
                        jnp.float64))

  policy = sampling.default_policy(spec, num_points, dtype=jnp.float64)
  nominal = sampling.resample_nominal(spec, policy, d0.time, horizon_steps,
                                      cfg, interp)
  candidates = sampling.sample_candidates(spec, nominal, num_samples, cfg,
                                          jax.random.key(0))
  ours = np.asarray(sampling.rollout_candidates(
      spec, d0, nominal.times, candidates, spec.default_params,
      horizon_steps, cfg, interp))

  actions = np.asarray(jax.vmap(
      lambda v: sampling.candidate_actions(nominal.times, v, horizon_steps,
                                           cfg.timestep, interp))(candidates))
  oracle = _oracle_returns(task, spec, mjm, d0, actions)

  np.testing.assert_allclose(ours, oracle, rtol=rtol, atol=1e-8,
                             err_msg=f'{task} candidate returns')
  assert int(np.argmin(ours)) == int(np.argmin(oracle))


def test_mpc_converges_reference_cartpole():
  """Predictive sampling on the actual reference cartpole config catches a
  tilted pole and stabilizes it upright (the reference model's qpos0 is
  pole-up with dt=0.001, so full hanging swing-up needs seconds of sim;
  a 0.5 rad tilt is discriminative — passive dynamics falls to cost ~20,
  MPC recovers to near 0)."""
  spec, mjm = _get('cartpole')
  sim0 = make_data(spec.model, dtype=jnp.float64)
  sim0 = sim0.replace(qpos=sim0.qpos.at[1].set(0.3))
  carry, costs = agent_mod.synchronous_mpc(
      spec, num_samples=64, total_steps=800, steps_per_plan=10,
      key=jax.random.key(0), sim0=sim0, planner_iterations=2)
  c = np.asarray(costs)
  # the pole dips while the cart accelerates under it, then is recovered:
  # final cost below the worst 50-step window, pole near upright at the end
  windows = c[:len(c) // 50 * 50].reshape(-1, 50).mean(axis=1)
  assert windows[-1] < windows.max() * 0.8, f'windows {windows}'
  ang = float(np.cos(np.asarray(carry.sim.qpos)[1]))
  assert ang > 0.7, f'pole angle cos {ang}'  # caught, near upright


def test_ilqg_plan_rolls_out_identically_on_oracle():
  """iLQG nominal plan computed by our stack, rolled out open-loop on both
  engines: same trajectory cost (control-sequence parity evidence)."""
  spec, mjm = _get('cartpole')
  from mujoco_mpc_tpu.planners import registry as planner_registry
  horizon = 40
  planner = planner_registry.make_planner(
      spec, 2, 8, horizon, 5, interp=spline.Interp.ZERO, dtype=jnp.float64)
  policy = planner.init()
  rng = np.random.default_rng(2)
  d0 = _home_state(spec, rng, scale=0.0)
  for i in range(3):
    policy, _ = planner.optimize(policy, d0, spec.default_params,
                                 jax.random.key(i))

  # open-loop action sequence from the optimized policy
  dt = float(spec.config.get('agent_timestep', mjm.opt.timestep))
  # roll out on our engine at the sim timestep with ZOH of plan actions
  m = spec.model
  d = d0
  mjd = mujoco.MjData(mjm)
  _sync_oracle(mjm, mjd, d0)
  step = jax.jit(fwd.step)
  res_ours, res_oracle = [], []
  nsub = max(int(round(dt / float(mjm.opt.timestep))), 1)
  for t in range(horizon):
    u = np.asarray(planner.action(policy, d.qpos, d.qvel, d.act, d.time),
                   dtype=np.float64)
    for _ in range(nsub):
      mjd.ctrl[:] = u
      mujoco.mj_step(mjm, mjd)
      d = step(m, d.replace(ctrl=jnp.asarray(u)))
    res_ours.append(np.asarray(d.qpos).copy())
    res_oracle.append(mjd.qpos.copy())
  np.testing.assert_allclose(np.stack(res_ours), np.stack(res_oracle),
                             atol=1e-5)


def test_fingers_elliptic_qacc_parity():
  """Reference Fingers (self-contained, cone=elliptic condim-6, implicit
  integrator, noslip_iterations=5): per-step qacc parity along an oracle
  trajectory, with the noslip post-pass ACTIVE on both sides
  (physics/noslip.py; reference task.xml sets it in <option/>)."""
  spec, mjm = _get('fingers')
  m = spec.model
  assert m.opt.cone == 1
  assert m.opt.noslip_iterations == 5
  assert mjm.opt.noslip_iterations == 5
  d0 = make_data(m, dtype=jnp.float64)
  k = m.keyframe_names.index('home')
  d0 = d0.replace(qpos=m.key_qpos[k], act=m.key_act[k])
  mjd = mujoco.MjData(mjm)
  _sync_oracle(mjm, mjd, d0)
  mjd.act[:] = np.asarray(d0.act)
  fwd_jit = jax.jit(fwd.forward)
  worst = 0.0
  for t in range(30):
    u = np.asarray(mjd.act).copy() + 0.02 * np.sin(
        t * 0.3 * (1.0 + np.arange(mjm.nu)))
    mjd.ctrl[:] = u
    oracle = mujoco.MjData(mjm)
    oracle.qpos[:] = mjd.qpos
    oracle.qvel[:] = mjd.qvel
    oracle.act[:] = mjd.act
    oracle.ctrl[:] = u
    mujoco.mj_forward(mjm, oracle)
    d = d0.replace(qpos=jnp.asarray(mjd.qpos.copy()),
                   qvel=jnp.asarray(mjd.qvel.copy()),
                   act=jnp.asarray(mjd.act.copy()),
                   ctrl=jnp.asarray(u))
    d = fwd_jit(m, d)
    scale = 1.0 + np.abs(oracle.qacc).max()
    worst = max(worst,
                np.abs(np.asarray(d.qacc) - oracle.qacc).max() / scale)
    mujoco.mj_step(mjm, mjd)
  assert worst < 1e-4, f'fingers worst relative qacc error {worst}'


def test_fingers_sampling_improves():
  """Predictive sampling on the reference Fingers config improves the
  plan (elliptic contacts on the planner hot path)."""
  spec, _ = _get('fingers')
  m = spec.model
  d0 = make_data(m, dtype=jnp.float64)
  k = m.keyframe_names.index('home')
  d0 = d0.replace(qpos=m.key_qpos[k], act=m.key_act[k])
  t_steps = 25
  policy = sampling.default_policy(spec, 5, jnp.float64)
  cfg = sampling.default_config(spec, jnp.float64)
  ret0 = None
  key = jax.random.key(0)
  for i in range(3):
    key, kk = jax.random.split(key)
    policy, info = sampling.optimize(
        spec, policy, d0, spec.default_params, cfg, kk, 16, t_steps,
        int(spline.Interp.ZERO))
    if ret0 is None:
      ret0 = float(info['best_return'])
  assert float(info['best_return']) <= ret0 + 1e-9


def test_cmu_tracking_residual_parity():
  """Humanoid Track on the reference's REAL CMU clips: the marker
  position/velocity residual matches an independent implementation of
  tracking.cc:140-215 (interpolation weights, marker averaging/
  centering, finite-difference marker velocity) evaluated on the same
  clip data."""
  from mujoco_mpc_tpu.physics import support
  from mujoco_mpc_tpu.tasks import registry

  assert ref.cmu_clips_available()
  mpos, starts, lengths = ref.load_cmu_clips()
  # clip lengths must match the reference's hardcoded table
  # (tracking.cc kMotionLengths)
  np.testing.assert_array_equal(
      lengths, [121, 154, 115, 78, 145, 188, 260, 279, 39, 510])

  spec = registry.get_task('Humanoid Track')
  m = spec.model
  idx = {n: i for i, n in enumerate(spec.residual_param_names)}
  widx = {n: i for i, n in enumerate(spec.term_names)}
  clip = 9                                     # walk clip
  t = 0.4121                                   # mid-frame query time

  d = make_data(m).replace(qpos=m.keyframe_qpos('home'),
                           qvel=0.1 * jnp.ones(m.nv),
                           time=jnp.asarray(t, jnp.float32))
  d = fwd.forward(m, d)
  rp = spec.default_params.residual_params
  rp = rp.at[idx['_clip']].set(float(clip))
  r = np.asarray(spec.residual_fn(m, d, rp))

  # --- independent reference-formula implementation (tracking.cc) ---
  start, length = int(starts[clip]), int(lengths[clip])
  kfps = 30.0
  current_index = t * kfps + start
  max_index = start + length - 1
  i0 = int(np.floor(np.clip(current_index, 0, max_index)))
  i1 = min(i0 + 1, max_index)
  w1 = np.clip(current_index, 0, max_index) - i0
  w0 = 1.0 - w1
  target = w0 * mpos[i0] + w1 * mpos[i1]       # (16, 3)

  sites = [spec.model.site(f'marker[{n}]') for n in ref.CMU_MARKERS]
  cur = np.asarray(d.site_xpos)[sites]
  avg_t, avg_c = target.mean(0), cur.mean(0)
  want_avg = avg_t - avg_c
  want_pos = ((target - avg_t) - (cur - avg_c)).reshape(-1)
  cur_v = np.stack([np.asarray(support.site_linvel(m, d, s))
                    for s in sites])
  want_vel = ((mpos[i1] - mpos[i0]) * kfps - cur_v).reshape(-1)

  off = sum(spec.term_dims[:widx['Avg Pos']])
  np.testing.assert_allclose(r[off:off + 3], want_avg, atol=2e-5)
  off = sum(spec.term_dims[:widx['Marker Pos']])
  np.testing.assert_allclose(r[off:off + 48], want_pos, atol=2e-5)
  off = sum(spec.term_dims[:widx['Marker Vel']])
  np.testing.assert_allclose(r[off:off + 48], want_vel, atol=2e-4)


@pytest.mark.slow
def test_cmu_tracking_mpc_bounded_cost():
  """Sampling MPC on a real CMU walk-clip segment keeps the tracking
  cost bounded (the reference's real-time tracking loop on clip data)."""
  from mujoco_mpc_tpu.tasks import registry

  spec = registry.get_task('Humanoid Track')
  m = spec.model
  agent = agent_mod.Agent(spec, num_samples=32, seed=0, planner_id=0,
                          num_spline_points=4)
  costs = []
  for i in range(40):
    agent.transition()
    if i % 3 == 0:
      agent.plan_iteration()
    agent.step()
    costs.append(float(agent.cost_terms().sum()))
  assert np.isfinite(costs).all()
  # tracking holds: cost stays within 4x of its starting level
  assert np.mean(costs[-10:]) < 4.0 * max(np.mean(costs[:5]), 0.5), costs
