"""App loops (plan/physics threads) + checkpoint/resume + profiler."""

import os

import numpy as np
import pytest

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.tasks import registry
from mujoco_mpc_tpu.utils import checkpoint, profiler


def test_app_headless_run():
  from mujoco_mpc_tpu import app as app_mod
  app = app_mod.App('ParticleFixed', num_samples=8,
                    percent_realtime=1e6)  # uncapped: run as fast as possible
  metrics = app.run(duration=0.2, render=False)
  assert metrics['steps'] > 0
  assert metrics['plan_iterations'] > 0
  assert 'plan_iteration' in metrics['timers']


def test_checkpoint_roundtrip(tmp_path):
  spec = registry.get_task('Cartpole')
  a = agent_mod.Agent(spec, num_samples=8, use_native_act=False)
  a.plan_iteration()
  for _ in range(3):
    a.step()
  path = os.path.join(tmp_path, 'agent.npz')
  checkpoint.save_agent(path, a)

  b = agent_mod.Agent(spec, num_samples=8, use_native_act=False)
  checkpoint.load_agent(path, b)
  np.testing.assert_allclose(np.array(b.sim_data.qpos),
                             np.array(a.sim_data.qpos))
  np.testing.assert_allclose(np.array(b.policy.values),
                             np.array(a.policy.values))
  assert b._host_time == a._host_time
  # resumed agent continues identically
  ua = np.array(a.action())
  ub = np.array(b.action())
  np.testing.assert_allclose(ua, ub)


def test_phase_timers():
  t = profiler.PhaseTimers()
  with t.phase('x'):
    pass
  with t.phase('x'):
    pass
  snap = t.snapshot()
  assert snap['x']['count'] == 2
  assert snap['x']['total_s'] >= 0


def test_app_ui_agent_service():
  """Serving the agent API from inside the running app (reference:
  ui_agent_server: async planning, actions from the live policy)."""
  import threading
  from mujoco_mpc_tpu import app as app_mod
  from mujoco_mpc_tpu import clients

  app = app_mod.App('ParticleFixed', num_samples=8, percent_realtime=1e6)
  results = {}

  def run():
    results['metrics'] = app.run(duration=1.0, serve_port=0)

  t = threading.Thread(target=run, daemon=True)
  t.start()
  # wait for the server to come up
  import time
  deadline = time.time() + 60
  while not hasattr(app, 'serve_port') and time.time() < deadline:
    time.sleep(0.05)
  assert hasattr(app, 'serve_port')

  c = clients.Agent('ParticleFixed', address=f'localhost:{app.serve_port}')
  u = c.get_action()
  assert u.shape == (app.spec.model.nu,)
  st = c.get_state()
  assert len(st.qpos) == app.spec.model.nq
  # PlannerStep waits for the app's own plan thread
  c.planner_step()
  c.close()
  t.join(timeout=120)
  assert results['metrics']['plan_iterations'] > 0


def test_app_estimator_in_the_loop():
  """EKF-in-the-loop app (reference EstimatorLoop): the filter tracks the
  true state from noisy sensors while the plan/act loops run."""
  import numpy as np
  from mujoco_mpc_tpu import app as app_mod
  app = app_mod.App('Cartpole', num_samples=8, percent_realtime=1e6,
                    estimator='ekf', sensor_noise_std=1e-3)
  metrics = app.run(duration=0.3)
  assert metrics['steps'] > 0
  assert 'estimator_update' in metrics['timers']
  qpos_est, qvel_est = app.estimate()
  qpos_true = np.asarray(app.agent.sim_data.qpos)
  assert np.all(np.isfinite(qpos_est))
  np.testing.assert_allclose(qpos_est, qpos_true, atol=0.2)
