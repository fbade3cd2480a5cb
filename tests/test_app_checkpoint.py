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
