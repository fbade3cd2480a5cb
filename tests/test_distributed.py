"""Real multi-process jax.distributed test (VERDICT r2 missing #5).

Launches 2 OS processes, each with 2 virtual CPU devices, joined through
jax.distributed into one 4-device ('hosts', 'samples') mesh, and asserts
the seed-exact winner matches the single-process single-device planner —
the cross-process analog of test_sharded winner equivalence. Reference
analog: the ThreadPool WaitCount barrier
(/root/reference/mjpc/threadpool.cc:51-80).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

import conftest  # noqa: F401  (path setup)

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks import registry

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'distributed_worker.py')
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
  with socket.socket() as s:
    s.bind(('127.0.0.1', 0))
    return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_winner_equivalence(tmp_path):
  port = _free_port()
  out = tmp_path / 'winner.json'
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)            # worker sets its own device count
  # repo only: inheriting a site dir whose sitecustomize force-registers a
  # TPU PJRT plugin (e.g. the axon tunnel) would override the CPU backend
  env['PYTHONPATH'] = REPO
  env['JAX_PLATFORMS'] = 'cpu'

  procs = [
      subprocess.Popen(
          [sys.executable, WORKER, '--coordinator', f'127.0.0.1:{port}',
           '--num-processes', '2', '--process-id', str(i), '--out', str(out)],
          env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
      for i in range(2)
  ]
  outputs = []
  for p in procs:
    stdout, _ = p.communicate(timeout=600)
    outputs.append(stdout.decode(errors='replace'))
  for p, text in zip(procs, outputs):
    assert p.returncode == 0, f'worker failed:\n{text[-3000:]}'
  with open(out) as f:
    got = json.load(f)
  assert got['process_count'] == 2
  assert got['num_devices'] == 4

  # single-process, single-device run at the same seed
  spec = registry.get_task('ParticleFixed')
  d0 = make_data(spec.model, dtype=jax.numpy.float32)
  policy = sampling.default_policy(spec, 5, dtype=jax.numpy.float32)
  cfg = sampling.default_config(spec, dtype=jax.numpy.float32)
  t_steps = agent_mod.horizon_steps(spec)
  key = jax.random.key(11)
  pol_v, info_v = jax.jit(lambda: sampling.optimize(
      spec, policy, d0, spec.default_params, cfg, key, 32, t_steps,
      int(spline.Interp.ZERO)))()

  np.testing.assert_allclose(np.asarray(got['values'], dtype=np.float32),
                             np.asarray(pol_v.values), atol=1e-6)
  np.testing.assert_allclose(got['best_return'],
                             float(info_v['best_return']), rtol=1e-5)
