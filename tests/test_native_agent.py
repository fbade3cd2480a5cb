"""Embeddable C agent runner (native/mjpc_tpu_agent.{h,cc}).

Reference parity: mjpc/interface.h:29-49 + interface.cc — run the whole
agent (create / plan / action / set_weights / destroy) from C. The
in-process tests drive the extern-C surface through ctypes (the library
attaches to the running interpreter); the slow test builds and runs a
standalone C embedder that boots its own interpreter.
"""

import os
import shutil
import subprocess
import sys
import time

import numpy as np
import pytest

from mujoco_mpc_tpu import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _lib_or_skip():
  lib = native.load_agent_library()
  if lib is None:
    pytest.skip('no native toolchain')
  return lib


def test_create_plan_action_weights_destroy():
  _lib_or_skip()
  with native.NativeAgent('ParticleFixed', num_samples=4) as a:
    assert a.nu > 0 and a.nq > 0 and a.nv > 0 and a.num_weights > 0
    a.set_state(qpos=np.zeros(a.nq), qvel=np.zeros(a.nv), time=0.0)
    a.plan()
    u = a.action()
    assert u.shape == (a.nu,)
    assert np.all(np.isfinite(u))
    a.set_weights(np.full(a.num_weights, 0.5))
    a.step()
    assert np.all(np.isfinite(a.action()))


def test_error_surface_without_agent():
  lib = _lib_or_skip()
  # after destroy (or before create) calls fail loudly instead of crashing
  lib.mtpu_agent_destroy()
  out = np.zeros(4)
  rc = lib.mtpu_agent_action(0.0, native._as_double_ptr(out), 4)
  assert rc == -1
  assert b'agent' in lib.mtpu_last_error()


def test_background_plan_loop():
  _lib_or_skip()
  with native.NativeAgent('ParticleFixed', num_samples=4) as a:
    a.plan()  # compile before timing the loop
    a.start_plan_loop()
    deadline = time.time() + 120
    while a.plan_count < 2 and time.time() < deadline:
      time.sleep(0.05)
    a.stop_plan_loop()
    assert a.plan_count >= 2
    assert np.all(np.isfinite(a.action()))


@pytest.mark.slow
def test_standalone_c_embedder(tmp_path):
  """Build examples/embed_agent.c and run it in its own process: proves
  the Py_Initialize path (no host interpreter)."""
  _lib_or_skip()
  if shutil.which('gcc') is None or shutil.which('python3-config') is None:
    pytest.skip('no C toolchain')
  lib_path = native._build_agent_library()
  exe = str(tmp_path / 'embed_agent')
  inc = subprocess.run(['python3-config', '--includes'],
                       capture_output=True, text=True).stdout.split()
  ld = subprocess.run(['python3-config', '--embed', '--ldflags'],
                      capture_output=True, text=True).stdout.split()
  # --no-as-needed: the driver calls no libpython symbol itself (the
  # dlopen'd agent library does), so as-needed linking would drop the
  # DT_NEEDED entry and leave Py* symbols unresolvable
  subprocess.run(
      ['gcc', os.path.join(REPO, 'examples', 'embed_agent.c')]
      + inc + ['-ldl', '-Wl,--no-as-needed'] + ld + ['-o', exe],
      check=True)
  env = dict(os.environ)
  env['MTPU_AGENT_LIB'] = lib_path
  # MTPU_PLATFORM (not JAX_PLATFORMS): the agent library applies it via
  # jax.config inside the embedded interpreter, which is honored even
  # where the env var is not (and a dead TPU tunnel hangs backend init)
  env['MTPU_PLATFORM'] = 'cpu'
  # the embedded interpreter (bare libpython) must see this venv's
  # packages and the repo — hand it the host's full sys.path
  env['PYTHONPATH'] = os.pathsep.join(
      [p for p in sys.path if p] + [REPO])
  proc = subprocess.run([exe, 'ParticleFixed'], capture_output=True,
                        text=True, timeout=1200, env=env)
  assert proc.returncode == 0, proc.stderr[-2000:]
  assert 'ok' in proc.stdout
