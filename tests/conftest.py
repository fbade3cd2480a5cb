"""Test configuration: CPU backend with a virtual 8-device mesh.

Golden physics tests compare against the mujoco C oracle in float64, so x64
is enabled; production-path tests pass float32 dtypes explicitly.
"""

import os
import sys

# MTPU_TEST_TPU=1 opts a run onto the real chip (e.g. the heavy in-hand
# manipulation tests, hours on one CPU core but minutes on the TPU);
# x64 stays off there — the TPU path is the f32 production path.
_ON_TPU = os.environ.get('MTPU_TEST_TPU') == '1'
if not _ON_TPU:
  os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
if not _ON_TPU:
  os.environ['JAX_ENABLE_X64'] = '1'
# subprocess servers (clients._spawn_server) pin their backend via the
# --platform flag from this var: a down TPU tunnel must not hang tests
os.environ['MTPU_PLATFORM'] = 'cpu' if not _ON_TPU else 'tpu'
if _ON_TPU:
  # compile-cache the heavy contact programs across on-chip test runs
  # (jax's platform allowlist rejects axon; utils/cache.py force-enables)
  sys.path.insert(0, os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  from mujoco_mpc_tpu.utils import cache as _mcache
  _mcache.enable()

import jax  # noqa: E402

if not _ON_TPU:
  jax.config.update('jax_platforms', 'cpu')
  jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# `gate` tier: the 1-core-verifiable CI subset (pytest -m gate).
# Whole files or single node ids; must stay <= ~10 min on ONE CPU core
# (measured round 5: ~4 min, see pytest.ini). Includes at least one
# contact-physics oracle test (vs the MuJoCo C engine) and one
# planner-improvement test alongside the numeric-parity files.
# ---------------------------------------------------------------------------
GATE_FILES = {
    'test_norms.py', 'test_spline.py', 'test_banded.py', 'test_ilqg.py',
}
GATE_NODES = {
    # contact oracle: narrowphase+solver qacc/trajectory vs mujoco C
    'test_contacts.py::test_contact_qacc',
    'test_contacts.py::test_contact_trajectory',
    # planner improvement: predictive sampling lowers the return
    'test_planner.py::test_optimize_improves_return',
    'test_planner.py::test_nominal_is_candidate_zero',
}


def pytest_collection_modifyitems(items):
  for item in items:
    fname = os.path.basename(str(item.fspath))
    base_id = f'{fname}::{item.originalname or item.name}'
    if (fname in GATE_FILES or base_id in GATE_NODES) \
       and 'slow' not in item.keywords:
      item.add_marker(pytest.mark.gate)


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
  """Free compiled executables between modules: a single pytest process
  compiles hundreds of XLA programs, which has crashed the CPU compiler
  late in full-suite runs (segfault in backend_compile); per-module cache
  release keeps the live program count bounded."""
  yield
  jax.clear_caches()
