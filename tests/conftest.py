"""Test configuration: CPU backend with a virtual 8-device mesh.

Golden physics tests compare against the mujoco C oracle in float64, so x64
is enabled; production-path tests pass float32 dtypes explicitly.
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_ENABLE_X64'] = '1'
# subprocess servers (clients._spawn_server) pin their backend via the
# --platform flag from this var: a down TPU tunnel must not hang tests
os.environ['MTPU_PLATFORM'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
  """Free compiled executables between modules: a single pytest process
  compiles hundreds of XLA programs, which has crashed the CPU compiler
  late in full-suite runs (segfault in backend_compile); per-module cache
  release keeps the live program count bounded."""
  yield
  jax.clear_caches()
