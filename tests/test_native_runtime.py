"""Native C++ runtime: spline policy sampling vs the JAX implementation,
thread pool barrier semantics (reference: mjpc/spline/spline_test.cc and
mjpc/test/agent/threadpool semantics)."""

import numpy as np
import pytest

from mujoco_mpc_tpu import native
from mujoco_mpc_tpu.ops import spline

pytestmark = pytest.mark.skipif(native.load_library() is None,
                                reason='no C++ toolchain')


@pytest.mark.parametrize('interp', [0, 1, 2])
def test_native_policy_matches_jax_spline(interp):
  import jax.numpy as jnp
  rng = np.random.RandomState(0)
  P, nu = 7, 3
  times = np.sort(rng.uniform(0, 2, P))
  values = rng.randn(P, nu)

  pol = native.NativePolicy(nu, P, interp)
  pol.set_plan(times, values)

  ts = np.concatenate([[times[0] - 0.3, times[-1] + 0.3],
                       rng.uniform(times[0], times[-1], 64)])
  got = pol.actions(ts)
  want = np.array(spline.sample_many(jnp.asarray(times), jnp.asarray(values),
                                     jnp.asarray(ts), interp))
  np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_native_policy_clamp():
  pol = native.NativePolicy(2, 3, 0)
  pol.set_plan(np.array([0.0, 1.0, 2.0]),
               np.array([[5.0, -5.0], [5.0, -5.0], [5.0, -5.0]]))
  pol.set_clamp(np.array([-1.0, -1.0]), np.array([1.0, 1.0]))
  np.testing.assert_allclose(pol.action(0.5), [1.0, -1.0])


def test_threadpool_counter_barrier():
  pool = native.NativeThreadPool(4)
  assert pool.size == 4
  results = []
  n = 16
  import threading
  lock = threading.Lock()
  for i in range(n):
    def work(i=i):
      with lock:
        results.append(i)
    pool.schedule(work)
  pool.wait_count(n)
  assert pool.get_count() == n
  assert sorted(results) == list(range(n))
  pool.reset_count()
  assert pool.get_count() == 0
