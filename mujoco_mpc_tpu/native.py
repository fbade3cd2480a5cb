"""ctypes bindings for the native C++ runtime (native/mjpc_tpu_runtime.cc).

The planning compute path is JAX/XLA; this module binds the C++ host
runtime: the low-latency spline policy container used on the act path
(reference: ActionFromPolicy under shared_mutex, mjpc/app.cc:84-102 +
mjpc/planners/sampling/planner.cc:525-534) and the worker thread pool
(reference: mjpc/threadpool.{h,cc}).

The shared library is always compiled from the reviewed source into a
content-hash-keyed cache directory (no prebuilt binaries are shipped or
trusted); if no toolchain is available the callers fall back to the JAX
implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), 'native', 'mjpc_tpu_runtime.cc')

_lib = None
_lib_lock = threading.Lock()


def _build_library() -> str:
  """Compile the runtime into a source-hash-keyed cache path.

  The cache key is the source content hash, so a stale or foreign .so can
  never be picked up and edits always trigger a rebuild."""
  with open(_SRC, 'rb') as f:
    digest = hashlib.sha256(f.read()).hexdigest()[:16]
  cache_dir = os.path.join(
      os.environ.get('XDG_CACHE_HOME',
                     os.path.join(os.path.expanduser('~'), '.cache')),
      'mjpc_tpu')
  os.makedirs(cache_dir, exist_ok=True)
  lib_path = os.path.join(cache_dir, f'libmjpc_tpu_runtime-{digest}.so')
  if os.path.exists(lib_path):
    return lib_path
  tmp_path = lib_path + f'.tmp{os.getpid()}'
  cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
         _SRC, '-o', tmp_path]
  subprocess.run(cmd, check=True, capture_output=True)
  os.replace(tmp_path, lib_path)
  return lib_path


def load_library():
  """Load (building if needed) the native runtime; None if unavailable."""
  global _lib
  with _lib_lock:
    if _lib is not None:
      return _lib
    try:
      path = _build_library()
      lib = ctypes.CDLL(path)
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
      return None
    c_double_p = ctypes.POINTER(ctypes.c_double)
    lib.mtpu_create_policy.restype = ctypes.c_void_p
    lib.mtpu_create_policy.argtypes = [ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int]
    lib.mtpu_destroy_policy.argtypes = [ctypes.c_void_p]
    lib.mtpu_set_plan.argtypes = [ctypes.c_void_p, c_double_p, c_double_p]
    lib.mtpu_set_interp.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.mtpu_set_clamp.argtypes = [ctypes.c_void_p, c_double_p, c_double_p]
    lib.mtpu_action.argtypes = [ctypes.c_void_p, ctypes.c_double, c_double_p]
    lib.mtpu_actions.argtypes = [ctypes.c_void_p, c_double_p, ctypes.c_int,
                                 c_double_p]
    lib.mtpu_threadpool_create.restype = ctypes.c_void_p
    lib.mtpu_threadpool_create.argtypes = [ctypes.c_int]
    lib.mtpu_threadpool_destroy.argtypes = [ctypes.c_void_p]
    lib.mtpu_threadpool_size.argtypes = [ctypes.c_void_p]
    lib.mtpu_threadpool_size.restype = ctypes.c_int
    lib.mtpu_schedule.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_void_p]
    lib.mtpu_wait_count.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.mtpu_reset_count.argtypes = [ctypes.c_void_p]
    lib.mtpu_get_count.argtypes = [ctypes.c_void_p]
    lib.mtpu_get_count.restype = ctypes.c_int
    _lib = lib
    return _lib


def _as_double_ptr(a: np.ndarray):
  return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativePolicy:
  """C++ spline policy: lock-protected plan swap + sampling.

  The act path queries actions at host-loop rate; serving them from C++
  avoids a JAX dispatch per control step.
  """

  def __init__(self, nu: int, num_points: int, interp: int = 0):
    self._lib = load_library()
    if self._lib is None:
      raise RuntimeError('native runtime unavailable')
    self.nu = nu
    self.num_points = num_points
    self._h = self._lib.mtpu_create_policy(nu, num_points, int(interp))

  def set_plan(self, times, values):
    t = np.ascontiguousarray(times, dtype=np.float64)
    v = np.ascontiguousarray(values, dtype=np.float64)
    assert t.shape == (self.num_points,), t.shape
    assert v.shape == (self.num_points, self.nu), v.shape
    self._lib.mtpu_set_plan(self._h, _as_double_ptr(t), _as_double_ptr(v))

  def set_interp(self, interp: int):
    self._lib.mtpu_set_interp(self._h, int(interp))

  def set_clamp(self, lo, hi):
    lo = np.ascontiguousarray(lo, dtype=np.float64)
    hi = np.ascontiguousarray(hi, dtype=np.float64)
    self._lib.mtpu_set_clamp(self._h, _as_double_ptr(lo), _as_double_ptr(hi))

  def action(self, t: float) -> np.ndarray:
    # fresh output buffer per call: the physics thread and gRPC handlers
    # may query concurrently, and a shared buffer could return torn vectors
    out = np.empty(self.nu, dtype=np.float64)
    self._lib.mtpu_action(self._h, float(t), _as_double_ptr(out))
    return out

  def actions(self, ts) -> np.ndarray:
    ts = np.ascontiguousarray(ts, dtype=np.float64)
    out = np.zeros((ts.shape[0], self.nu), dtype=np.float64)
    self._lib.mtpu_actions(self._h, _as_double_ptr(ts), ts.shape[0],
                           _as_double_ptr(out))
    return out

  def __del__(self):
    if getattr(self, '_h', None) and self._lib is not None:
      self._lib.mtpu_destroy_policy(self._h)
      self._h = None


class NativeThreadPool:
  """C++ worker pool with counter barrier (reference ThreadPool parity)."""

  _TASK_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)

  def __init__(self, num_threads: int):
    self._lib = load_library()
    if self._lib is None:
      raise RuntimeError('native runtime unavailable')
    self._h = self._lib.mtpu_threadpool_create(num_threads)
    self._keepalive = []

  @property
  def size(self) -> int:
    return self._lib.mtpu_threadpool_size(self._h)

  def schedule(self, fn):
    """Schedule a Python callable on a worker thread."""
    cb = self._TASK_FN(lambda _arg: fn())
    self._keepalive.append(cb)
    self._lib.mtpu_schedule(self._h, ctypes.cast(cb, ctypes.c_void_p), None)

  def wait_count(self, n: int):
    self._lib.mtpu_wait_count(self._h, n)
    self._keepalive.clear()

  def reset_count(self):
    self._lib.mtpu_reset_count(self._h)

  def get_count(self) -> int:
    return self._lib.mtpu_get_count(self._h)

  def __del__(self):
    if getattr(self, '_h', None) and self._lib is not None:
      self._lib.mtpu_threadpool_destroy(self._h)
      self._h = None
