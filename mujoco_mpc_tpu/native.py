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

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, 'native', 'mjpc_tpu_runtime.cc')
_AGENT_SRC = os.path.join(_REPO_ROOT, 'native', 'mjpc_tpu_agent.cc')

_lib = None
_lib_lock = threading.Lock()
_agent_lib = None
_agent_lib_lock = threading.Lock()


def _build_from_source(src: str, stem: str, extra_flags=()) -> str:
  """Compile a native source into a content-hash-keyed cache path.

  The cache key is the source content hash (+ flags), so a stale or
  foreign .so can never be picked up and edits always trigger a rebuild."""
  with open(src, 'rb') as f:
    payload = f.read() + repr(tuple(extra_flags)).encode()
  digest = hashlib.sha256(payload).hexdigest()[:16]
  cache_dir = os.path.join(
      os.environ.get('XDG_CACHE_HOME',
                     os.path.join(os.path.expanduser('~'), '.cache')),
      'mjpc_tpu')
  os.makedirs(cache_dir, exist_ok=True)
  lib_path = os.path.join(cache_dir, f'{stem}-{digest}.so')
  if os.path.exists(lib_path):
    return lib_path
  tmp_path = lib_path + f'.tmp{os.getpid()}'
  cmd = (['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread']
         + list(extra_flags) + [src, '-o', tmp_path])
  subprocess.run(cmd, check=True, capture_output=True)
  os.replace(tmp_path, lib_path)
  return lib_path


def _build_library() -> str:
  return _build_from_source(_SRC, 'libmjpc_tpu_runtime')


def _build_agent_library() -> str:
  """Compile the embeddable agent runner (native/mjpc_tpu_agent.cc).

  Built like a C extension (no libpython link): loaded into a running
  Python process the symbols resolve against the interpreter; standalone
  embedders link libpython themselves (python3-config --embed)."""
  import sysconfig
  include = sysconfig.get_paths()['include']
  return _build_from_source(
      _AGENT_SRC, 'libmjpc_tpu_agent',
      [f'-I{include}', f'-DMTPU_REPO_ROOT="{_REPO_ROOT}"'])


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


def load_agent_library():
  """Load (building if needed) the embeddable agent runner; None if no
  toolchain. Reference: the extern-C surface of mjpc/interface.h:44-49."""
  global _agent_lib
  with _agent_lib_lock:
    if _agent_lib is not None:
      return _agent_lib
    try:
      path = _build_agent_library()
      lib = ctypes.CDLL(path)
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
      return None
    c_double_p = ctypes.POINTER(ctypes.c_double)
    lib.mtpu_agent_create.restype = ctypes.c_int
    lib.mtpu_agent_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int]
    lib.mtpu_agent_destroy.restype = ctypes.c_int
    for f in (lib.mtpu_agent_nu, lib.mtpu_agent_nq, lib.mtpu_agent_nv,
              lib.mtpu_agent_num_weights):
      f.restype = ctypes.c_int
    lib.mtpu_agent_set_state.restype = ctypes.c_int
    lib.mtpu_agent_set_state.argtypes = [c_double_p, ctypes.c_int,
                                         c_double_p, ctypes.c_int,
                                         ctypes.c_double]
    lib.mtpu_agent_plan.restype = ctypes.c_int
    lib.mtpu_agent_step.restype = ctypes.c_int
    lib.mtpu_agent_start_plan_loop.restype = ctypes.c_int
    lib.mtpu_agent_stop_plan_loop.restype = ctypes.c_int
    lib.mtpu_agent_plan_count.restype = ctypes.c_long
    lib.mtpu_agent_action.restype = ctypes.c_int
    lib.mtpu_agent_action.argtypes = [ctypes.c_double, c_double_p,
                                      ctypes.c_int]
    lib.mtpu_agent_set_weights.restype = ctypes.c_int
    lib.mtpu_agent_set_weights.argtypes = [c_double_p, ctypes.c_int]
    lib.mtpu_last_error.restype = ctypes.c_char_p
    _agent_lib = lib
    return _agent_lib


class NativeAgent:
  """ctypes driver for the embeddable C agent runner (one global runner,
  like the reference's interface.cc:66 `runner`). Primarily a test /
  example harness — C embedders call the mtpu_agent_* surface directly."""

  def __init__(self, task_name: str, num_samples: int = 0,
               planner_id: int = -1):
    self._lib = load_agent_library()
    if self._lib is None:
      raise RuntimeError('native agent runtime unavailable')
    rc = self._lib.mtpu_agent_create(task_name.encode(), num_samples,
                                     planner_id)
    if rc != 0:
      raise RuntimeError(self._lib.mtpu_last_error().decode())
    self.nu = self._lib.mtpu_agent_nu()
    self.nq = self._lib.mtpu_agent_nq()
    self.nv = self._lib.mtpu_agent_nv()
    self.num_weights = self._lib.mtpu_agent_num_weights()

  def _check(self, rc: int):
    if rc < 0:
      raise RuntimeError(self._lib.mtpu_last_error().decode())

  def set_state(self, qpos=None, qvel=None, time=-1.0):
    qp = np.ascontiguousarray(qpos, dtype=np.float64) if qpos is not None \
        else None
    qv = np.ascontiguousarray(qvel, dtype=np.float64) if qvel is not None \
        else None
    self._check(self._lib.mtpu_agent_set_state(
        _as_double_ptr(qp) if qp is not None else None,
        qp.shape[0] if qp is not None else 0,
        _as_double_ptr(qv) if qv is not None else None,
        qv.shape[0] if qv is not None else 0, float(time)))

  def plan(self):
    self._check(self._lib.mtpu_agent_plan())

  def step(self):
    self._check(self._lib.mtpu_agent_step())

  def start_plan_loop(self):
    self._check(self._lib.mtpu_agent_start_plan_loop())

  def stop_plan_loop(self):
    self._check(self._lib.mtpu_agent_stop_plan_loop())

  @property
  def plan_count(self) -> int:
    return int(self._lib.mtpu_agent_plan_count())

  def action(self, time: float = -1.0) -> np.ndarray:
    out = np.zeros(self.nu, dtype=np.float64)
    n = self._lib.mtpu_agent_action(float(time), _as_double_ptr(out),
                                    self.nu)
    self._check(n)
    return out

  def set_weights(self, w) -> None:
    w = np.ascontiguousarray(w, dtype=np.float64)
    self._check(self._lib.mtpu_agent_set_weights(_as_double_ptr(w),
                                                 w.shape[0]))

  def close(self):
    if getattr(self, '_lib', None) is not None:
      self._lib.mtpu_agent_destroy()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
