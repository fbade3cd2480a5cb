"""Persistent-compilation-cache enablement for the axon TPU backend.

jax's persistent cache gates on `backend.platform in ["tpu", "gpu",
"cpu", "neuron"]` (jax/_src/compilation_cache.py is_cache_used); the
tunneled TPU plugin reports platform "axon" and silently loses every
compile — contact-rich configs here cost up to 40 min of XLA time each
(docs/PERF.md), so cache misses dominate round turnaround. This module
force-marks the cache as usable when the backend can serialize
executables, which the axon PJRT client can.

Import and call `enable()` BEFORE the first jit compilation (bench.py,
docs/ tools, tests/conftest.py all do).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> bool:
  """Point the persistent cache at `cache_dir` and force-enable it for
  the current (possibly allowlist-unknown) backend. Returns True if the
  cache is active. Safe to call more than once."""
  path = cache_dir or os.environ.get(
      'JAX_COMPILATION_CACHE_DIR',
      os.path.expanduser('~/.jax_cache'))
  os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', path)
  try:
    import jax
    from jax._src import compilation_cache as cc

    jax.config.update('jax_compilation_cache_dir', path)
    # accept tiny programs too: the per-step jits of the app/agent path
    # are small but re-traced every session
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    with cc._cache_initialized_mutex:
      cc._cache_checked = True
      cc._cache_used = True
    return True
  except Exception:
    return False
