"""Per-phase wall-clock timing + optional XLA trace capture.

The reference hand-rolls steady_clock timers around every planner phase and
surfaces them as GUI plots (mjpc/planners/sampling/planner.cc:162-184,
mjpc/agent.cc:1104-1116). Here the same role is played by a lightweight
phase-timer registry plus `jax.profiler` trace capture for device-side
analysis (xprof).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict


class PhaseTimers:
  """Accumulates wall time per named phase; thread-safe enough for the
  plan/act loops (GIL-serialized float adds)."""

  def __init__(self, window: int = 128):
    self.total: Dict[str, float] = collections.defaultdict(float)
    self.count: Dict[str, int] = collections.defaultdict(int)
    self.last: Dict[str, float] = {}
    # bounded recent-sample window for robust latency percentiles
    self.recent: Dict[str, collections.deque] = collections.defaultdict(
        lambda: collections.deque(maxlen=window))

  @contextlib.contextmanager
  def phase(self, name: str):
    t0 = time.perf_counter()
    try:
      yield
    finally:
      dt = time.perf_counter() - t0
      self.total[name] += dt
      self.count[name] += 1
      self.last[name] = dt
      self.recent[name].append(dt)

  def mean(self, name: str) -> float:
    c = self.count.get(name, 0)
    return self.total[name] / c if c else 0.0

  def p50(self, name: str) -> float:
    r = sorted(self.recent.get(name, ()))
    return r[len(r) // 2] if r else 0.0

  def snapshot(self) -> Dict[str, Dict[str, float]]:
    """Metrics dict (the plot-surface analog): per phase
    total/mean/last/p50-over-recent-window."""
    return {
        name: {'total_s': self.total[name], 'count': self.count[name],
               'mean_s': self.mean(name), 'last_s': self.last.get(name, 0.0),
               'p50_s': self.p50(name)}
        for name in self.total
    }

  def reset(self):
    self.total.clear()
    self.count.clear()
    self.last.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
  """Capture an XLA/TPU profile (view with xprof/tensorboard)."""
  import jax
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()
