"""Split steady-state plan latency into device time vs host/tunnel cost.

For each config, chains N plans three ways and prints the decomposition:
  dispatch-only: submit N chained plans, measure wall BEFORE blocking —
    the host+tunnel cost of getting work onto the chip;
  steady: same loop with one final block (bench.py's *_steady_ms);
  device: jax.profiler envelope of the jitted plan (jit_plan event).

The reference has no analog (its planner runs on the host); this tool
exists because on an axon-tunneled TPU every dispatch carries RPC cost
that bench's steady numbers were silently including (round-5 finding:
shadow 527 ms steady vs ~175 ms device).

  python docs/measure_dispatch.py shadow [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
from mujoco_mpc_tpu.utils import cache as _mcache  # noqa: E402
_mcache.enable()

CONFIGS = {
    'cartpole': ('Cartpole', 8192),
    'quadruped': ('Quadruped Flat', 4096),
    'humanoid_track': ('Humanoid Track', 512),
    'shadow': ('Shadow Reorient', 8192),
    'rubik': ('Cube Solving', 512),
}


def main():
  cfg = sys.argv[1] if len(sys.argv) > 1 else 'shadow'
  n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
  task, ns = CONFIGS[cfg]

  import jax
  from docs.profile_config import build_plan

  plan, policy = build_plan(task, ns)
  key = jax.random.key(0)
  r = plan(policy, key)
  jax.block_until_ready(r)

  # dispatch-only vs steady
  p = policy
  t0 = time.perf_counter()
  for _ in range(n):
    p, _ = plan(p, key)
  t_dispatch = time.perf_counter() - t0
  jax.block_until_ready(p)
  t_total = time.perf_counter() - t0
  print(f'{cfg}: {n} chained plans')
  print(f'  dispatch-only wall: {t_dispatch*1e3/n:8.1f} ms/call')
  print(f'  steady (blocked):   {t_total*1e3/n:8.1f} ms/call')

  # single blocking call for reference
  t0 = time.perf_counter()
  r = plan(policy, key)
  jax.block_until_ready(r)
  print(f'  blocking single:    {(time.perf_counter()-t0)*1e3:8.1f} ms')


if __name__ == '__main__':
  main()
