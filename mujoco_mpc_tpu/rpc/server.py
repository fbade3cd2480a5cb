"""Server binary: serves Agent / Filter / Direct services on one port.

Analog of the reference's agent_server / filter_server / direct_server mains
(mjpc/grpc/*_server.cc), collapsed into one process with service selection:

  python -m mujoco_mpc_tpu.rpc.server --port 0 --services agent,filter,direct
"""

from __future__ import annotations

import argparse
import sys
import time


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--port', type=int, default=0)
  p.add_argument('--services', default='agent,filter,direct')
  p.add_argument('--platform', default=None,
                 help="JAX backend override (e.g. 'cpu'); the env var "
                      'JAX_PLATFORMS is not reliably honored, so this '
                      'calls jax.config before first backend use')
  args = p.parse_args()

  import os
  platform = args.platform or os.environ.get('MTPU_PLATFORM')
  if platform:
    import jax
    jax.config.update('jax_platforms', platform)

  from mujoco_mpc_tpu.rpc import service
  handlers = []
  names = args.services.split(',')
  if 'agent' in names:
    from mujoco_mpc_tpu.rpc import agent_service
    handlers.append(agent_service.handlers(agent_service.AgentService()))
  if 'filter' in names:
    from mujoco_mpc_tpu.rpc import filter_service
    handlers.append(filter_service.handlers(filter_service.FilterService()))
  if 'direct' in names:
    from mujoco_mpc_tpu.rpc import direct_service
    handlers.append(direct_service.handlers(direct_service.DirectService()))

  server, port = service.serve(handlers, port=args.port)
  # the client parses this line to discover the bound port
  print(f'SERVER_READY port={port}', flush=True)
  try:
    while True:
      time.sleep(3600)
  except KeyboardInterrupt:
    server.stop(None)


if __name__ == '__main__':
  main()
