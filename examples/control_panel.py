"""Run the app with the live browser control panel.

The interactive-GUI surface (reference: mjpc/simulate.cc sliders/plots):
a local HTTP panel with live cost/action plots, weight and parameter
sliders, mode switching, plan pause and speed control.

  python examples/control_panel.py --task "Quadruped Flat" --duration 30
  # then open the printed URL (tunnel the port if running remotely)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--task', default='Cartpole')
  parser.add_argument('--duration', type=float, default=30.0)
  parser.add_argument('--samples', type=int, default=None)
  parser.add_argument('--port', type=int, default=8008)
  parser.add_argument('--platform', default=None)
  args = parser.parse_args()

  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  from mujoco_mpc_tpu import app as app_mod

  app = app_mod.App(args.task, num_samples=args.samples)
  metrics = app.run(duration=args.duration, ui_port=args.port)
  print(f"steps={metrics['steps']} plans={metrics['plan_iterations']}")


if __name__ == '__main__':
  main()
