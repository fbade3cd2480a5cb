"""Interactive / headless application loops.

TPU-native analog of the reference GUI application threads
(/root/reference/mjpc/app.cc): a physics loop stepping in (scaled) real
time, an asynchronous plan loop continuously replanning from the latest
state snapshot, and an optional `mujoco.viewer` passive window for
rendering. The reference couples its loops with mutexes over shared mjData;
here the Agent owns device state and the loops exchange only tiny host
values (time floats, numpy actions from the native policy container).

Threads (reference app.cc:464-503):
  physics thread  -- real-time-synced stepping, control noise injection
  plan thread     -- continuous PlanIteration (agent.cc:318-329)
  render (main)   -- optional mujoco.viewer passive sync
"""

from __future__ import annotations

import argparse
import threading
import time
from typing import Optional

import numpy as np

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.tasks import registry
from mujoco_mpc_tpu.utils import cache as cache_mod
from mujoco_mpc_tpu.utils import profiler as profiler_mod

# app sessions re-jit the same plan/step programs every launch; the
# persistent cache needs force-enabling on the axon platform
cache_mod.enable()


class OrnsteinUhlenbeckNoise:
  """Exploration/control noise injection (reference app.cc:292-304)."""

  def __init__(self, nu: int, std: float, rate: float = 0.9,
               seed: int = 0):
    self.std = std
    self.rate = rate
    self.state = np.zeros(nu)
    self.rng = np.random.RandomState(seed)

  def sample(self) -> np.ndarray:
    self.state = (self.rate * self.state +
                  np.sqrt(1 - self.rate ** 2) *
                  self.rng.randn(*self.state.shape) * self.std)
    return self.state


class App:
  """Plan/act application around one Agent."""

  def __init__(self, task: str, planner_id: Optional[int] = None,
               num_samples: Optional[int] = None,
               percent_realtime: float = 100.0,
               ctrl_noise_std: float = 0.0, seed: int = 0,
               estimator: Optional[str] = None,
               sensor_noise_std: float = 0.0):
    self.spec = registry.get_task(task)
    self.agent = agent_mod.Agent(self.spec, num_samples=num_samples,
                                 planner_id=planner_id, seed=seed)
    self.percent_realtime = percent_realtime
    self.timers = profiler_mod.PhaseTimers()
    self.noise = (OrnsteinUhlenbeckNoise(self.spec.model.nu, ctrl_noise_std,
                                         seed=seed)
                  if ctrl_noise_std > 0 else None)
    # estimator-in-the-loop (reference EstimatorLoop, app.cc:151-206):
    # the filter consumes noisy sensors + ctrl each step and its state
    # estimate becomes the planner's initial state
    self.estimator = estimator
    self.sensor_noise_std = sensor_noise_std
    self._est_state = None
    if estimator in ('ekf', 'ukf'):
      import functools
      import jax
      import jax.numpy as jnp
      from mujoco_mpc_tpu.estimators import base as est_base
      from mujoco_mpc_tpu.estimators import kalman, unscented
      from mujoco_mpc_tpu.physics import sensors as sensors_mod
      from mujoco_mpc_tpu.physics import forward as fwd_mod
      m = self.spec.model
      template = self.agent.sim_data
      self._est_state = est_base.init_state(m, dtype=m.qpos0.dtype)
      self._est_state = self._est_state.replace(
          qpos=self.agent.sim_data.qpos)
      upd = kalman.update if estimator == 'ekf' else unscented.update
      self._est_update = jax.jit(functools.partial(upd, m, template))

      def read_sensors(d):
        d = fwd_mod.forward(m, d)
        return sensors_mod.sensordata(m, d)

      self._read_sensors = jax.jit(read_sensors)
      self._est_rng = np.random.RandomState(seed + 1)
    self._exit = threading.Event()
    self._plan_enabled = threading.Event()
    self._plan_enabled.set()
    self._steps = 0
    self._plan_iterations = 0
    self._state_lock = threading.Lock()
    self._record_plots = False   # set when the control panel is attached

  # -- plan thread (reference Agent::Plan, agent.cc:318-329) ---------------
  def _plan_loop(self):
    while not self._exit.is_set():
      if not self._plan_enabled.is_set():
        time.sleep(0.001)
        continue
      with self.timers.phase('plan_iteration'):
        # hold the state lock only around the snapshot and the policy
        # install; the long device optimize runs unlocked so the physics
        # thread keeps stepping (reference: brief mutex around the state
        # copy, agent.cc:283-290)
        with self._state_lock:
          inputs = self.agent.snapshot_plan_inputs()
        policy, _ = self.agent.plan_from(*inputs)
        with self._state_lock:
          self.agent.install_policy(policy)
        self._plan_iterations += 1

  # -- physics thread (reference PhysicsLoop, app.cc:209-386) --------------
  def _physics_loop(self, duration: float):
    dt = float(self.spec.model.opt.timestep)
    scale = max(self.percent_realtime, 1e-3) / 100.0
    start_wall = time.perf_counter()
    sim_time = 0.0
    while not self._exit.is_set() and sim_time < duration:
      with self.timers.phase('physics_step'):
        with self._state_lock:
          self.agent.transition()
          if self.noise is not None:
            # inject noise into the APPLIED action (reference
            # app.cc:292-304): pass the noisy ctrl through step() so the
            # policy action does not overwrite it
            u = np.asarray(self.agent.action(), dtype=np.float64)
            self.agent.step(ctrl=u + self.noise.sample())
          else:
            self.agent.step()
          if self._est_state is not None:
            self._estimator_update()
          # live plot traces for the control panel, rate-limited: each
          # record is a device->host readback (~ms over the TPU tunnel)
          if self._record_plots and self._steps % 5 == 0:
            self.agent.record_plots()
        self._steps += 1
        sim_time += dt
      # real-time sync (app.cc:306-362): sleep until wall clock catches up
      target_wall = start_wall + sim_time / scale
      lag = target_wall - time.perf_counter()
      if lag > 0:
        time.sleep(lag)

  # -- estimator update (reference EstimatorLoop) --------------------------
  def _estimator_update(self):
    import jax.numpy as jnp
    with self.timers.phase('estimator_update'):
      d = self.agent.sim_data
      y = np.asarray(self._read_sensors(d))
      if self.sensor_noise_std > 0:
        y = y + self._est_rng.randn(*y.shape) * self.sensor_noise_std
      self._est_state = self._est_update(
          self._est_state, d.ctrl, jnp.asarray(y, dtype=d.qpos.dtype))

  def estimate(self):
    """Latest filter state (qpos, qvel)."""
    s = self._est_state
    return (np.asarray(s.qpos), np.asarray(s.qvel)) if s is not None else None

  def run(self, duration: float = 5.0, render: bool = False,
          serve_port: Optional[int] = None,
          ui_port: Optional[int] = None):
    """Run plan+physics loops for `duration` sim seconds.

    serve_port: also expose the agent over gRPC from inside the running
    app (reference: ui_agent_server — async planning, shared agent).
    ui_port: serve the live browser control panel (mujoco_mpc_tpu.ui —
    the interactive-GUI surface: sliders, modes, live plots)."""
    # warm start: run (and compile) one plan iteration before the loops
    # begin so physics always acts on a valid plan and the async loops run
    # at steady-state rates from the first step
    with self.timers.phase('plan_iteration'):
      self.agent.plan_iteration()
      self._plan_iterations += 1
    plan_thread = threading.Thread(target=self._plan_loop, daemon=True)
    phys_thread = threading.Thread(target=self._physics_loop,
                                   args=(duration,), daemon=True)
    plan_thread.start()
    phys_thread.start()

    server = None
    if serve_port is not None:
      from mujoco_mpc_tpu.rpc import agent_service, service
      svc = agent_service.UiAgentService(self)
      server, self.serve_port = service.serve(
          [agent_service.handlers(svc)], port=serve_port)

    panel = None
    if ui_port is not None:
      from mujoco_mpc_tpu import ui
      self._record_plots = True
      panel = ui.ControlPanel(self, port=ui_port).start()
      self.ui_port = panel.port
      print(f'control panel: http://127.0.0.1:{panel.port}/')

    if render:
      self._render_loop(phys_thread)
    phys_thread.join()
    self._exit.set()
    plan_thread.join(timeout=5.0)
    if server is not None:
      server.stop(grace=0.5)
    if panel is not None:
      panel.stop()
    return self.metrics()

  # -- render (main thread; reference sim->RenderLoop) ---------------------
  def _render_loop(self, phys_thread):
    try:
      import mujoco
      import mujoco.viewer
    except Exception:
      return
    mjm = self.spec.mj_model
    mjd = mujoco.MjData(mjm)
    with mujoco.viewer.launch_passive(mjm, mjd) as viewer:
      perturb_was_active = False
      while viewer.is_running() and phys_thread.is_alive():
        with self._state_lock:
          qpos = np.asarray(self.agent.sim_data.qpos)
          mocap = np.asarray(self.agent.sim_data.mocap_pos)
        mjd.qpos[:] = qpos
        if mjm.nmocap:
          mjd.mocap_pos[:] = mocap
        mujoco.mj_forward(mjm, mjd)
        # drag perturbation: apply the viewer's perturb wrench to the
        # live sim state (reference: simulate.cc perturbation UI)
        pert = getattr(viewer, 'perturb', None)
        if pert is not None:
          active = pert.select > 0 and pert.active
          if active or perturb_was_active:
            mjd.xfrc_applied[:] = 0.0
            if active:
              mujoco.mjv_applyPerturbForce(mjm, mjd, pert)
            with self._state_lock:
              self.agent.set_state(xfrc_applied=mjd.xfrc_applied.copy())
          perturb_was_active = active
        viewer.sync()
        time.sleep(1.0 / 60.0)

  def metrics(self):
    snap = self.timers.snapshot()
    return {
        'steps': self._steps,
        'plan_iterations': self._plan_iterations,
        'timers': snap,
    }


def main(argv=None):
  parser = argparse.ArgumentParser(description='TPU MPC application')
  parser.add_argument('--task', default='Cartpole',
                      choices=list(registry.task_names()))
  parser.add_argument('--planner', type=int, default=None)
  parser.add_argument('--samples', type=int, default=None)
  parser.add_argument('--duration', type=float, default=5.0)
  parser.add_argument('--percent_realtime', type=float, default=100.0)
  parser.add_argument('--ctrl_noise_std', type=float, default=0.0)
  parser.add_argument('--render', action='store_true')
  parser.add_argument('--estimator', choices=['ekf', 'ukf'], default=None,
                      help='run a filter in the loop (reference '
                           'EstimatorLoop)')
  parser.add_argument('--sensor_noise_std', type=float, default=0.0)
  parser.add_argument('--serve_port', type=int, default=None,
                      help='also serve the agent gRPC API from inside the '
                           'running app (reference: ui_agent_server)')
  parser.add_argument('--ui_port', type=int, default=None,
                      help='serve the live browser control panel (sliders, '
                           'modes, live plots; reference: simulate GUI)')
  parser.add_argument('--platform', default=None,
                      help="JAX platform override (e.g. 'cpu'): applied "
                           'via jax.config before first backend use, which '
                           'is honored even where the JAX_PLATFORMS env '
                           'var is not')
  args = parser.parse_args(argv)

  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  app = App(args.task, planner_id=args.planner, num_samples=args.samples,
            percent_realtime=args.percent_realtime,
            ctrl_noise_std=args.ctrl_noise_std, estimator=args.estimator,
            sensor_noise_std=args.sensor_noise_std)
  metrics = app.run(duration=args.duration, render=args.render,
                    serve_port=args.serve_port, ui_port=args.ui_port)
  plan_mean = metrics['timers'].get('plan_iteration', {}).get('mean_s', 0)
  print(f"steps={metrics['steps']} plans={metrics['plan_iterations']} "
        f"plan_mean_s={plan_mean:.4f}")
  return metrics


if __name__ == '__main__':
  main()
