"""Agent: plan/act orchestration over a task.

TPU-native analog of the reference Agent (/root/reference/mjpc/agent.{h,cc})
and its synchronous benchmark loop (mjpc/testspeed.cc:44-129). The reference
couples a planner thread, physics thread and estimator thread through
mutex-guarded snapshots; here the plan-act loop is a single jitted program:
`lax.scan` over (plan iteration -> steps_per_plan sim steps), with the policy
pytree double-buffered by value through the scan carry.

A host-driven `Agent` class offers the same plan-iteration / action / step
API surface as the reference for interactive and service use.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.ops import pallas_newton
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import Data, Model, make_data
from mujoco_mpc_tpu.planners import rollout as rollout_mod
from mujoco_mpc_tpu.planners import sampling
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec

# reference: trajectory.h:27
MAX_TRAJECTORY_HORIZON = 512


def horizon_steps(spec: TaskSpec) -> int:
  """Planning horizon in steps (reference: agent.cc:279-280)."""
  cfg = spec.config
  horizon = float(cfg.get('agent_horizon', 1.0))
  timestep = float(cfg.get('agent_timestep',
                           float(spec.mj_model.opt.timestep)))
  return min(int(horizon / timestep + 1), MAX_TRAJECTORY_HORIZON)


def plan_model(spec: TaskSpec) -> Model:
  """Planning model: task model with the agent_timestep."""
  ts = spec.config.get('agent_timestep', None)
  m = spec.model
  if ts is None or float(ts) == float(m.opt.timestep):
    return m
  return m.replace(opt=m.opt.replace(
      timestep=jnp.asarray(ts, dtype=m.qpos0.dtype)))


def plan_spec(spec: TaskSpec) -> TaskSpec:
  """Spec whose model integrates at agent_timestep: ALL planner rollouts
  must use this, not spec.model — the reference plans at agent_timestep
  while the sim runs at the model timestep (agent.cc:279-280; exposed by
  the reference cartpole config: model dt 0.001, agent_timestep 0.01)."""
  pm = plan_model(spec)
  if pm is spec.model:
    return spec
  return dataclasses.replace(spec, model=pm)


def sync_plan_state(plan_d: Data, sim_d: Data) -> Data:
  """Snapshot the sim state into planning Data (reference: State::Set)."""
  return plan_d.replace(
      time=sim_d.time, qpos=sim_d.qpos, qvel=sim_d.qvel, act=sim_d.act,
      ctrl=sim_d.ctrl, mocap_pos=sim_d.mocap_pos,
      mocap_quat=sim_d.mocap_quat, userdata=sim_d.userdata)


@struct.dataclass
class MpcCarry:
  sim: Data
  policy: sampling.SamplingPolicy
  params: TaskParams
  key: jax.Array


def make_mpc_step(spec: TaskSpec, num_samples: int, steps_per_plan: int,
                  interp: int = spline.Interp.ZERO,
                  planner_iterations: int = 1):
  """Build the jittable plan-and-step body for synchronous MPC."""
  t_steps = horizon_steps(spec)
  pspec = plan_spec(spec)   # planner rollouts integrate at agent_timestep
  pmodel = pspec.model
  sim_model = spec.model

  def plan_and_step(carry: MpcCarry, _) -> Tuple[MpcCarry, dict]:
    sim, policy, params, key = (carry.sim, carry.policy, carry.params,
                                carry.key)
    key, k_plan, k_trans = jax.random.split(key, 3)

    # task transition (pure; reference Task::Transition)
    if spec.transition_fn is not None:
      sim, params = spec.transition_fn(sim_model, sim, params, k_trans)

    # plan from the current sim state
    plan_d = sync_plan_state(make_data(pmodel, dtype=sim.qpos.dtype), sim)
    cfg = sampling.default_config(pspec, dtype=sim.qpos.dtype)

    def one_iter(pol, k):
      pol, info = sampling.optimize(
          pspec, pol, plan_d, params, cfg, k, num_samples, t_steps, interp)
      return pol, info['best_return']

    keys = jax.random.split(k_plan, planner_iterations)
    policy, best_returns = jax.lax.scan(one_iter, policy, keys)

    # act: step the sim steps_per_plan times under the (frozen) policy.
    # The batch-1 contact solve is op-dispatch-bound on TPU (the unrolled
    # XLA Newton emits ~nv^2 tiny HLO ops per iteration); broadcasting the
    # state to one 128-lane tile and vmapping forward() dispatches the
    # fused Pallas Newton kernel instead — identical lanes, take lane 0.
    # A (128, nv) f32 tile costs the same per-op time as (nv,), so the
    # smooth-dynamics ops are latency-neutral while the solver collapses
    # to one kernel call. TPU-only (on CPU 128 lanes are 128x FLOPs).
    lanes = 0
    if (os.environ.get('MJPC_TPU_SIM_LANES', '1') != '0'
        and sim_model.qpos0.dtype == jnp.float32
        and sim_model.nv <= pallas_newton.MAX_NV
        and pallas_newton._on_tpu()):
      lanes = pallas_newton.MIN_BATCH

    def sim_step(d, _):
      u = sampling.action_from_policy(spec, policy, d.time, interp)
      d = d.replace(ctrl=u)
      if lanes:
        db = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (lanes,) + jnp.shape(x)), d)
        db = jax.vmap(lambda dd: fwd.forward(sim_model, dd))(db)
        d = jax.tree.map(lambda x: x[0], db)
      else:
        d = fwd.forward(sim_model, d)
      res = spec.residual_fn(sim_model, d, params.residual_params)
      cost = spec.cost(res, params)
      d = fwd.integrate(sim_model, d)
      return d, cost

    sim, costs = jax.lax.scan(sim_step, sim, None, length=steps_per_plan)

    out = {'costs': costs, 'best_return': best_returns[-1]}
    return MpcCarry(sim=sim, policy=policy, params=params, key=key), out

  return plan_and_step


def synchronous_mpc(spec: TaskSpec, num_samples: int, total_steps: int,
                    steps_per_plan: int, key: jax.Array,
                    interp: int = spline.Interp.ZERO,
                    num_spline_points: Optional[int] = None,
                    sim0: Optional[Data] = None,
                    params: Optional[TaskParams] = None,
                    planner_iterations: int = 1):
  """Jitted synchronous planning loop (reference: testspeed.cc:44-129).

  Returns (final carry, per-step costs (total_steps,))."""
  dtype = spec.model.qpos0.dtype
  if num_spline_points is None:
    num_spline_points = int(spec.config.get('sampling_spline_points', 10))
  if sim0 is None:
    sim0 = make_data(spec.model, dtype=dtype)
  if params is None:
    params = spec.default_params

  policy = sampling.default_policy(spec, num_spline_points, dtype=dtype)
  body = make_mpc_step(spec, num_samples, steps_per_plan, interp,
                       planner_iterations)
  carry = MpcCarry(sim=sim0, policy=policy, params=params, key=key)
  nplans = total_steps // steps_per_plan
  carry, out = jax.lax.scan(body, carry, None, length=nplans)
  return carry, out['costs'].reshape(-1)


class Agent:
  """Host-driven agent mirroring the reference Agent API surface
  (agent.h:62-166): owns a task, a planner from the registry, current state,
  and exposes plan-iteration / action / step / cost introspection."""

  def __init__(self, spec: TaskSpec, num_samples: Optional[int] = None,
               interp: int = spline.Interp.ZERO,
               num_spline_points: Optional[int] = None, seed: int = 0,
               planner_id: Optional[int] = None, use_native_act: bool = True):
    from mujoco_mpc_tpu.planners import registry as planner_registry

    self.spec = spec
    self.interp = int(interp)
    dtype = spec.model.qpos0.dtype
    if planner_id is None:
      planner_id = int(spec.config.get('agent_planner', 0))
    if num_samples is None:
      num_samples = int(spec.config.get('sampling_trajectories', 128))
    self.planner_id = planner_id
    self.num_samples = num_samples
    p = num_spline_points or int(spec.config.get('sampling_spline_points',
                                                 10))
    self.horizon_steps = horizon_steps(spec)
    self.planner = planner_registry.make_planner(
        plan_spec(spec), planner_id, num_samples, self.horizon_steps, p,
        interp=self.interp, dtype=dtype)
    self.policy = self.planner.init()
    self.params = spec.default_params
    self.plan_data = make_data(plan_model(spec), dtype=dtype)
    self.sim_data = make_data(spec.model, dtype=dtype)
    if 'home' in spec.model.keyframe_names:
      k = spec.model.keyframe_names.index('home')
      self.sim_data = self.sim_data.replace(
          qpos=spec.model.key_qpos[k].astype(dtype))
    self.key = jax.random.key(seed)
    # host-side mirror of sim time: the native act path must not pay a
    # device->host readback per action query
    self._host_time = 0.0
    self._plots = {'time': [], 'cost_terms': [], 'total_cost': [],
                   'action': []}
    self._best_traj_fn = None

    self._optimize = jax.jit(self.planner.optimize)
    self._action = jax.jit(self.planner.action)
    self._nominal_action = jax.jit(self.planner.nominal_action)
    # policy from before the last install (Step use_previous_policy,
    # reference agent.proto:142-146: simulated planning delay)
    self.prev_policy = self.policy

    # native act path: serve spline-policy action queries from the C++
    # runtime (reference: ActionFromPolicy on the physics thread,
    # app.cc:84-102) instead of paying a JAX dispatch per control step.
    # Only spline-backed policies (times/values leaves) are eligible.
    self._native_policy = None
    if use_native_act and hasattr(self.policy, 'times'):
      try:
        from mujoco_mpc_tpu import native
        npol = native.NativePolicy(spec.model.nu, p, self.interp)
        cr = np.asarray(spec.model.actuator_ctrlrange, dtype=np.float64)
        npol.set_clamp(cr[:, 0], cr[:, 1])
        self._native_policy = npol
      except Exception:  # no toolchain: fall back to the JAX act path
        self._native_policy = None
    self._step = jax.jit(functools.partial(fwd.step, spec.model))
    if spec.transition_fn is not None:
      self._transition = jax.jit(functools.partial(
          spec.transition_fn, spec.model))
    else:
      self._transition = None

  # -- reference Agent::SetState -------------------------------------------
  def set_state(self, qpos=None, qvel=None, time=None, act=None,
                mocap_pos=None, ctrl=None, xfrc_applied=None):
    d = self.sim_data
    updates = {}
    if qpos is not None:
      updates['qpos'] = jnp.asarray(qpos, dtype=d.qpos.dtype)
    if qvel is not None:
      updates['qvel'] = jnp.asarray(qvel, dtype=d.qpos.dtype)
    if act is not None:
      updates['act'] = jnp.asarray(act, dtype=d.qpos.dtype)
    if time is not None:
      updates['time'] = jnp.asarray(time, dtype=d.qpos.dtype)
      self._host_time = float(time)
    if mocap_pos is not None:
      updates['mocap_pos'] = jnp.asarray(mocap_pos, dtype=d.qpos.dtype)
    if ctrl is not None:
      updates['ctrl'] = jnp.asarray(ctrl, dtype=d.qpos.dtype)
    if xfrc_applied is not None:
      # GUI drag perturbations (reference: simulate's perturb wrench)
      updates['xfrc_applied'] = jnp.asarray(xfrc_applied,
                                            dtype=d.qpos.dtype)
    self.sim_data = d.replace(**updates)

  # -- reference Agent::PlanIteration --------------------------------------
  # Split into snapshot / optimize / install so callers with a physics
  # thread can hold their state lock only around the (cheap) snapshot and
  # install, with the long device optimize outside the lock — the
  # reference's brief mutex around the state copy (agent.cc:283-290).
  def snapshot_plan_inputs(self):
    """Snapshot (policy, plan state, params, rng) for one plan iteration."""
    self.key, k = jax.random.split(self.key)
    plan_d = sync_plan_state(self.plan_data, self.sim_data)
    return self.policy, plan_d, self.params, k

  def plan_from(self, policy, plan_d, params, k):
    """Run the optimizer on a snapshot (no agent state touched)."""
    return self._optimize(policy, plan_d, params, k)

  def install_policy(self, policy):
    """Install a newly optimized policy (the reference's policy swap
    under shared_mutex, sampling/planner.cc:525-534)."""
    self.prev_policy = self.policy
    self.policy = policy
    if self._native_policy is not None:
      self._native_policy.set_plan(np.asarray(policy.times),
                                   np.asarray(policy.values))

  def plan_iteration(self):
    policy, info = self.plan_from(*self.snapshot_plan_inputs())
    self.install_policy(policy)
    return info

  # -- reference Task::Transition ------------------------------------------
  def transition(self):
    if self._transition is not None:
      self.key, k = jax.random.split(self.key)
      self.sim_data, self.params = self._transition(
          self.sim_data, self.params, k)

  # -- reference Agent::ActionFromPolicy -----------------------------------
  def action(self, time=None, nominal: bool = False,
             use_previous_policy: bool = False) -> jax.Array:
    """Policy action at `time` (current sim time when None).

    nominal=True drops feedback terms (iLQG/iLQS; no effect otherwise —
    reference agent.proto:108-111). use_previous_policy=True queries the
    policy from before the last install (simulated planning delay,
    agent.proto:142-146)."""
    d = self.sim_data
    t = d.time if time is None else time
    if (self._native_policy is not None and not nominal
        and not use_previous_policy):
      t_host = self._host_time if time is None else float(time)
      # host numpy out: the act path serves host consumers (service loop,
      # GUI); a device put here would cost a transfer per control step
      return self._native_policy.action(t_host)
    pol = self.prev_policy if use_previous_policy else self.policy
    fn = self._nominal_action if nominal else self._action
    return fn(pol, d.qpos, d.qvel, d.act, t)

  # -- physics step with the policy action ---------------------------------
  def step(self, ctrl=None, use_previous_policy: bool = False):
    """Step the sim under the policy action, or an explicit `ctrl`
    override (used by the app to inject control noise into the applied
    action, reference app.cc:292-304)."""
    u = (self.action(use_previous_policy=use_previous_policy)
         if ctrl is None else ctrl)
    u = jnp.asarray(u, dtype=self.sim_data.qpos.dtype)
    self.sim_data = self._step(self.sim_data.replace(ctrl=u))
    self._host_time += float(self.spec.model.opt.timestep)
    return self.sim_data

  # -- reference Planner::BestTrajectory ------------------------------------
  def best_trajectory(self):
    """Roll out the current policy from the current state: (states
    (T, nq+nv+na), actions (T, nu), costs (T,))."""
    if self._best_traj_fn is None:
      m = self.spec.model
      spec = self.spec

      def run(policy, d, params):
        def body(dd, _):
          u = self.planner.action(policy, dd.qpos, dd.qvel, dd.act, dd.time)
          dd = dd.replace(ctrl=u)
          dd = fwd.forward(m, dd)
          res = spec.residual_fn(m, dd, params.residual_params)
          c = spec.cost(res, params)
          state = jnp.concatenate([dd.qpos, dd.qvel, dd.act])
          dd = fwd.integrate(m, dd)
          return dd, (state, u, c)

        _, (states, actions, costs) = jax.lax.scan(
            body, d, None, length=self.horizon_steps)
        return states, actions, costs

      self._best_traj_fn = jax.jit(run)
    return self._best_traj_fn(self.policy, self.sim_data, self.params)

  def cost_terms(self):
    m = self.spec.model
    d = fwd.forward(m, self.sim_data)
    res = self.spec.residual_fn(m, d, self.params.residual_params)
    return self.spec.cost_terms(res, self.params)

  # -- plot traces (reference AgentPlots, agent.h:38-43: GUI figures of
  # cost terms / actions over time; here a bounded host-side history) -----
  def record_plots(self, max_len: int = 512):
    terms = np.asarray(self.cost_terms())
    self._plots['time'].append(float(self._host_time))
    self._plots['cost_terms'].append(terms)
    self._plots['total_cost'].append(float(terms.sum()))
    self._plots['action'].append(np.asarray(self.action()))
    for k in self._plots:
      if len(self._plots[k]) > max_len:
        del self._plots[k][:-max_len]

  def plots(self):
    return {
        'term_names': self.spec.term_names,
        'time': list(self._plots['time']),
        'cost_terms': [t.tolist() for t in self._plots['cost_terms']],
        'total_cost': list(self._plots['total_cost']),
        'action': [a.tolist() for a in self._plots['action']],
    }

  def set_cost_weights(self, weights_by_name):
    w = self.params.weights
    for name, val in weights_by_name.items():
      idx = self.spec.term_names.index(name)
      w = w.at[idx].set(val)
    self.params = self.params.replace(weights=w)

  def set_task_parameter(self, name, value):
    idx = self.spec.residual_param_names.index(name)
    rp = self.params.residual_params.at[idx].set(value)
    self.params = self.params.replace(residual_params=rp)

  # -- task modes (reference Agent::SetModeByName, agent.cc:421-448; modes
  # here are the task's first `select_*` residual parameter, the analog of
  # the reference's residual_select_ GUI dropdowns) -----------------------
  def _mode_param(self):
    for name in self.spec.residual_param_names:
      if name.startswith('select_'):
        return name
    return None

  def set_mode(self, mode: int):
    name = self._mode_param()
    if name is None:
      if mode != 0:
        raise ValueError(f'task {self.spec.name!r} has no modes')
      return
    self.set_task_parameter(name, float(mode))

  def mode(self) -> int:
    name = self._mode_param()
    if name is None:
      return 0
    idx = self.spec.residual_param_names.index(name)
    return int(round(float(np.asarray(self.params.residual_params)[idx])))
