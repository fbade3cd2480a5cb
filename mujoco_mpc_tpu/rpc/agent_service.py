"""Agent gRPC service implementation.

Headless synchronous agent service — the analog of the reference
agent_service.{h,cc}: Init loads a task and builds the Agent; planning only
happens on PlannerStep; Step applies the policy action and advances physics.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mujoco_mpc_tpu.rpc import agent_pb2 as pb
from mujoco_mpc_tpu.rpc import service

SERVICE_NAME = 'mujoco_mpc_tpu.Agent'

METHODS = {
    'Init': (pb.InitRequest, pb.InitResponse),
    'SetState': (pb.SetStateRequest, pb.SetStateResponse),
    'GetState': (pb.GetStateRequest, pb.GetStateResponse),
    'GetAction': (pb.GetActionRequest, pb.GetActionResponse),
    'PlannerStep': (pb.PlannerStepRequest, pb.PlannerStepResponse),
    'Step': (pb.StepRequest, pb.StepResponse),
    'Reset': (pb.ResetRequest, pb.ResetResponse),
    'SetTaskParameters': (pb.SetTaskParametersRequest,
                          pb.SetTaskParametersResponse),
    'GetTaskParameters': (pb.GetTaskParametersRequest,
                          pb.GetTaskParametersResponse),
    'SetCostWeights': (pb.SetCostWeightsRequest, pb.SetCostWeightsResponse),
    'GetCostValuesAndWeights': (pb.GetCostValuesAndWeightsRequest,
                                pb.GetCostValuesAndWeightsResponse),
    'GetResiduals': (pb.GetResidualsRequest, pb.GetResidualsResponse),
    'GetTotalCost': (pb.GetTotalCostRequest, pb.GetTotalCostResponse),
    'GetTaskList': (pb.GetTaskListRequest, pb.GetTaskListResponse),
    'GetBestTrajectory': (pb.GetBestTrajectoryRequest,
                          pb.GetBestTrajectoryResponse),
    'SetMocap': (pb.SetMocapRequest, pb.SetMocapResponse),
    'SetMode': (pb.SetModeRequest, pb.SetModeResponse),
    'GetMode': (pb.GetModeRequest, pb.GetModeResponse),
    'SetAnything': (pb.SetAnythingRequest, pb.SetAnythingResponse),
}


class AgentService:
  """One Agent behind RPC methods (thread-safe via the GIL + jitted fns)."""

  def __init__(self):
    self.agent = None

  # -- lifecycle ------------------------------------------------------------

  def Init(self, request, context=None):
    from mujoco_mpc_tpu import agent as agent_mod
    from mujoco_mpc_tpu.tasks import registry
    spec = registry.get_task(request.task_id)
    # optional inline model overriding the task's own physics model
    # (reference: agent.proto:59-64 / grpc_agent_util InitAgent)
    if request.HasField('model') and (request.model.xml
                                      or request.model.mjb):
      import dataclasses
      import tempfile

      import mujoco

      from mujoco_mpc_tpu.physics.model import put_model
      if request.model.xml:
        mjm = mujoco.MjModel.from_xml_string(request.model.xml)
      else:
        with tempfile.NamedTemporaryFile(suffix='.mjb') as f:
          f.write(request.model.mjb)
          f.flush()
          mjm = mujoco.MjModel.from_binary_path(f.name)
      model = put_model(mjm, dtype=spec.model.qpos0.dtype,
                        strict_sensors=False)
      spec = dataclasses.replace(spec, model=model, mj_model=mjm)
    planner_id = request.planner_id if request.planner_id >= 0 else None
    num_samples = request.num_samples or None
    self.agent = agent_mod.Agent(spec, num_samples=num_samples,
                                 planner_id=planner_id)
    return pb.InitResponse()

  def Reset(self, request, context=None):
    from mujoco_mpc_tpu.physics.model import make_data
    spec = self.agent.spec
    d = make_data(spec.model, dtype=spec.model.qpos0.dtype)
    if 'home' in spec.model.keyframe_names:
      k = spec.model.keyframe_names.index('home')
      d = d.replace(qpos=spec.model.key_qpos[k])
    self.agent.sim_data = d
    self.agent.policy = self.agent.planner.init()
    self.agent.params = spec.default_params
    return pb.ResetResponse()

  # -- state ----------------------------------------------------------------

  def SetState(self, request, context=None):
    s = request.state
    kw = {}
    if s.qpos:
      kw['qpos'] = np.asarray(s.qpos)
    if s.qvel:
      kw['qvel'] = np.asarray(s.qvel)
    if s.act:
      kw['act'] = np.asarray(s.act)
    if s.ctrl:
      kw['ctrl'] = np.asarray(s.ctrl)
    if s.mocap_pos:
      kw['mocap_pos'] = np.asarray(s.mocap_pos).reshape(-1, 3)
    if s.time:
      kw['time'] = s.time
    self.agent.set_state(**kw)
    if s.mocap_quat:
      self.agent.sim_data = self.agent.sim_data.replace(
          mocap_quat=jnp.asarray(np.asarray(s.mocap_quat).reshape(-1, 4),
                                 dtype=self.agent.sim_data.qpos.dtype))
    return pb.SetStateResponse()

  def GetState(self, request, context=None):
    d = self.agent.sim_data
    return pb.GetStateResponse(state=pb.State(
        qpos=np.asarray(d.qpos).tolist(),
        qvel=np.asarray(d.qvel).tolist(),
        act=np.asarray(d.act).tolist(),
        time=float(d.time),
        mocap_pos=np.asarray(d.mocap_pos).reshape(-1).tolist(),
        mocap_quat=np.asarray(d.mocap_quat).reshape(-1).tolist(),
        ctrl=np.asarray(d.ctrl).tolist()))

  # -- planning / acting ----------------------------------------------------

  def PlannerStep(self, request, context=None):
    info = self.agent.plan_iteration()
    return pb.PlannerStepResponse(
        best_return=float(info.get('best_return', np.nan)),
        improvement=float(info.get('improvement', 0.0)))

  def GetAction(self, request, context=None):
    time = None if request.use_current_time or request.time == 0 else \
        request.time
    nominal = bool(request.nominal_action)
    if request.averaging_duration > 0:
      # average the policy over [t, t+duration] (reference:
      # grpc_agent_util action averaging semantics)
      t0 = self.agent._host_time if time is None else float(time)
      npts = 10
      ts = np.linspace(t0, t0 + request.averaging_duration, npts)
      us = np.stack([np.asarray(self.agent.action(float(t), nominal))
                     for t in ts])
      u = us.mean(axis=0)
    else:
      u = self.agent.action(time, nominal)
    return pb.GetActionResponse(action=np.asarray(u).tolist())

  def GetBestTrajectory(self, request, context=None):
    states, actions, costs = self.agent.best_trajectory()
    states = np.asarray(states)
    actions = np.asarray(actions)
    return pb.GetBestTrajectoryResponse(
        states=states.reshape(-1).tolist(),
        actions=actions.reshape(-1).tolist(),
        costs=np.asarray(costs).reshape(-1).tolist(),
        horizon=states.shape[0], nstate=states.shape[1],
        naction=actions.shape[1])

  def SetMocap(self, request, context=None):
    d = self.agent.sim_data
    updates = {}
    if request.pos:
      updates['mocap_pos'] = jnp.asarray(
          np.asarray(request.pos).reshape(-1, 3), dtype=d.qpos.dtype)
    if request.quat:
      updates['mocap_quat'] = jnp.asarray(
          np.asarray(request.quat).reshape(-1, 4), dtype=d.qpos.dtype)
    self.agent.sim_data = d.replace(**updates)
    return pb.SetMocapResponse()

  def Step(self, request, context=None):
    self.agent.transition()
    self.agent.step(use_previous_policy=bool(request.use_previous_policy))
    return pb.StepResponse(state=self.GetState(None).state)

  # -- task parameters / costs ----------------------------------------------

  def SetTaskParameters(self, request, context=None):
    for name, value in request.parameters.items():
      self.agent.set_task_parameter(name, value)
    return pb.SetTaskParametersResponse()

  def GetTaskParameters(self, request, context=None):
    spec = self.agent.spec
    rp = np.asarray(self.agent.params.residual_params)
    params = {name: float(rp[i])
              for i, name in enumerate(spec.residual_param_names)}
    return pb.GetTaskParametersResponse(parameters=params)

  def SetCostWeights(self, request, context=None):
    self.agent.set_cost_weights(dict(request.cost_weights))
    return pb.SetCostWeightsResponse()

  def GetCostValuesAndWeights(self, request, context=None):
    spec = self.agent.spec
    terms = np.asarray(self.agent.cost_terms())
    weights = np.asarray(self.agent.params.weights)
    out = {}
    for i, name in enumerate(spec.term_names):
      out[name] = pb.ValueAndWeight(value=float(terms[i]),
                                    weight=float(weights[i]))
    return pb.GetCostValuesAndWeightsResponse(values_weights=out)

  def GetResiduals(self, request, context=None):
    from mujoco_mpc_tpu.physics import forward as fwd
    spec = self.agent.spec
    d = fwd.forward(spec.model, self.agent.sim_data)
    res = spec.residual_fn(spec.model, d,
                           self.agent.params.residual_params)
    return pb.GetResidualsResponse(residuals=np.asarray(res).tolist())

  def GetTotalCost(self, request, context=None):
    return pb.GetTotalCostResponse(
        total_cost=float(np.asarray(self.agent.cost_terms()).sum()))

  def SetMode(self, request, context=None):
    self.agent.set_mode(request.mode)
    return pb.SetModeResponse()

  def GetMode(self, request, context=None):
    return pb.GetModeResponse(mode=self.agent.mode())

  def SetAnything(self, request, context=None):
    # one-call state/parameters/weights/mode/mocap update (reference:
    # grpc_agent_util SetAnything); state first, then mocap-by-name
    if request.HasField('state'):
      self.SetState(pb.SetStateRequest(state=request.state))
    for name, value in request.parameters.items():
      self.agent.set_task_parameter(name, value)
    if request.cost_weights:
      self.agent.set_cost_weights(dict(request.cost_weights))
    if request.mode:
      self.agent.set_mode(int(request.mode))
    if request.mocap:
      mjm = self.agent.spec.mj_model
      import mujoco
      d = self.agent.sim_data
      mp = np.asarray(d.mocap_pos).copy()
      mq = np.asarray(d.mocap_quat).copy()
      for name, pose in request.mocap.items():
        bid = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_BODY, name)
        if bid < 0:
          raise ValueError(f'unknown mocap body {name!r}')
        mid = int(mjm.body_mocapid[bid])
        if mid < 0:
          raise ValueError(f'body {name!r} is not a mocap body')
        if pose.pos:
          mp[mid] = np.asarray(pose.pos)
        if pose.quat:
          mq[mid] = np.asarray(pose.quat)
      dtype = d.qpos.dtype
      self.agent.sim_data = d.replace(
          mocap_pos=jnp.asarray(mp, dtype=dtype),
          mocap_quat=jnp.asarray(mq, dtype=dtype))
    return pb.SetAnythingResponse()

  def GetTaskList(self, request, context=None):
    from mujoco_mpc_tpu.tasks import registry
    return pb.GetTaskListResponse(task_names=list(registry.task_names()))


def handlers(impl: AgentService):
  return service.make_handlers(SERVICE_NAME, METHODS, impl)


class UiAgentService(AgentService):
  """Agent service bound to a live application agent (reference:
  grpc/ui_agent_service.{h,cc}: the same proto served from inside the
  running GUI, with planning driven asynchronously by the app's plan
  thread rather than by PlannerStep RPCs)."""

  def __init__(self, app):
    super().__init__()
    self._app = app
    self.agent = app.agent

  def Init(self, request, context=None):
    # the app owns the task/agent lifecycle; Init is a no-op handshake
    return pb.InitResponse()

  def PlannerStep(self, request, context=None):
    # planning runs continuously on the app's plan thread: wait for the
    # next completed iteration instead of running one synchronously
    import time as _time
    start = self._app._plan_iterations
    deadline = _time.time() + 10.0
    while self._app._plan_iterations == start and _time.time() < deadline:
      _time.sleep(0.002)
    return pb.PlannerStepResponse(best_return=float('nan'),
                                  improvement=0.0)

  def Step(self, request, context=None):
    # the physics loop owns stepping; report the current state
    return pb.StepResponse(state=self.GetState(None).state)
