"""Python client API: Agent / Filter / Direct over gRPC.

Mirrors the reference Python clients (python/mujoco_mpc/{agent,filter,
direct}.py): each client spawns the server subprocess on a free port,
connects over localhost, and exposes the RPC surface as methods. Pass
`server_process=False` (or an existing address) to attach to a running
server.
"""

from __future__ import annotations

import atexit
import dataclasses
import os
import subprocess
import sys
from typing import Dict, Optional, Sequence

import grpc
import numpy as np

from mujoco_mpc_tpu.rpc import agent_pb2, direct_pb2, filter_pb2
from mujoco_mpc_tpu.rpc import agent_service, direct_service, filter_service
from mujoco_mpc_tpu.rpc.service import ClientStub

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn_server(services: str, platform: Optional[str] = None):
  env = dict(os.environ)
  env.setdefault('PYTHONPATH', _REPO_ROOT)
  cmd = [sys.executable, '-m', 'mujoco_mpc_tpu.rpc.server', '--port', '0',
         '--services', services]
  if platform or env.get('MTPU_PLATFORM'):
    # pin the server's JAX backend (tests force cpu so a down TPU
    # tunnel can't hang the subprocess at backend init)
    cmd += ['--platform', platform or env['MTPU_PLATFORM']]
  proc = subprocess.Popen(
      cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
      cwd=_REPO_ROOT, env=env)
  # wait for the ready line with the bound port
  for line in proc.stdout:
    if line.startswith('SERVER_READY'):
      port = int(line.strip().split('port=')[1])
      atexit.register(proc.terminate)
      return proc, port
  raise RuntimeError('server failed to start')


class _BaseClient:
  _SERVICES = 'agent,filter,direct'

  def __init__(self, address: Optional[str] = None,
               platform: Optional[str] = None):
    self._proc = None
    if address is None:
      self._proc, port = _spawn_server(self._SERVICES, platform)
      address = f'localhost:{port}'
    self.channel = grpc.insecure_channel(address)
    grpc.channel_ready_future(self.channel).result(timeout=30)

  def close(self):
    self.channel.close()
    if self._proc is not None:
      self._proc.terminate()
      self._proc = None

  def __enter__(self):
    return self

  def __exit__(self, *args):
    self.close()


@dataclasses.dataclass
class MjpcParameters:
  """Bundle of task configuration applied in one call (reference:
  python/mujoco_mpc/mjpc_parameters.py:16-24)."""
  mode: Optional[int] = None
  task_parameters: Dict[str, float] = dataclasses.field(default_factory=dict)
  cost_weights: Dict[str, float] = dataclasses.field(default_factory=dict)
  mocap_pos: Optional[np.ndarray] = None
  mocap_quat: Optional[np.ndarray] = None


class Agent(_BaseClient):
  """Agent client (reference: python/mujoco_mpc/agent.py:68-392)."""
  _SERVICES = 'agent'

  def __init__(self, task_id: str, planner_id: int = -1,
               num_samples: int = 0, address: Optional[str] = None,
               model_xml: Optional[str] = None,
               model_mjb: Optional[bytes] = None):
    super().__init__(address)
    self.stub = ClientStub(self.channel, agent_service.SERVICE_NAME,
                           agent_service.METHODS)
    req = agent_pb2.InitRequest(
        task_id=task_id, planner_id=planner_id, num_samples=num_samples)
    if model_xml or model_mjb:
      # inline model overriding the task's own (reference agent.proto Init)
      req.model.CopyFrom(agent_pb2.MjModel(xml=model_xml or '',
                                           mjb=model_mjb or b''))
    self.stub.Init(req)

  def set_state(self, qpos=None, qvel=None, act=None, time=None,
                mocap_pos=None, mocap_quat=None, ctrl=None):
    state = agent_pb2.State(
        qpos=list(np.ravel(qpos)) if qpos is not None else [],
        qvel=list(np.ravel(qvel)) if qvel is not None else [],
        act=list(np.ravel(act)) if act is not None else [],
        time=time or 0.0,
        mocap_pos=list(np.ravel(mocap_pos)) if mocap_pos is not None else [],
        mocap_quat=(list(np.ravel(mocap_quat))
                    if mocap_quat is not None else []),
        ctrl=list(np.ravel(ctrl)) if ctrl is not None else [])
    self.stub.SetState(agent_pb2.SetStateRequest(state=state))

  def get_state(self):
    return self.stub.GetState(agent_pb2.GetStateRequest()).state

  def planner_step(self):
    r = self.stub.PlannerStep(agent_pb2.PlannerStepRequest())
    return {'best_return': r.best_return, 'improvement': r.improvement}

  def best_trajectory(self):
    r = self.stub.GetBestTrajectory(agent_pb2.GetBestTrajectoryRequest())
    return {'states': np.asarray(r.states).reshape(r.horizon, r.nstate),
            'actions': np.asarray(r.actions).reshape(r.horizon, r.naction),
            'costs': np.asarray(r.costs)}

  def set_mocap(self, pos=None, quat=None):
    self.stub.SetMocap(agent_pb2.SetMocapRequest(
        pos=list(np.ravel(pos)) if pos is not None else [],
        quat=list(np.ravel(quat)) if quat is not None else []))

  def get_action(self, time: Optional[float] = None,
                 averaging_duration: float = 0.0,
                 nominal_action: bool = False) -> np.ndarray:
    req = agent_pb2.GetActionRequest(
        time=time or 0.0, use_current_time=time is None,
        averaging_duration=averaging_duration,
        nominal_action=nominal_action)
    return np.asarray(self.stub.GetAction(req).action)

  def step(self, use_previous_policy: bool = False):
    return self.stub.Step(agent_pb2.StepRequest(
        use_previous_policy=use_previous_policy)).state

  def reset(self):
    self.stub.Reset(agent_pb2.ResetRequest())

  def set_task_parameters(self, parameters: Dict[str, float]):
    self.stub.SetTaskParameters(
        agent_pb2.SetTaskParametersRequest(parameters=parameters))

  def get_task_parameters(self) -> Dict[str, float]:
    return dict(self.stub.GetTaskParameters(
        agent_pb2.GetTaskParametersRequest()).parameters)

  def set_cost_weights(self, weights: Dict[str, float]):
    self.stub.SetCostWeights(
        agent_pb2.SetCostWeightsRequest(cost_weights=weights))

  def get_cost_term_values(self) -> Dict[str, float]:
    r = self.stub.GetCostValuesAndWeights(
        agent_pb2.GetCostValuesAndWeightsRequest())
    return {k: v.value for k, v in r.values_weights.items()}

  def get_cost_weights(self) -> Dict[str, float]:
    """Current per-term cost weights (reference agent.py:339)."""
    r = self.stub.GetCostValuesAndWeights(
        agent_pb2.GetCostValuesAndWeightsRequest())
    return {k: v.weight for k, v in r.values_weights.items()}

  def set_task_parameter(self, name: str, value: float):
    """Single-parameter convenience (reference agent.py:288)."""
    self.set_task_parameters({name: value})

  def get_residuals(self) -> np.ndarray:
    return np.asarray(self.stub.GetResiduals(
        agent_pb2.GetResidualsRequest()).residuals)

  def get_total_cost(self) -> float:
    return self.stub.GetTotalCost(
        agent_pb2.GetTotalCostRequest()).total_cost

  def get_task_list(self) -> Sequence[str]:
    return list(self.stub.GetTaskList(
        agent_pb2.GetTaskListRequest()).task_names)

  def set_mode(self, mode: int):
    self.stub.SetMode(agent_pb2.SetModeRequest(mode=mode))

  def get_mode(self) -> int:
    return self.stub.GetMode(agent_pb2.GetModeRequest()).mode

  def set_anything(self, qpos=None, qvel=None, time=None, parameters=None,
                   cost_weights=None, mode=None, mocap=None):
    """One-call state/parameter/weight/mode/mocap update (reference
    agent.proto SetAnything). `mocap` maps body name -> (pos, quat)."""
    req = agent_pb2.SetAnythingRequest()
    if qpos is not None or qvel is not None or time is not None:
      req.state.CopyFrom(agent_pb2.State(
          qpos=list(np.ravel(qpos)) if qpos is not None else [],
          qvel=list(np.ravel(qvel)) if qvel is not None else [],
          time=time or 0.0))
    for k, v in (parameters or {}).items():
      req.parameters[k] = float(v)
    for k, v in (cost_weights or {}).items():
      req.cost_weights[k] = float(v)
    if mode is not None:
      req.mode = str(mode)
    for name, (pos, quat) in (mocap or {}).items():
      req.mocap[name].CopyFrom(agent_pb2.Pose(
          pos=list(np.ravel(pos)) if pos is not None else [],
          quat=list(np.ravel(quat)) if quat is not None else []))
    self.stub.SetAnything(req)

  def apply_parameters(self, params: MjpcParameters):
    """Apply an MjpcParameters bundle (reference Agent usage pattern)."""
    if params.mode is not None:
      self.set_mode(params.mode)
    if params.task_parameters:
      self.set_task_parameters(params.task_parameters)
    if params.cost_weights:
      self.set_cost_weights(params.cost_weights)
    if params.mocap_pos is not None or params.mocap_quat is not None:
      self.set_mocap(pos=params.mocap_pos, quat=params.mocap_quat)


class Filter(_BaseClient):
  """Filter client (reference: python/mujoco_mpc/filter.py:52-249)."""
  _SERVICES = 'filter'

  def __init__(self, task_id: str, estimator_id: int = 1,
               address: Optional[str] = None):
    super().__init__(address)
    self.stub = ClientStub(self.channel, filter_service.SERVICE_NAME,
                           filter_service.METHODS)
    self.stub.Init(filter_pb2.FilterInitRequest(
        task_id=task_id, estimator_id=estimator_id))

  def update(self, ctrl, sensor):
    self.stub.Update(filter_pb2.FilterUpdateRequest(
        ctrl=list(np.ravel(ctrl)), sensor=list(np.ravel(sensor))))

  def state(self):
    r = self.stub.State(filter_pb2.FilterStateRequest())
    return {'qpos': np.asarray(r.qpos), 'qvel': np.asarray(r.qvel),
            'act': np.asarray(r.act), 'time': r.time}

  def covariance(self) -> np.ndarray:
    r = self.stub.Covariance(filter_pb2.FilterCovarianceRequest())
    return np.asarray(r.covariance).reshape(r.dimension, r.dimension)

  def noise(self, process=None, sensor=None):
    r = self.stub.Noise(filter_pb2.FilterNoiseRequest(
        process=list(np.ravel(process)) if process is not None else [],
        sensor=list(np.ravel(sensor)) if sensor is not None else []))
    return {'process': np.asarray(r.process), 'sensor': np.asarray(r.sensor)}

  def reset(self):
    self.stub.Reset(filter_pb2.FilterResetRequest())


class Direct(_BaseClient):
  """Direct client (reference: python/mujoco_mpc/direct.py:52-493)."""
  _SERVICES = 'direct'

  def __init__(self, task_id: str, configuration_length: int,
               address: Optional[str] = None):
    super().__init__(address)
    self.stub = ClientStub(self.channel, direct_service.SERVICE_NAME,
                           direct_service.METHODS)
    self.stub.Init(direct_pb2.DirectInitRequest(
        task_id=task_id, configuration_length=configuration_length))

  def data(self, index, configuration=None, sensor_measurement=None,
           force_measurement=None, time=None):
    r = self.stub.Data(direct_pb2.DirectDataRequest(
        index=index,
        configuration=(list(np.ravel(configuration))
                       if configuration is not None else []),
        sensor_measurement=(list(np.ravel(sensor_measurement))
                            if sensor_measurement is not None else []),
        force_measurement=(list(np.ravel(force_measurement))
                           if force_measurement is not None else []),
        time=[time] if time is not None else []))
    return {'configuration': np.asarray(r.configuration),
            'sensor_measurement': np.asarray(r.sensor_measurement),
            'force_measurement': np.asarray(r.force_measurement),
            'time': r.time[0] if r.time else None}

  def settings(self, sensor_weight=None, force_weight=None,
               prior_weight=None, max_iterations=None):
    self.stub.Settings(direct_pb2.DirectSettingsRequest(
        sensor_weight=(list(np.ravel(sensor_weight))
                       if sensor_weight is not None else []),
        force_weight=(list(np.ravel(force_weight))
                      if force_weight is not None else []),
        prior_weight=prior_weight or 0.0,
        max_iterations=max_iterations or 0))

  def cost(self) -> float:
    return self.stub.Cost(direct_pb2.DirectCostRequest()).total

  def optimize(self):
    r = self.stub.Optimize(direct_pb2.DirectOptimizeRequest())
    return {'final_cost': r.final_cost,
            'cost_trace': np.asarray(r.cost_trace)}

  def status(self):
    r = self.stub.Status(direct_pb2.DirectStatusRequest())
    return {'configuration_length': r.configuration_length,
            'initialized': r.initialized}

  def noise(self, process=None, sensor=None):
    """Get/set process+sensor noise variances (reference direct.proto
    Noise; weights are reciprocals server-side)."""
    r = self.stub.Noise(direct_pb2.DirectNoiseRequest(
        process=list(np.ravel(process)) if process is not None else [],
        sensor=list(np.ravel(sensor)) if sensor is not None else []))
    return {'process': np.asarray(r.process), 'sensor': np.asarray(r.sensor)}

  def reset(self):
    self.stub.Reset(direct_pb2.DirectResetRequest())

  def sensor_info(self):
    r = self.stub.SensorInfo(direct_pb2.DirectSensorInfoRequest())
    return {'dim': np.asarray(r.dim), 'adr': np.asarray(r.adr),
            'name': list(r.name)}
