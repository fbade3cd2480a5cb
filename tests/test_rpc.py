"""gRPC layer tests: in-process service calls (reference pattern:
grpc/agent_service_test.cc instantiates the service directly) plus one
end-to-end subprocess client test."""

import numpy as np
import pytest

from mujoco_mpc_tpu.rpc import agent_pb2, direct_pb2, filter_pb2
from mujoco_mpc_tpu.rpc.agent_service import AgentService
from mujoco_mpc_tpu.rpc.direct_service import DirectService
from mujoco_mpc_tpu.rpc.filter_service import FilterService


def test_agent_service_inprocess():
  svc = AgentService()
  svc.Init(agent_pb2.InitRequest(task_id='Cartpole', planner_id=0,
                                 num_samples=15))
  svc.SetState(agent_pb2.SetStateRequest(state=agent_pb2.State(
      qpos=[0.5, 3.0], qvel=[0.0, 0.0])))
  # PlannerStep produces a nonzero action (reference:
  # agent_service_test.cc PlannerStep_ProducesNonzeroAction)
  r = svc.PlannerStep(agent_pb2.PlannerStepRequest())
  assert np.isfinite(r.best_return)
  a = svc.GetAction(agent_pb2.GetActionRequest(use_current_time=True))
  assert len(a.action) == 1
  s = svc.Step(agent_pb2.StepRequest())
  assert s.state.time > 0
  svc.SetCostWeights(agent_pb2.SetCostWeightsRequest(
      cost_weights={'Velocity': 0.33}))
  cw = svc.GetCostValuesAndWeights(
      agent_pb2.GetCostValuesAndWeightsRequest())
  assert abs(cw.values_weights['Velocity'].weight - 0.33) < 1e-6
  svc.SetTaskParameters(agent_pb2.SetTaskParametersRequest(
      parameters={'Goal': 0.25}))
  tp = svc.GetTaskParameters(agent_pb2.GetTaskParametersRequest())
  assert abs(tp.parameters['Goal'] - 0.25) < 1e-6
  res = svc.GetResiduals(agent_pb2.GetResidualsRequest())
  assert len(res.residuals) == 4
  tasks = svc.GetTaskList(agent_pb2.GetTaskListRequest())
  assert 'Cartpole' in tasks.task_names
  svc.Reset(agent_pb2.ResetRequest())
  st = svc.GetState(agent_pb2.GetStateRequest())
  assert st.state.time == 0.0


def test_filter_service_inprocess():
  svc = FilterService()
  svc.Init(filter_pb2.FilterInitRequest(task_id='Cartpole',
                                        estimator_id=1))
  ns = svc.Noise(filter_pb2.FilterNoiseRequest())
  assert len(ns.process) == 4   # ndx = 2*nv
  svc.Update(filter_pb2.FilterUpdateRequest(
      ctrl=[0.1], sensor=list(np.zeros(10))))
  st = svc.State(filter_pb2.FilterStateRequest())
  assert len(st.qpos) == 2
  cov = svc.Covariance(filter_pb2.FilterCovarianceRequest())
  assert cov.dimension == 4


def test_direct_service_inprocess():
  svc = DirectService()
  svc.Init(direct_pb2.DirectInitRequest(task_id='Cartpole',
                                        configuration_length=5))
  st = svc.Status(direct_pb2.DirectStatusRequest())
  assert st.configuration_length == 5 and st.initialized
  for i in range(5):
    svc.Data(direct_pb2.DirectDataRequest(
        index=i, configuration=[0.1 * i, 0.0],
        sensor_measurement=list(np.zeros(svc.problem.sensor_dim)),
        force_measurement=[0.0, 0.0], time=[0.01 * i]))
  c0 = svc.Cost(direct_pb2.DirectCostRequest()).total
  r = svc.Optimize(direct_pb2.DirectOptimizeRequest())
  assert r.final_cost <= c0 + 1e-9


@pytest.mark.slow
def test_end_to_end_client():
  from mujoco_mpc_tpu import clients
  with clients.Agent(task_id='ParticleFixed', num_samples=15) as agent:
    tasks = agent.get_task_list()
    assert 'ParticleFixed' in tasks
    agent.set_state(qpos=[0.0, 0.0], qvel=[0.0, 0.0])
    info = agent.planner_step()
    assert np.isfinite(info['best_return'])
    u = agent.get_action()
    assert u.shape == (2,)
    state = agent.step()
    assert state.time > 0
    cost = agent.get_total_cost()
    assert np.isfinite(cost)


def test_best_trajectory_and_mocap_rpcs():
  """GetBestTrajectory / SetMocap / action averaging (reference:
  agent.proto GetBestTrajectory, SetAnything mocap, GetAction averaging)."""
  from mujoco_mpc_tpu.rpc import agent_pb2, agent_service
  svc = agent_service.AgentService()
  svc.Init(agent_pb2.InitRequest(task_id='ParticleFixed', planner_id=-1,
                                 num_samples=8))
  svc.PlannerStep(agent_pb2.PlannerStepRequest())
  r = svc.GetBestTrajectory(agent_pb2.GetBestTrajectoryRequest())
  assert r.horizon > 0 and r.nstate > 0 and r.naction > 0
  assert len(r.states) == r.horizon * r.nstate
  assert len(r.actions) == r.horizon * r.naction
  import numpy as np
  assert np.all(np.isfinite(np.asarray(r.costs)))

  svc.SetMocap(agent_pb2.SetMocapRequest(pos=[0.1, 0.2, 0.0]))
  st = svc.GetState(agent_pb2.GetStateRequest()).state
  np.testing.assert_allclose(np.asarray(st.mocap_pos), [0.1, 0.2, 0.0])

  # averaging returns a different (smoothed) action than the instant query
  ua = svc.GetAction(agent_pb2.GetActionRequest(
      use_current_time=True, averaging_duration=0.5)).action
  assert len(ua) == r.naction


def test_mode_rpcs_and_parameter_bundle():
  """SetMode/GetMode map to the task's select_* parameter (reference:
  Agent::SetModeByName, agent.cc:421-448; modes are residual_select_
  dropdowns). Quadruped's mode selects the gait."""
  svc = AgentService()
  svc.Init(agent_pb2.InitRequest(task_id='Quadruped Flat', planner_id=0,
                                 num_samples=4))
  assert svc.GetMode(agent_pb2.GetModeRequest()).mode >= 0
  svc.SetMode(agent_pb2.SetModeRequest(mode=2))
  assert svc.GetMode(agent_pb2.GetModeRequest()).mode == 2

  # tasks without modes: mode is 0 and only 0 is settable
  svc2 = AgentService()
  svc2.Init(agent_pb2.InitRequest(task_id='Cartpole', planner_id=0,
                                  num_samples=4))
  assert svc2.GetMode(agent_pb2.GetModeRequest()).mode == 0
  svc2.SetMode(agent_pb2.SetModeRequest(mode=0))

  # MjpcParameters bundles the same fields as the reference dataclass
  from mujoco_mpc_tpu.clients import MjpcParameters
  p = MjpcParameters(mode=1, task_parameters={'Goal': 0.1},
                     cost_weights={'Velocity': 0.5})
  assert p.mode == 1 and p.mocap_pos is None


def test_set_anything_and_inline_model():
  """SetAnything one-call update + Init with an inline model XML
  (reference: agent.proto SetAnything / Init model field)."""
  svc = AgentService()
  import mujoco
  xml = mujoco.MjModel.from_xml_path(
      'mujoco_mpc_tpu/models/cartpole.xml') and open(
      'mujoco_mpc_tpu/models/cartpole.xml').read()
  svc.Init(agent_pb2.InitRequest(task_id='Cartpole', planner_id=0,
                                 num_samples=7,
                                 model=agent_pb2.MjModel(xml=xml)))
  req = agent_pb2.SetAnythingRequest(
      state=agent_pb2.State(qpos=[0.3, 2.0], qvel=[0.1, 0.0]))
  req.parameters['Goal'] = 0.5
  req.cost_weights['Velocity'] = 0.11
  svc.SetAnything(req)
  st = svc.GetState(agent_pb2.GetStateRequest())
  np.testing.assert_allclose(list(st.state.qpos), [0.3, 2.0])
  tp = svc.GetTaskParameters(agent_pb2.GetTaskParametersRequest())
  assert abs(tp.parameters['Goal'] - 0.5) < 1e-6
  cw = svc.GetCostValuesAndWeights(
      agent_pb2.GetCostValuesAndWeightsRequest())
  assert abs(cw.values_weights['Velocity'].weight - 0.11) < 1e-6


def test_direct_noise_reset_sensorinfo():
  """Direct Noise / Reset / SensorInfo parity tail
  (reference: direct.proto:29-37)."""
  svc = DirectService()
  svc.Init(direct_pb2.DirectInitRequest(task_id='Cartpole',
                                        configuration_length=3))
  info = svc.SensorInfo(direct_pb2.DirectSensorInfoRequest())
  assert len(info.dim) == len(info.name)
  ns = svc.Noise(direct_pb2.DirectNoiseRequest(process=[0.5, 0.5]))
  np.testing.assert_allclose(list(ns.process), [0.5, 0.5])
  svc.Data(direct_pb2.DirectDataRequest(
      index=1, configuration=[0.2, 0.1], time=[0.01]))
  svc.Reset(direct_pb2.DirectResetRequest())
  d = svc.Data(direct_pb2.DirectDataRequest(index=1))
  np.testing.assert_allclose(list(d.configuration), [0.0, 0.0], atol=1e-12)


def test_nominal_action_and_previous_policy():
  """GetAction(nominal_action) drops iLQG feedback terms; Step
  (use_previous_policy) acts from the pre-PlannerStep policy (reference
  agent.proto:108-111, 142-146)."""
  svc = AgentService()
  # Particle: controls stay interior, so boxQP leaves rows free and the
  # time-0 feedback gain is nonzero after one iteration (on a swing-up
  # first iteration the box saturates and K=0 rows are CORRECT)
  svc.Init(agent_pb2.InitRequest(task_id='ParticleFixed', planner_id=2,
                                 num_samples=4))
  svc.SetState(agent_pb2.SetStateRequest(state=agent_pb2.State(
      qpos=[0.05, -0.04], qvel=[0.0, 0.0])))
  svc.PlannerStep(agent_pb2.PlannerStepRequest())
  # move the state off the nominal so feedback terms are nonzero
  svc.SetState(agent_pb2.SetStateRequest(state=agent_pb2.State(
      qpos=[-0.06, 0.08], qvel=[0.2, -0.1])))
  fb = np.asarray(svc.GetAction(
      agent_pb2.GetActionRequest(use_current_time=True)).action)
  nom = np.asarray(svc.GetAction(agent_pb2.GetActionRequest(
      use_current_time=True, nominal_action=True)).action)
  assert not np.allclose(fb, nom)
  # previous policy: before any second PlannerStep, prev == initial
  # (zero) policy, so acting with it differs from the optimized one
  agent = svc.agent
  u_prev = np.asarray(agent.action(use_previous_policy=True))
  u_cur = np.asarray(agent.action())
  assert not np.allclose(u_prev, u_cur)
  svc.Step(agent_pb2.StepRequest(use_previous_policy=True))
