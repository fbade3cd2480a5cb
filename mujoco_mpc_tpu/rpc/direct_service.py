"""Direct optimizer gRPC service — analog of the reference direct_service."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.rpc import direct_pb2 as pb
from mujoco_mpc_tpu.rpc import service

SERVICE_NAME = 'mujoco_mpc_tpu.Direct'

METHODS = {
    'Init': (pb.DirectInitRequest, pb.DirectInitResponse),
    'Data': (pb.DirectDataRequest, pb.DirectDataResponse),
    'Settings': (pb.DirectSettingsRequest, pb.DirectSettingsResponse),
    'Cost': (pb.DirectCostRequest, pb.DirectCostResponse),
    'Optimize': (pb.DirectOptimizeRequest, pb.DirectOptimizeResponse),
    'Status': (pb.DirectStatusRequest, pb.DirectStatusResponse),
    'Noise': (pb.DirectNoiseRequest, pb.DirectNoiseResponse),
    'Reset': (pb.DirectResetRequest, pb.DirectResetResponse),
    'SensorInfo': (pb.DirectSensorInfoRequest, pb.DirectSensorInfoResponse),
}


class DirectService:

  def __init__(self):
    self.problem = None

  def Init(self, request, context=None):
    from mujoco_mpc_tpu.estimators import direct as direct_mod
    from mujoco_mpc_tpu.physics.model import make_data
    from mujoco_mpc_tpu.tasks import registry

    spec = registry.get_task(request.task_id)
    self.mjm = spec.mj_model
    model = spec.model
    dtype = model.qpos0.dtype
    template = make_data(model, dtype=dtype)
    t = request.configuration_length
    self.direct_mod = direct_mod
    self.problem = direct_mod.make_problem(model, template, t)
    self.settings = direct_mod.default_settings(self.problem, dtype=dtype)
    self.qpos = np.tile(np.asarray(model.qpos0), (t, 1))
    self.sensor = np.zeros((t, self.problem.sensor_dim))
    self.force = np.zeros((t, model.nv))
    self.times = np.arange(t) * float(np.asarray(model.opt.timestep))
    self.z = jnp.zeros(t * model.nv, dtype=dtype)
    self.noise_process = np.ones(model.nv)
    self.noise_sensor = np.ones(self.problem.sensor_dim)
    return pb.DirectInitResponse()

  def Data(self, request, context=None):
    i = request.index
    if request.configuration:
      self.qpos[i] = np.asarray(request.configuration)
    if request.sensor_measurement:
      self.sensor[i] = np.asarray(request.sensor_measurement)
    if request.force_measurement:
      self.force[i] = np.asarray(request.force_measurement)
    if request.time:
      self.times[i] = request.time[0]
    return pb.DirectDataResponse(
        configuration=self.qpos[i].tolist(),
        sensor_measurement=self.sensor[i].tolist(),
        force_measurement=self.force[i].tolist(),
        time=[self.times[i]])

  def Settings(self, request, context=None):
    kw = {}
    dtype = self.problem.model.qpos0.dtype
    if request.sensor_weight:
      kw['sensor_weight'] = jnp.asarray(np.asarray(request.sensor_weight),
                                        dtype=dtype)
    if request.force_weight:
      kw['force_weight'] = jnp.asarray(np.asarray(request.force_weight),
                                       dtype=dtype)
    if request.prior_weight:
      kw['prior_weight'] = jnp.asarray(request.prior_weight, dtype=dtype)
    if request.max_iterations:
      kw['max_iterations'] = request.max_iterations
    self.settings = self.settings.replace(**kw)
    return pb.DirectSettingsResponse()

  def _data(self):
    dtype = self.problem.model.qpos0.dtype
    return self.direct_mod.DirectData(
        qpos_ref=jnp.asarray(self.qpos, dtype=dtype),
        sensor_meas=jnp.asarray(self.sensor, dtype=dtype),
        force_meas=jnp.asarray(self.force, dtype=dtype),
        times=jnp.asarray(self.times, dtype=dtype))

  def Cost(self, request, context=None):
    c = self.direct_mod.cost(self.problem, self._data(), self.z,
                             self.settings)
    return pb.DirectCostResponse(total=float(c))

  def Optimize(self, request, context=None):
    z, info = self.direct_mod.optimize(self.problem, self._data(),
                                       self.settings)
    self.z = z
    self.qpos = np.asarray(info['qpos'])
    return pb.DirectOptimizeResponse(
        final_cost=float(info['final_cost']),
        cost_trace=np.asarray(info['cost_trace']).tolist())

  def Noise(self, request, context=None):
    """Process/sensor noise variances; weights are their reciprocals
    (reference: direct.proto Noise / direct.cc noise -> weight)."""
    dtype = self.problem.model.qpos0.dtype
    kw = {}
    if request.process:
      self.noise_process = np.asarray(request.process)
      kw['force_weight'] = jnp.asarray(
          1.0 / np.maximum(self.noise_process, 1e-12), dtype=dtype)
    if request.sensor:
      self.noise_sensor = np.asarray(request.sensor)
      kw['sensor_weight'] = jnp.asarray(
          1.0 / np.maximum(self.noise_sensor, 1e-12), dtype=dtype)
    if kw:
      self.settings = self.settings.replace(**kw)
    return pb.DirectNoiseResponse(process=self.noise_process.tolist(),
                                  sensor=self.noise_sensor.tolist())

  def Reset(self, request, context=None):
    """Clear measurements and the decision variable, keep settings."""
    model = self.problem.model
    t = self.problem.horizon
    self.qpos = np.tile(np.asarray(model.qpos0), (t, 1))
    self.sensor = np.zeros((t, self.problem.sensor_dim))
    self.force = np.zeros((t, model.nv))
    self.times = np.arange(t) * float(np.asarray(model.opt.timestep))
    self.z = jnp.zeros(t * model.nv, dtype=model.qpos0.dtype)
    return pb.DirectResetResponse()

  def SensorInfo(self, request, context=None):
    import mujoco
    mjm = self.mjm
    names = []
    for sid in range(mjm.nsensor):
      names.append(mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_SENSOR, sid)
                   or f'sensor{sid}')
    return pb.DirectSensorInfoResponse(
        dim=[int(x) for x in mjm.sensor_dim],
        adr=[int(x) for x in mjm.sensor_adr],
        name=names)

  def Status(self, request, context=None):
    return pb.DirectStatusResponse(
        configuration_length=(self.problem.horizon if self.problem else 0),
        initialized=self.problem is not None)


def handlers(impl: DirectService):
  return service.make_handlers(SERVICE_NAME, METHODS, impl)
