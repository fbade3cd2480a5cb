"""Filter (estimator) gRPC service — analog of the reference filter_service."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mujoco_mpc_tpu.rpc import filter_pb2 as pb
from mujoco_mpc_tpu.rpc import service

SERVICE_NAME = 'mujoco_mpc_tpu.Filter'

METHODS = {
    'Init': (pb.FilterInitRequest, pb.FilterInitResponse),
    'Reset': (pb.FilterResetRequest, pb.FilterResetResponse),
    'Update': (pb.FilterUpdateRequest, pb.FilterUpdateResponse),
    'State': (pb.FilterStateRequest, pb.FilterStateResponse),
    'Covariance': (pb.FilterCovarianceRequest, pb.FilterCovarianceResponse),
    'Noise': (pb.FilterNoiseRequest, pb.FilterNoiseResponse),
}

GROUND_TRUTH, KALMAN, UNSCENTED = 0, 1, 2


class FilterService:

  def __init__(self):
    self.state = None
    self.estimator_id = KALMAN

  def Init(self, request, context=None):
    import functools
    import jax
    from mujoco_mpc_tpu.estimators import base, kalman, unscented
    from mujoco_mpc_tpu.physics.model import make_data
    from mujoco_mpc_tpu.tasks import registry

    spec = registry.get_task(request.task_id)
    self.spec = spec
    self.model = spec.model
    self.template = make_data(self.model, dtype=self.model.qpos0.dtype)
    self.estimator_id = request.estimator_id
    self.state = base.init_state(self.model,
                                 dtype=self.model.qpos0.dtype)
    if self.estimator_id == KALMAN:
      fn = kalman.update
    elif self.estimator_id == UNSCENTED:
      fn = unscented.update
    else:
      fn = lambda m, t, s, c, y: base.ground_truth_update(m, t, s, c, y)
    self._update = jax.jit(functools.partial(fn, self.model, self.template))
    return pb.FilterInitResponse()

  def Reset(self, request, context=None):
    from mujoco_mpc_tpu.estimators import base
    self.state = base.init_state(self.model, dtype=self.model.qpos0.dtype)
    return pb.FilterResetResponse()

  def Update(self, request, context=None):
    ctrl = jnp.asarray(np.asarray(request.ctrl),
                       dtype=self.model.qpos0.dtype)
    sensor = jnp.asarray(np.asarray(request.sensor),
                         dtype=self.model.qpos0.dtype)
    self.state = self._update(self.state, ctrl, sensor)
    return pb.FilterUpdateResponse()

  def State(self, request, context=None):
    s = self.state
    return pb.FilterStateResponse(
        qpos=np.asarray(s.qpos).tolist(), qvel=np.asarray(s.qvel).tolist(),
        act=np.asarray(s.act).tolist(), time=float(s.time))

  def Covariance(self, request, context=None):
    cov = np.asarray(self.state.covariance)
    return pb.FilterCovarianceResponse(
        covariance=cov.reshape(-1).tolist(), dimension=cov.shape[0])

  def Noise(self, request, context=None):
    if request.process:
      self.state = self.state.replace(
          noise_process=jnp.asarray(np.asarray(request.process),
                                    dtype=self.model.qpos0.dtype))
    if request.sensor:
      self.state = self.state.replace(
          noise_sensor=jnp.asarray(np.asarray(request.sensor),
                                   dtype=self.model.qpos0.dtype))
    return pb.FilterNoiseResponse(
        process=np.asarray(self.state.noise_process).tolist(),
        sensor=np.asarray(self.state.noise_sensor).tolist())


def handlers(impl: FilterService):
  return service.make_handlers(SERVICE_NAME, METHODS, impl)
