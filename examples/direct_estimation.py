"""Offline estimation with the Direct optimizer + model-parameter recovery
(the analog of the reference's direct optimizer demos).

Simulates a damped pendulum with perturbed damping, then jointly recovers
the configuration trajectory and the damping scale from noisy sensors.

  python examples/direct_estimation.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

# the optimizer runs in float64 on host (estimation is offline; the TPU
# planners are the f32 path) — enable x64 before any array is created
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from mujoco_mpc_tpu.estimators import direct
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import sensors as sensors_mod
from mujoco_mpc_tpu.physics.model import load_model, make_data

XML = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.35"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0 0 -0.5" mass="1"/>
      <site name="tip" pos="0 0 -0.5"/>
    </body>
  </worldbody>
  <sensor>
    <jointpos name="angle" joint="hinge"/>
    <framepos name="tip_pos" objtype="site" objname="tip"/>
  </sensor>
</mujoco>
"""

TRUE_DAMPING_SCALE = 1.6


def main():
  m, _ = load_model(xml_string=XML, dtype=jnp.float64)
  T = 20

  # ground truth rollout with scaled damping
  m_true = m.replace(dof_damping=m.dof_damping * TRUE_DAMPING_SCALE)
  d = make_data(m_true, dtype=jnp.float64).replace(
      qpos=jnp.asarray([0.9], dtype=jnp.float64))
  qs, ss = [], []
  for _ in range(T):
    df = fwd.forward(m_true, d)
    qs.append(np.array(df.qpos))
    ss.append(np.array(sensors_mod.sensordata(m_true, df)))
    d = fwd.step(m_true, d)

  p = direct.make_problem(m, make_data(m, dtype=jnp.float64), horizon=T)
  data = direct.DirectData(
      qpos_ref=jnp.asarray(np.stack(qs)),
      sensor_meas=jnp.asarray(np.stack(ss)),
      force_meas=jnp.zeros((T, m.nv), dtype=jnp.float64),
      times=jnp.arange(T, dtype=jnp.float64) * 0.01)
  settings = direct.default_settings(p, dtype=jnp.float64).replace(
      max_iterations=40)

  pmodel = direct.damping_parameter_model(m.nv)
  z, theta, info = direct.optimize_joint(
      p, data, settings, pmodel, jnp.zeros(1, dtype=jnp.float64))

  recovered = float(jnp.exp(theta[0]))
  print(f'true damping scale:      {TRUE_DAMPING_SCALE}')
  print(f'recovered damping scale: {recovered:.3f}')
  print(f'final cost: {float(info["final_cost"]):.2e}')
  # the FD-velocity model vs the simulator's integrator is an inherent
  # discretization mismatch; 15% is the tested recovery tolerance
  np.testing.assert_allclose(recovered, TRUE_DAMPING_SCALE, rtol=0.15)


if __name__ == '__main__':
  main()
