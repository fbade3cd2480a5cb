"""Inverse dynamics: applied force from (qpos, qvel, qacc).

Equivalent of mj_inverse for the smooth pipeline, used by the Direct
optimizer the same way the reference calls mj_inverse per window step
(/root/reference/mjpc/direct/direct.cc:1481,1562). Golden-tested against
mujoco in tests/test_direct.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import fluid as fluid_mod
from mujoco_mpc_tpu.physics import kinematics as kin
from mujoco_mpc_tpu.physics import smooth
from mujoco_mpc_tpu.physics.model import Data, Model


def inverse(m: Model, d: Data) -> Data:
  """Compute qfrc_inverse = M qacc + bias - passive for given qpos/qvel/qacc.

  Also leaves kinematic quantities and sensors-ready fields in Data.
  """
  d = kin.kinematics(m, d)
  d = kin.com_pos(m, d)
  d = smooth.transmission(m, d)
  d = kin.com_vel(m, d)
  d = smooth.rne(m, d)
  d = smooth.passive(m, d)
  d = fluid_mod.fluid(m, d)
  d = smooth.crb(m, d)
  qfrc_inverse = d.qM @ d.qacc + d.qfrc_bias - d.qfrc_passive
  return d.replace(qfrc_actuator=jnp.zeros_like(qfrc_inverse),
                   qfrc_smooth=qfrc_inverse)
