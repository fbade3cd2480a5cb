"""Inertia-box fluid model (viscosity + quadratic drag + wind).

Equivalent of MuJoCo's per-body fluid forces used by the reference's Swimmer
task (tasks/swimmer/swimmer.xml.patch sets density=1000). Each body is
approximated by its equivalent inertia box; viscous and quadratic drag are
computed in the inertial frame and mapped back to generalized forces.
Constants are validated against mj_step in tests/test_physics_golden.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.physics import smooth
from mujoco_mpc_tpu.physics.model import Data, Model

_PI = 3.141592653589793


def fluid(m: Model, d: Data) -> Data:
  """Add fluid drag forces to qfrc_passive (analog: mj_fluid inertia-box)."""
  if not m.has_fluid:
    return d

  qfrc = d.qfrc_passive
  density, viscosity, wind = m.opt.density, m.opt.viscosity, m.opt.wind

  for b in range(1, m.nbody):
    mass = m.body_mass[b]
    inertia = m.body_inertia[b]

    # equivalent inertia-box FULL side lengths (validated numerically
    # against mj_forward: drag uses full sides, not semi-axes)
    box0 = jnp.sqrt(jnp.maximum(1e-12,
                                inertia[1] + inertia[2] - inertia[0])
                    / mass * 6.0)
    box1 = jnp.sqrt(jnp.maximum(1e-12,
                                inertia[0] + inertia[2] - inertia[1])
                    / mass * 6.0)
    box2 = jnp.sqrt(jnp.maximum(1e-12,
                                inertia[0] + inertia[1] - inertia[2])
                    / mass * 6.0)
    box = jnp.stack([box0, box1, box2])

    # 6D velocity of body at xipos, in inertial (ximat) local frame
    croot = d.subtree_com[m.body_rootid[b]]
    ang_w = d.cvel[b, :3]
    lin_w = d.cvel[b, 3:] + jnp.cross(ang_w, d.xipos[b] - croot)
    rt = d.ximat[b].T
    lvel_ang = rt @ ang_w
    lvel_lin = rt @ (lin_w - wind)

    lfrc_ang = jnp.zeros(3, dtype=qfrc.dtype)
    lfrc_lin = jnp.zeros(3, dtype=qfrc.dtype)

    # viscous resistance (equivalent sphere)
    diam = (box[0] + box[1] + box[2]) / 3.0
    lfrc_ang = lfrc_ang - _PI * diam ** 3 * viscosity * lvel_ang
    lfrc_lin = lfrc_lin - 3.0 * _PI * diam * viscosity * lvel_lin

    # quadratic drag
    box_p1 = jnp.stack([box[1], box[2], box[0]])
    box_p2 = jnp.stack([box[2], box[0], box[1]])
    lfrc_lin = lfrc_lin - 0.5 * density * box_p1 * box_p2 * \
        jnp.abs(lvel_lin) * lvel_lin
    lfrc_ang = lfrc_ang - density * box * (box_p1 ** 4 + box_p2 ** 4) * \
        jnp.abs(lvel_ang) * lvel_ang / 64.0

    # map local wrench to world and apply at xipos
    torque_w = d.ximat[b] @ lfrc_ang
    force_w = d.ximat[b] @ lfrc_lin
    jacp, jacr = smooth._body_jac(m, d, b, d.xipos[b])
    qfrc = qfrc + jacp @ force_w + jacr @ torque_w

  return d.replace(qfrc_passive=qfrc)
