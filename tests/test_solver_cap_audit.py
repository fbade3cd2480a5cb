"""Accuracy audit of the per-task solver iteration caps.

Batched planning models bound the Newton constraint solve with a small
static cap (`<option iterations/>`, physics/constraint.py) so vmapped
rollouts don't run the while_loop to the worst sample's convergence.
This audit verifies, per contact-rich task config, that trajectories
under the capped solver stay close to fully-converged ones (cap 100 =
the MuJoCo default the reference's mj_step uses, trajectory.cc:158) —
the caps are a perf knob, not a physics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.tasks import registry

# (task, rollout steps, qpos tolerance): horizons match one planning
# window at the task's agent_timestep
AUDIT_CONFIGS = [
    ('Cartpole', 50, 1e-5),
    ('Walker', 40, 5e-3),
    ('Quadruped Flat', 40, 5e-3),
    ('Shadow Reorient', 30, 5e-3),
    ('Humanoid Stand', 40, 5e-3),
]


def _rollout(m, d0, steps, ctrl):
  step = jax.jit(fwd.step)
  d = d0
  qs = []
  for i in range(steps):
    d = step(m, d.replace(ctrl=ctrl[i]))
    qs.append(d.qpos)
  return np.stack([np.asarray(q, np.float64) for q in qs])


@pytest.mark.slow
@pytest.mark.parametrize('name,steps,tol', AUDIT_CONFIGS)
def test_capped_solver_tracks_converged_dynamics(name, steps, tol):
  spec = registry.get_task(name)
  m = spec.model
  assert m.opt.iterations <= 10, (
      f'{name} has no planning cap; audit is vacuous')
  d0 = make_data(m)
  if 'home' in m.keyframe_names:
    d0 = d0.replace(qpos=m.keyframe_qpos('home'))
  rng = np.random.default_rng(0)
  lo = np.asarray(m.actuator_ctrlrange[:, 0])
  hi = np.asarray(m.actuator_ctrlrange[:, 1])
  mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)
  ctrl = jnp.asarray(
      mid + 0.3 * half * rng.standard_normal((steps, m.nu)),
      dtype=d0.qpos.dtype)

  m_full = m.replace(opt=m.opt.replace(iterations=100))
  q_capped = _rollout(m, d0, steps, ctrl)
  q_full = _rollout(m_full, d0, steps, ctrl)

  err = np.abs(q_capped - q_full).max()
  scale = max(1.0, np.abs(q_full).max())
  assert err / scale < tol, (
      f'{name}: capped-solver divergence {err:.2e} (rel {err / scale:.2e}) '
      f'over {steps} steps exceeds {tol}')
