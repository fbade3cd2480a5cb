"""Fused whole-rollout kernel (ops/pallas_rollout.py) vs vmap(scan(step)).

Interpret mode on CPU: the kernel body is the same stage math as the XLA
path, so candidate returns must agree to f32 reduction tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_mpc_tpu.ops import pallas_rollout
from mujoco_mpc_tpu.planners import rollout
from mujoco_mpc_tpu.tasks import registry


@pytest.fixture
def force_interpret():
  pallas_rollout.FORCE_INTERPRET = True
  yield
  pallas_rollout.FORCE_INTERPRET = False


def _setup(name, b, t, seed=0):
  spec = registry.get_task(name)
  m = spec.model
  from mujoco_mpc_tpu.physics.model import make_data
  d0 = make_data(m)
  rng = np.random.default_rng(seed)
  d0 = d0.replace(
      qpos=jnp.asarray(m.qpos0 + 0.1 * rng.standard_normal(m.nq),
                       dtype=d0.qpos.dtype),
      qvel=jnp.asarray(0.2 * rng.standard_normal(m.nv),
                       dtype=d0.qpos.dtype))
  lo = np.asarray(m.actuator_ctrlrange[:, 0])
  hi = np.asarray(m.actuator_ctrlrange[:, 1])
  acts = jnp.asarray(
      lo + (hi - lo) * rng.random((b, t, m.nu)), dtype=d0.qpos.dtype)
  return spec, m, d0, acts


@pytest.mark.parametrize('name', ['Cartpole', 'ParticleFixed', 'Acrobot'])
def test_eligibility(name):
  spec = registry.get_task(name)
  assert pallas_rollout.eligible(spec.model), name


def test_contact_models_not_eligible():
  spec = registry.get_task('Walker')
  assert not pallas_rollout.eligible(spec.model)


@pytest.mark.parametrize('name', ['Cartpole', 'Acrobot'])
def test_fused_rollout_matches_scan(name, force_interpret):
  b, t = 128, 30
  spec, m, d0, acts = _setup(name, b, t)
  params = spec.default_params

  want = jax.vmap(
      lambda a: rollout.rollout_return(spec, d0, a, params))(acts)
  got = rollout.batched_returns(spec, d0, acts, params)
  assert got.shape == want.shape == (b,)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=1e-5)


def test_sublane_tile_layout_matches_lane_layout(force_interpret):
  """(S, 128) batch-tile layout vs the (128,) lane layout: identical
  step recurrence, so trajectories agree to f32 reduction noise."""
  b, t = 256, 20
  spec, m, d0, acts = _setup('Cartpole', b, t, seed=5)
  lane = pallas_rollout.rollout_states(
      m, d0, d0.qpos, d0.qvel, acts, interpret=True, sublanes=0)
  tile = pallas_rollout.rollout_states(
      m, d0, d0.qpos, d0.qvel, acts, interpret=True, sublanes=2)
  for a, c in zip(lane, tile):
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=2e-4, atol=1e-5)


def test_fused_rollout_limits_active(force_interpret):
  """ParticleFixed drives into its joint limits: the in-kernel fixed-cap
  limit Newton must track the XLA while_loop solve."""
  b, t = 128, 40
  spec, m, d0, acts = _setup('ParticleFixed', b, t, seed=3)
  # saturate controls toward one corner so limits engage
  acts = jnp.clip(acts * 4.0, m.actuator_ctrlrange[:, 0],
                  m.actuator_ctrlrange[:, 1])
  params = spec.default_params
  want = jax.vmap(
      lambda a: rollout.rollout_return(spec, d0, a, params))(acts)
  got = rollout.batched_returns(spec, d0, acts, params)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-3, atol=1e-4)


def test_fused_rollout_pads_odd_batches(force_interpret):
  b, t = 130, 10
  spec, m, d0, acts = _setup('Cartpole', b, t)
  params = spec.default_params
  want = jax.vmap(
      lambda a: rollout.rollout_return(spec, d0, a, params))(acts)
  got = rollout.batched_returns(spec, d0, acts, params)
  assert got.shape == (b,)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=1e-5)


def test_disabled_by_default():
  """Without the env flag / force hook the dispatch keeps the scan path
  (bitwise identical returns)."""
  b, t = 128, 10
  spec, m, d0, acts = _setup('Cartpole', b, t)
  params = spec.default_params
  want = jax.vmap(
      lambda a: rollout.rollout_return(spec, d0, a, params))(acts)
  got = rollout.batched_returns(spec, d0, acts, params)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
