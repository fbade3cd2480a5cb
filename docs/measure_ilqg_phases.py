import os, time, json
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', os.path.expanduser('~/.jax_cache'))
import jax, jax.numpy as jnp
from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import derivatives, ilqg
from mujoco_mpc_tpu.tasks import registry

spec = registry.get_task('Swimmer')
t_steps = agent_mod.horizon_steps(spec)
m = spec.model
d0 = make_data(m)
params = spec.default_params
cfg = ilqg.default_config(spec)
state = ilqg.default_state(spec, t_steps)
dtype = d0.qpos.dtype
print('T', t_steps, 'nv', m.nv, 'nu', m.nu, 'nq', m.nq)

def timeit(name, fn, *args):
  f = jax.jit(fn)
  r = f(*args); jax.block_until_ready(r)
  lat = []
  for _ in range(6):
    t0 = time.perf_counter(); r = f(*args); jax.block_until_ready(r)
    lat.append(time.perf_counter()-t0)
  lat.sort()
  print(name, round(lat[len(lat)//2]*1e3,1), 'ms')
  return r

# nominal rollout
roll = timeit('nominal_rollout', lambda: ilqg._feedback_rollout(
    spec, d0, state.policy, jnp.zeros((), dtype), params, t_steps, True))
prev_ret, actions, qpos, qvel, act, times, residuals, costs = roll
traj = derivatives.Trajectory(qpos=qpos, qvel=qvel, act=act, time=times,
                              actions=actions, residuals=residuals, costs=costs)
derivs = timeit('derivatives', lambda: derivatives.compute(spec, d0, traj, params))
timeit('riccati', lambda: ilqg.riccati(derivs, state.regularization,
       traj.actions, m.actuator_ctrlrange, cfg.regularization_type, True))
steps8 = jnp.linspace(1.0, 0.0, 8, dtype=dtype)
timeit('linesearch8', lambda: jax.vmap(lambda s: ilqg._feedback_rollout(
    spec, d0, state.policy, s, params, t_steps)[0])(steps8))
