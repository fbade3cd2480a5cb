import os, time, json
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', os.path.expanduser('~/.jax_cache'))
import jax
from mujoco_mpc_tpu import agent as agent_mod
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.planners import registry as planners
from mujoco_mpc_tpu.tasks import registry
for task in ['Swimmer', 'Particle']:
  spec = registry.get_task(task)
  t_steps = agent_mod.horizon_steps(spec)
  d0 = make_data(spec.model)
  pdef = planners.make_planner(spec, planners.ILQG, 8, t_steps, 10)
  state = pdef.init()
  params = spec.default_params
  opt = jax.jit(lambda s, k: pdef.optimize(s, d0, params, k))
  k = jax.random.key(0)
  r = opt(state, k); jax.block_until_ready(r)
  lat = []
  for _ in range(10):
    t0 = time.perf_counter(); r = opt(state, k); jax.block_until_ready(r)
    lat.append(time.perf_counter() - t0)
  lat.sort()
  print(json.dumps({task: round(lat[len(lat)//2]*1e3, 1), 'T': t_steps}))
