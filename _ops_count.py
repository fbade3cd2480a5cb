import jax, jax.numpy as jnp
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics.model import make_data
from mujoco_mpc_tpu.tasks import registry
spec = registry.get_task('Swimmer')
m = spec.model
d0 = make_data(m)
print('solver iterations cap:', m.solver_iterations if hasattr(m, 'solver_iterations') else '?')
def step(d):
  df = fwd.forward(m, d)
  res = spec.residual_fn(m, df, spec.default_params.residual_params)
  return fwd.integrate(m, df), res
lowered = jax.jit(step).lower(d0)
txt = lowered.as_text()
import re
from collections import Counter
ops = Counter(re.findall(r'= "?([a-z_]+\.[a-z_]+)', txt))
print('total op instances:', sum(ops.values()))
for k, v in ops.most_common(12):
  print(f'  {k}: {v}')
