"""Checkpoint / resume for agent state (policy, task params, sim state).

The reference has no checkpointing — "reset" reloads the model and home
keyframe (mjpc/app.cc:234-241). This is a new capability of the TPU build
(SURVEY.md section 5.4): save/restore the full control-loop state so a
long-running controller can resume after preemption.

Format: a single .npz with flattened pytree leaves; the treedef is
reconstructed from a reference pytree of the same structure, so no pickling
is required.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
  leaves, treedef = jax.tree_util.tree_flatten(tree)
  return leaves, treedef


def save_pytree(path: str, tree: Any):
  """Save a pytree of arrays to `path` (.npz)."""
  leaves, _ = _flatten(tree)
  arrays = {f'leaf_{i}': np.asarray(x) for i, x in enumerate(leaves)}
  tmp = path + '.tmp'
  with open(tmp, 'wb') as f:
    np.savez(f, **arrays)
  os.replace(tmp, path)  # atomic: no torn checkpoints on preemption


def load_pytree(path: str, like: Any) -> Any:
  """Load a pytree saved by save_pytree; `like` supplies the structure."""
  leaves, treedef = _flatten(like)
  with np.load(path) as data:
    n = len([k for k in data.files if k.startswith('leaf_')])
    if n != len(leaves):
      raise ValueError(f'checkpoint has {n} leaves, expected {len(leaves)}')
    new_leaves = []
    for i, ref in enumerate(leaves):
      arr = data[f'leaf_{i}']
      if hasattr(ref, 'dtype'):
        arr = arr.astype(np.asarray(ref).dtype)
      new_leaves.append(arr)
  return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_agent(path: str, agent) -> None:
  """Checkpoint an Agent's mutable state (policy + params + sim data)."""
  save_pytree(path, {
      'policy': agent.policy,
      'params': agent.params,
      'sim_data': agent.sim_data,
      'key': jax.random.key_data(agent.key),
      'host_time': np.asarray(agent._host_time),
  })


def load_agent(path: str, agent) -> None:
  """Restore state saved by save_agent into an Agent built from the same
  task/planner configuration."""
  like = {
      'policy': agent.policy,
      'params': agent.params,
      'sim_data': agent.sim_data,
      'key': jax.random.key_data(agent.key),
      'host_time': np.asarray(agent._host_time),
  }
  state = load_pytree(path, like)
  agent.policy = state['policy']
  agent.params = state['params']
  agent.sim_data = state['sim_data']
  agent.key = jax.random.wrap_key_data(state['key'])
  agent._host_time = float(state['host_time'])
  if agent._native_policy is not None and hasattr(agent.policy, 'times'):
    agent._native_policy.set_plan(np.asarray(agent.policy.times),
                                  np.asarray(agent.policy.values))
