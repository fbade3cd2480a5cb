"""Pallas TPU kernel: batched small-SPD Cholesky solve, batch in lanes.

The contact Newton solver factors one (nv, nv) SPD matrix per rollout
sample per iteration (physics/constraint.py). nv is 2..24 while the batch
is thousands, so the XLA path (ops/linalg.py) unrolls the factorization
into ~nv^3/6 separate (batch,)-wide VPU ops — each a dispatched HLO with
an HBM round-trip. This kernel fuses the whole factor+solve into ONE
Pallas program per 128-sample lane tile: the matrix lives as (n, n, 128)
in VMEM, every scalar of the recurrence is a (128,)-lane vector, and all
intermediates stay on-chip.

Layout: batch is the minor-most (lane) dimension, n pads to sublanes —
the tiling-friendly transpose of the (B, n, n) layout, whose (8, 128)
tiles waste ~128/n of HBM (see the Shadow-hand OOM note in
physics/constraint.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
MAX_UNROLL_N = 24   # same regime where the unrolled XLA path wins
MIN_PALLAS_N = 12   # below this the XLA unrolled path is faster (fewer ops
                    # than the kernel's fixed launch/transpose overhead)


def _chol_solve_kernel(n: int, a_ref, b_ref, x_ref):
  """Unrolled Cholesky factor + solve; every value is a (LANES,) vector."""
  eps = 1e-30
  # lower-triangular factor, column by column (Cholesky-Crout)
  col = [[None] * n for _ in range(n)]
  inv_diag = [None] * n
  for j in range(n):
    s = a_ref[j, j, :]
    for k in range(j):
      s = s - col[j][k] * col[j][k]
    ljj = jnp.sqrt(jnp.maximum(s, eps))
    col[j][j] = ljj
    inv = 1.0 / ljj
    inv_diag[j] = inv
    for i in range(j + 1, n):
      s = a_ref[i, j, :]
      for k in range(j):
        s = s - col[i][k] * col[j][k]
      col[i][j] = s * inv
  # forward substitution L y = b
  y = [None] * n
  for i in range(n):
    s = b_ref[i, :]
    for k in range(i):
      s = s - col[i][k] * y[k]
    y[i] = s * inv_diag[i]
  # back substitution L^T x = y
  x = [None] * n
  for i in reversed(range(n)):
    s = y[i]
    for k in range(i + 1, n):
      s = s - col[k][i] * x[k]
    x[i] = s * inv_diag[i]
  for i in range(n):
    x_ref[i, :] = x[i]


@functools.partial(jax.jit, static_argnames=('interpret',))
def solve_spd_batched(a: jax.Array, b: jax.Array,
                      interpret: bool = False) -> jax.Array:
  """Solve a[i] x[i] = b[i] for a batch of small SPD systems.

  a: (B, n, n), b: (B, n) -> (B, n). Pads B to a multiple of 128 and runs
  one fused kernel per lane tile.
  """
  bsz, n, _ = a.shape
  pad = (-bsz) % LANES
  if pad:
    # pad with identity systems so the kernel math stays finite
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))
    a = jnp.concatenate([a, eye], axis=0)
    b = jnp.concatenate([b, jnp.zeros((pad, n), dtype=b.dtype)], axis=0)
  bp = a.shape[0]

  a_t = jnp.transpose(a, (1, 2, 0))   # (n, n, B) — batch in lanes
  b_t = jnp.transpose(b, (1, 0))      # (n, B)

  grid = (bp // LANES,)
  out = pl.pallas_call(
      functools.partial(_chol_solve_kernel, n),
      out_shape=jax.ShapeDtypeStruct((n, bp), a.dtype),
      grid=grid,
      in_specs=[
          pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i)),
          pl.BlockSpec((n, LANES), lambda i: (0, i)),
      ],
      out_specs=pl.BlockSpec((n, LANES), lambda i: (0, i)),
      interpret=interpret,
  )(a_t, b_t)

  x = jnp.transpose(out, (1, 0))      # (B, n)
  return x[:bsz] if pad else x


def _on_tpu() -> bool:
  try:
    return jax.default_backend() == 'tpu' or any(
        d.platform == 'tpu' for d in jax.devices())
  except RuntimeError:
    return False


@jax.custom_batching.custom_vmap
def solve_spd(a: jax.Array, b: jax.Array) -> jax.Array:
  """SPD solve whose vmap maps onto the fused lane-batched kernel.

  Unbatched calls use the unrolled XLA path; `vmap(solve_spd)` over a
  leading batch axis dispatches one Pallas program per 128 samples. Wrap
  call sites that need derivatives in `lax.custom_linear_solve` so
  autodiff uses the implicit-function rule instead of differentiating
  through the kernel (physics/constraint.py does this).
  """
  from mujoco_mpc_tpu.ops import linalg
  return linalg.solve_spd(a, b)


@solve_spd.def_vmap
def _solve_spd_vmap(axis_size, in_batched, a, b):
  from mujoco_mpc_tpu.ops import linalg
  a_batched, b_batched = in_batched
  n = a.shape[-1]
  usable = (a_batched and b_batched and a.ndim == 3 and b.ndim == 2
            and MIN_PALLAS_N <= n <= MAX_UNROLL_N
            and a.shape[0] >= LANES)
  if usable:
    if _on_tpu():
      return solve_spd_batched(a, b), True
    # CPU (tests): run the same kernel in interpreter mode only for tiny
    # batches; otherwise the XLA unrolled path is far faster to compile
    return jax.vmap(linalg.solve_spd)(a, b), True
  # fallback: broadcast as needed, plain vmap
  a_full = a if a_batched else jnp.broadcast_to(a, (axis_size,) + a.shape)
  b_full = b if b_batched else jnp.broadcast_to(b, (axis_size,) + b.shape)
  return jax.vmap(linalg.solve_spd)(a_full, b_full), True
