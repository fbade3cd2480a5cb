"""iLQG planner: Riccati backward pass, boxQP control limits, feedback policy.

TPU-native re-design of the reference iLQGPlanner
(/root/reference/mjpc/planners/ilqg/{planner,backward_pass,policy}.cc,
boxqp.h). Structure:

  * backward Riccati recursion = reverse lax.scan over exact (A, B) Jacobians
    and Gauss-Newton cost expansions (planners/derivatives.py) — replacing
    the reference's per-knot mjd_transitionFD ThreadPool fanout;
  * control limits via a masked projected-Newton boxQP (the fixed-size,
    branch-free analog of mju_boxQP's active-set loop) that also produces
    feedback gains with clamped rows zeroed;
  * regularization: control / state-control / value / none schedules with
    escalation on backward-pass failure and surprise-based adaptation
    (backward_pass.cc:341-356);
  * line search = batched feedback rollouts over log-spaced action-
    improvement scales (ActionRollouts, planner.cc:618-667);
  * policy = time-indexed affine feedback u = ū + α·k + K·(x ⊖ x̄) with
    zero/linear interpolation of actions/states/gains (policy.cc:82-150).
"""

from __future__ import annotations

from typing import Tuple

from flax import struct
import jax
import jax.numpy as jnp

from mujoco_mpc_tpu.ops import linalg
from mujoco_mpc_tpu.physics import forward as fwd
from mujoco_mpc_tpu.physics import support
from mujoco_mpc_tpu.physics.model import Data
from mujoco_mpc_tpu.planners import derivatives, rollout as rollout_mod
from mujoco_mpc_tpu.tasks.base import TaskParams, TaskSpec

# reference: ilqg/settings.h
MIN_LINESEARCH_STEP = 1.0e-3
MIN_REGULARIZATION = 1.0e-6
MAX_REGULARIZATION = 1.0e6
MAX_REGULARIZATION_ITERATIONS = 5

# regularization types (backward_pass.h:28-32)
REG_CONTROL = 0
REG_STATE_CONTROL = 1
REG_VALUE = 2
REG_NONE = 3


@struct.dataclass
class ILQGPolicy:
  """Time-indexed affine feedback policy."""
  times: jax.Array               # (T,)
  qpos: jax.Array                # (T, nq) nominal states
  qvel: jax.Array                # (T, nv)
  act: jax.Array                 # (T, na)
  actions: jax.Array             # (T, nu) nominal actions
  feedback_gain: jax.Array       # (T, nu, ndx)
  action_improvement: jax.Array  # (T, nu)
  feedback_scaling: jax.Array    # scalar


@struct.dataclass
class ILQGState:
  policy: ILQGPolicy
  regularization: jax.Array
  regularization_factor: jax.Array
  previous_return: jax.Array
  # expected-improvement coefficients (dV) of the backward pass whose
  # action_improvement is stored in `policy` — consumed by the NEXT call's
  # surprise computation (the pipelined optimize applies the stored
  # improvement and computes a fresh one per call; see optimize())
  expected_dv: jax.Array = None


@struct.dataclass
class ILQGConfig:
  timestep: jax.Array
  horizon_time: jax.Array
  regularization_type: int = struct.field(pytree_node=False, default=0)
  action_limits: bool = struct.field(pytree_node=False, default=True)
  representation: int = struct.field(pytree_node=False, default=0)  # 0=zero


def default_config(spec: TaskSpec, dtype=jnp.float32) -> ILQGConfig:
  cfg = spec.config
  return ILQGConfig(
      timestep=jnp.asarray(cfg.get('agent_timestep',
                                   float(spec.mj_model.opt.timestep)), dtype),
      horizon_time=jnp.asarray(cfg.get('agent_horizon', 1.0), dtype),
      regularization_type=int(cfg.get('ilqg_regularization_type', 0)),
      action_limits=True,
      representation=int(cfg.get('ilqg_representation', 0)))


def default_state(spec: TaskSpec, horizon_steps: int,
                  dtype=jnp.float32) -> ILQGState:
  m = spec.model
  nd = derivatives.ndx(m)
  t = horizon_steps
  policy = ILQGPolicy(
      times=jnp.arange(t, dtype=dtype) * float(spec.mj_model.opt.timestep),
      qpos=jnp.tile(m.qpos0.astype(dtype), (t, 1)),
      qvel=jnp.zeros((t, m.nv), dtype=dtype),
      act=jnp.zeros((t, m.na), dtype=dtype),
      actions=jnp.zeros((t, m.nu), dtype=dtype),
      feedback_gain=jnp.zeros((t, m.nu, nd), dtype=dtype),
      action_improvement=jnp.zeros((t, m.nu), dtype=dtype),
      feedback_scaling=jnp.asarray(1.0, dtype=dtype))
  return ILQGState(
      policy=policy,
      regularization=jnp.asarray(1.0, dtype=dtype),
      regularization_factor=jnp.asarray(2.0, dtype=dtype),
      previous_return=jnp.asarray(rollout_mod.MAX_RETURN_VALUE, dtype=dtype),
      expected_dv=jnp.zeros(2, dtype=dtype))


# ---------------------------------------------------------------------------
# boxQP: masked projected Newton (analog of mju_boxQP / Tassa's boxQP)
# ---------------------------------------------------------------------------


def boxqp(h: jax.Array, g: jax.Array, lower: jax.Array, upper: jax.Array,
          iterations: int = 8):
  """min_x 0.5 x'Hx + g'x  s.t. lower <= x <= upper.

  Returns (x, free_mask, ok). Fixed iteration count, fully branch-free.
  """
  nu = g.shape[0]
  eye = jnp.eye(nu, dtype=h.dtype)

  def obj(x):
    return 0.5 * x @ (h @ x) + g @ x

  def body(_, carry):
    x, _free = carry
    grad = g + h @ x
    at_lo = jnp.logical_and(x <= lower + 1e-10, grad > 0)
    at_hi = jnp.logical_and(x >= upper - 1e-10, grad < 0)
    free = jnp.logical_not(jnp.logical_or(at_lo, at_hi))
    fm = free.astype(h.dtype)
    hm = (h * jnp.outer(fm, fm)) + eye * (1.0 - fm)
    dx = linalg.solve_spd(hm + 1e-12 * eye, grad * fm)
    # backtracking line search, projected
    alphas = jnp.array([1.0, 0.5, 0.25, 0.125, 0.0625], dtype=h.dtype)
    cands = jnp.clip(x[None] - alphas[:, None] * dx[None], lower, upper)
    objs = jax.vmap(obj)(cands)
    best = jnp.argmin(objs)
    x_new = jnp.where(objs[best] < obj(x), cands[best], x)
    return (x_new, free)

  x0 = jnp.clip(jnp.zeros_like(g), lower, upper)
  # unrolled: boxqp runs INSIDE the Riccati scan body — a fori_loop here
  # serializes 8 tiny solve+linesearch rounds per time step (T*8
  # dependent micro-ops dominated the swimmer backward pass); unrolling
  # lets XLA fuse the rounds into the (already unrolled) scan body
  carry = (x0, jnp.ones(nu, dtype=bool))
  for _ in range(iterations):
    carry = body(0, carry)
  x, free = carry
  ok = jnp.all(jnp.isfinite(x))
  return x, free, ok


# ---------------------------------------------------------------------------
# Riccati backward pass
# ---------------------------------------------------------------------------


def riccati(derivs: derivatives.Derivatives, mu: jax.Array,
            actions: jax.Array, ctrlrange: jax.Array, reg_type: int,
            action_limits: bool):
  """Backward recursion. Returns (k, K, dV (2,), ok).

  k/K have leading axis T (last step copies T-2, reference planner.cc:
  493-506).
  """
  a, b = derivs.a, derivs.b
  cx, cu, cxx, cxu, cuu = (derivs.cx, derivs.cu, derivs.cxx, derivs.cxu,
                           derivs.cuu)
  tm1, nd, nu = a.shape[0], a.shape[1], b.shape[2]
  eye_u = jnp.eye(nu, dtype=a.dtype)

  def step(carry, inp):
    vx, vxx, dv0, dv1, ok = carry
    at, bt, cxt, cut, cxxt, cxut, cuut, ut = inp

    at_vxx = at.T @ vxx
    qx = cxt + at.T @ vx
    qxx = cxxt + at_vxx @ at
    qu = cut + bt.T @ vx
    qxu = cxut + at_vxx @ bt
    quu = cuut + (bt.T @ vxx) @ bt

    if reg_type == REG_VALUE:
      vxx_reg = vxx + mu * jnp.eye(nd, dtype=a.dtype)
      at_vreg = at.T @ vxx_reg
      qxu_reg = cxut + at_vreg @ bt
      quu_reg = cuut + (bt.T @ vxx_reg) @ bt
    elif reg_type == REG_CONTROL:
      qxu_reg = qxu
      quu_reg = quu + mu * eye_u
    elif reg_type == REG_STATE_CONTROL:
      qxu_reg = qxu + mu * (at.T @ bt)
      quu_reg = quu + mu * (bt.T @ bt)
    else:
      qxu_reg = qxu
      quu_reg = quu

    if action_limits:
      lower = ctrlrange[:, 0] - ut
      upper = ctrlrange[:, 1] - ut
      # active-set rounds scale with nu: the projected-Newton boxQP
      # converges in ~nu/2 rounds on these small (nu<=8) problems, and
      # each round is a solve+linesearch INSIDE the sequential T-step
      # scan — 8 rounds made boxQP 80% of the backward pass (measured:
      # swimmer riccati 49.9 ms with limits vs 10.5 without; PERF.md r4)
      du, free, qp_ok = boxqp(quu_reg, qu, lower, upper,
                              iterations=min(4, max(2, nu)))
      fm = free.astype(a.dtype)
      hm = (quu_reg * jnp.outer(fm, fm)) + eye_u * (1.0 - fm)
      # K = -H_free^{-1} Qxu_free' with clamped rows zero; chol_solve solves
      # along the LAST axis, so pass (nd, nu) and transpose
      kt = -linalg.solve_spd(hm + 1e-12 * eye_u, qxu_reg * fm[None, :]).T
      step_ok = qp_ok
    else:
      chol = linalg.chol_factor(quu_reg)
      du = -linalg.chol_solve(chol, qu)
      kt = -linalg.chol_solve(chol, qxu_reg).T
      diag = jnp.diagonal(chol)
      step_ok = jnp.logical_and(jnp.all(jnp.isfinite(diag)),
                                jnp.all(diag > 0))

    # PD sanity: cholesky of quu_reg must be finite
    diag_q = jnp.diagonal(linalg.chol_factor(quu_reg))
    step_ok = jnp.logical_and(
        step_ok, jnp.logical_and(jnp.all(jnp.isfinite(diag_q)),
                                 jnp.all(diag_q > 1e-15)))

    quu_du = quu @ du
    dv0_new = dv0 + du @ qu
    dv1_new = dv1 + 0.5 * du @ quu_du

    vx_new = qx + kt.T @ (quu_du + qu) + qxu @ du
    vxx_new = qxx + kt.T @ quu @ kt + qxu @ kt + kt.T @ qxu.T
    vxx_new = 0.5 * (vxx_new + vxx_new.T)

    ok_new = jnp.logical_and(ok, step_ok)
    return (vx_new, vxx_new, dv0_new, dv1_new, ok_new), (du, kt)

  init = (cx[-1], cxx[-1], jnp.zeros((), a.dtype), jnp.zeros((), a.dtype),
          jnp.array(True))
  (vx, vxx, dv0, dv1, ok), (k, gain) = jax.lax.scan(
      step, init,
      (a, b, cx[:-1], cu[:-1], cxx[:-1], cxu[:-1], cuu[:-1], actions[:-1]),
      reverse=True, unroll=16 if nd <= 8 else (8 if nd <= 20 else 1))

  # copy last step (reference planner.cc:493-506)
  k = jnp.concatenate([k, k[-1:]], axis=0)
  gain = jnp.concatenate([gain, gain[-1:]], axis=0)
  return k, gain, jnp.stack([dv0, dv1]), ok


# ---------------------------------------------------------------------------
# feedback rollouts + policy action
# ---------------------------------------------------------------------------


def _feedback_rollout(spec: TaskSpec, d0: Data, policy: ILQGPolicy,
                      scale: jax.Array, params: TaskParams,
                      horizon_steps: int, index_by_time: bool = False):
  """Roll out u_t = clamp(ū_t + scale·k_t + K_t (x ⊖ x̄_t)) from d0.

  index_by_time=True looks the nominal up by absolute time (the reference's
  FindInterval; needed when the stored plan starts earlier than d0.time);
  False indexes by step, exact for a plan just recorded from d0."""
  m = spec.model
  lo = m.actuator_ctrlrange[:, 0]
  hi = m.actuator_ctrlrange[:, 1]

  def body(carry, t):
    tm_, qpos, qvel, act = carry
    if index_by_time:
      t = jnp.clip(
          jnp.searchsorted(policy.times, tm_, side='right') - 1, 0,
          policy.times.shape[0] - 1)
    dx = jnp.concatenate(
        [support.state_diff(m, policy.qpos[t], qpos),
         qvel - policy.qvel[t]] +
        ([act - policy.act[t]] if m.na else []))
    u = (policy.actions[t] + scale * policy.action_improvement[t]
         + policy.feedback_gain[t] @ dx)
    u = jnp.clip(u, lo, hi)
    # slim scan carry (rollout.py:44): only integrator state threads
    d = d0.replace(time=tm_, qpos=qpos, qvel=qvel, act=act, ctrl=u)
    df = fwd.forward(m, d)
    res = spec.residual_fn(m, df, params.residual_params)
    d = fwd.integrate(m, df)
    return ((d.time, d.qpos, d.qvel, d.act),
            (u, res, df.qpos, df.qvel, df.act, df.time))

  # partially unroll on small smooth models (same gate as rollout.py:50):
  # the batch-1 nominal rollout is pure dispatch latency — unrolling lets
  # XLA fuse elementwise chains across steps
  init = (d0.time, d0.qpos, d0.qvel, d0.act)
  _, (actions, residuals, qpos, qvel, act, times) = jax.lax.scan(
      body, init, jnp.arange(horizon_steps),
      unroll=8 if m.nv <= 4 else (4 if m.nv <= 8 else 1))
  costs = spec.cost(residuals, params)
  ret = rollout_mod.total_return(costs)
  return ret, actions, qpos, qvel, act, times, residuals, costs


def action_from_policy(spec: TaskSpec, policy: ILQGPolicy, qpos: jax.Array,
                       qvel: jax.Array, act: jax.Array,
                       time: jax.Array) -> jax.Array:
  """u = ū(t) + feedback_scaling · K(t) (x ⊖ x̄(t)), zero interpolation
  (reference policy.cc:82-150, representation 0)."""
  m = spec.model
  t_idx = jnp.clip(
      jnp.searchsorted(policy.times, time, side='right') - 1, 0,
      policy.times.shape[0] - 1)
  dx = jnp.concatenate(
      [support.state_diff(m, policy.qpos[t_idx], qpos),
       qvel - policy.qvel[t_idx]] +
      ([act - policy.act[t_idx]] if m.na else []))
  u = (policy.actions[t_idx]
       + policy.feedback_scaling * (policy.feedback_gain[t_idx] @ dx))
  return jnp.clip(u, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1])


def nominal_action_from_policy(spec: TaskSpec, policy: ILQGPolicy,
                               time: jax.Array) -> jax.Array:
  """ū(t) without feedback terms (reference: GetAction nominal_action,
  agent.proto:108-111 / ilqg policy.cc nominal path)."""
  m = spec.model
  t_idx = jnp.clip(
      jnp.searchsorted(policy.times, time, side='right') - 1, 0,
      policy.times.shape[0] - 1)
  return jnp.clip(policy.actions[t_idx], m.actuator_ctrlrange[:, 0],
                  m.actuator_ctrlrange[:, 1])


# ---------------------------------------------------------------------------
# optimize
# ---------------------------------------------------------------------------


def _backward_with_escalation(spec: TaskSpec, derivs, traj, cfg: ILQGConfig,
                              mu0: jax.Array, factor: jax.Array):
  """Backward pass with regularization escalation on failure.

  Happy path = exactly ONE backward pass: (k, gain, dv) are carried
  through the escalation loop instead of recomputing at the final mu.
  Returns (k, gain, dv, ok, mu)."""
  m = spec.model

  def bp(mu):
    return riccati(derivs, mu, traj.actions, m.actuator_ctrlrange,
                   cfg.regularization_type, cfg.action_limits)

  k0, gain0, dv0, ok0 = bp(mu0)

  def cond(carry):
    _k, _g, _dv, ok, it, _mu = carry
    return jnp.logical_and(jnp.logical_not(ok),
                           it < MAX_REGULARIZATION_ITERATIONS)

  def escalate(carry):
    _k, _g, _dv, _ok, it, mu = carry
    mu_new = jnp.clip(mu * factor, MIN_REGULARIZATION, MAX_REGULARIZATION)
    kn, gn, dvn, okn = bp(mu_new)
    return (kn, gn, dvn, okn, it + 1, mu_new)

  k, gain, dv, bp_ok, _, mu = jax.lax.while_loop(
      cond, escalate, (k0, gain0, dv0, ok0, jnp.array(0, jnp.int32), mu0))
  return k, gain, dv, bp_ok, mu


def _linesearch_steps(num_candidates: int, dtype) -> jax.Array:
  """Log-spaced improvement scales with a final 0 (= pure nominal replay)
  (reference: planner.cc:618-667 linesearch grid)."""
  return jnp.concatenate([
      jnp.logspace(0.0, jnp.log10(MIN_LINESEARCH_STEP),
                   num_candidates - 1, dtype=dtype),
      jnp.zeros(1, dtype=dtype)])


def _reg_update(state: ILQGState, surprise, action_step):
  """Surprise-based regularization scale (backward_pass.cc:341-356)."""
  factor = state.regularization_factor
  good = jnp.logical_or(surprise > 0.5, action_step > 0.3)
  bad = jnp.logical_or(surprise < 0.1, action_step < 0.06)
  scale = jnp.where(good, 1.0 / factor, jnp.where(bad, factor, 1.0))
  return scale


def optimize(spec: TaskSpec, state: ILQGState, d0: Data, params: TaskParams,
             cfg: ILQGConfig, num_candidates: int, horizon_steps: int,
             pipelined: bool = True) -> Tuple[ILQGState, dict]:
  """One iLQG planning iteration (reference: planner.cc Iteration).

  pipelined=True (default): forward/backward split. The reference runs
  TWO sequential rollout phases per iteration — a batch-1 nominal
  re-record (NominalTrajectory, planner.cc OptimizePolicy) and the
  linesearch rollouts (ActionRollouts, planner.cc:618-667). On TPU the
  batch-1 scan is pure dispatch latency (measured 77 of swimmer's 139 ms
  steady, docs/PERF.md round 4), so the two phases are MERGED: each call
  runs ONE batched feedback-rollout linesearch from the current state
  applying the improvement computed by the PREVIOUS call (its scale=0
  candidate is exactly the reference's nominal re-record — feedback
  replay without improvement), takes the winner as the new nominal
  trajectory, then runs derivatives + Riccati to produce the improvement
  the NEXT call applies. Per call this applies one improvement and
  computes one, like the reference, with the improvement lagging one
  planner iteration — the same lag the reference's physics thread
  already absorbs by acting through time-interpolated feedback gains
  while the planner replans (policy.cc:82-150).

  pipelined=False: the reference's eager order (nominal rollout ->
  backward pass -> linesearch applying the fresh improvement) — used by
  iLQS, whose sampling-vs-iLQG arbitration needs the improvement applied
  within the same call (ilqs/planner.cc:87-240).
  """
  m = spec.model
  dtype = d0.qpos.dtype
  steps = _linesearch_steps(num_candidates, dtype)

  if pipelined:
    # ----- ONE batched feedback-rollout phase, previous improvement -----
    def one(scale):
      return _feedback_rollout(spec, d0, state.policy, scale, params,
                               horizon_steps, index_by_time=True)

    (rets, acts_all, qpos_all, qvel_all, act_all, times_all, res_all,
     costs_all) = jax.vmap(one)(steps)
    winner = jnp.argmin(rets)
    prev_ret = rets[-1]                     # scale-0 = nominal re-record

    traj = derivatives.Trajectory(
        qpos=qpos_all[winner], qvel=qvel_all[winner], act=act_all[winner],
        time=times_all[winner], actions=acts_all[winner],
        residuals=res_all[winner], costs=costs_all[winner])

    # surprise uses the dV of the backward pass that PRODUCED the applied
    # improvement (carried in state.expected_dv)
    action_step = steps[winner]
    dv_prev = (state.expected_dv if state.expected_dv is not None
               else jnp.zeros(2, dtype))
    expected = (-action_step * (dv_prev[0] + action_step * dv_prev[1])
                + 1.0e-16)
    improvement = prev_ret - rets[winner]
    surprise = jnp.clip(improvement / expected, 0.0, 2.0)
    mu_start = jnp.clip(
        state.regularization * _reg_update(state, surprise, action_step),
        MIN_REGULARIZATION, MAX_REGULARIZATION)

    # ----- derivatives + backward pass on the winner trajectory -----
    derivs = derivatives.compute(spec, d0, traj, params)
    k, gain, dv, bp_ok, mu = _backward_with_escalation(
        spec, derivs, traj, cfg, mu_start, state.regularization_factor)

    new_policy = ILQGPolicy(
        times=traj.time, qpos=traj.qpos, qvel=traj.qvel, act=traj.act,
        actions=traj.actions, feedback_gain=gain, action_improvement=k,
        feedback_scaling=jnp.asarray(1.0, dtype))
    new_state = ILQGState(
        policy=new_policy, regularization=mu,
        regularization_factor=state.regularization_factor,
        previous_return=rets[winner], expected_dv=dv)
    info = {
        'best_return': rets[winner],
        'nominal_return': prev_ret,
        'improvement': jnp.maximum(improvement, 0.0),
        'action_step': action_step,
        'surprise': surprise,
        'regularization': mu,
        'backward_pass_ok': bp_ok,
    }
    return new_state, info

  # ----- eager (reference) order -----
  # nominal rollout under the current feedback policy: the rollout itself
  # records everything Trajectory needs (feedback terms vanish when
  # replaying the recorded actions from the same initial state)
  prev_ret, actions, qpos, qvel, act, times, residuals, costs = (
      _feedback_rollout(spec, d0, state.policy, jnp.zeros((), dtype), params,
                        horizon_steps, index_by_time=True))
  traj = derivatives.Trajectory(qpos=qpos, qvel=qvel, act=act, time=times,
                                actions=actions, residuals=residuals,
                                costs=costs)
  derivs = derivatives.compute(spec, d0, traj, params)
  k, gain, dv, bp_ok, mu = _backward_with_escalation(
      spec, derivs, traj, cfg, state.regularization,
      state.regularization_factor)

  nominal_policy = ILQGPolicy(
      times=traj.time, qpos=traj.qpos, qvel=traj.qvel, act=traj.act,
      actions=traj.actions, feedback_gain=gain, action_improvement=k,
      feedback_scaling=jnp.asarray(1.0, dtype))

  def one(scale):
    return _feedback_rollout(spec, d0, nominal_policy, scale, params,
                             horizon_steps)

  rets, acts_all, qpos_all, qvel_all, act_all, times_all, _, _ = jax.vmap(
      one)(steps)
  winner = jnp.argmin(rets)

  new_policy = ILQGPolicy(
      times=times_all[winner], qpos=qpos_all[winner], qvel=qvel_all[winner],
      act=act_all[winner], actions=acts_all[winner], feedback_gain=gain,
      action_improvement=k, feedback_scaling=jnp.asarray(1.0, dtype))

  action_step = steps[winner]
  expected = -action_step * (dv[0] + action_step * dv[1]) + 1.0e-16
  improvement = prev_ret - rets[winner]
  surprise = jnp.clip(improvement / expected, 0.0, 2.0)
  mu_next = jnp.clip(mu * _reg_update(state, surprise, action_step),
                     MIN_REGULARIZATION, MAX_REGULARIZATION)

  new_state = ILQGState(
      policy=new_policy, regularization=mu_next,
      regularization_factor=state.regularization_factor,
      previous_return=rets[winner], expected_dv=dv)
  info = {
      'best_return': rets[winner],
      'nominal_return': prev_ret,
      'improvement': jnp.maximum(improvement, 0.0),
      'action_step': action_step,
      'surprise': surprise,
      'regularization': mu_next,
      'backward_pass_ok': bp_ok,
  }
  return new_state, info
