"""Static kinematic-structure masks, cached per model structure.

The rollout hot loop is op-dispatch-bound on TPU, not FLOP-bound: unrolled
per-body/per-dof Python loops emit hundreds of tiny HLO ops per physics
step, each paying launch latency. Every tree accumulation here is instead
ONE dense matmul against a static 0/1 mask (nbody and nv are tiny, so the
masks are free and the matmuls map onto the MXU) — the TPU-native analog
of the sparse tree recursions inside MuJoCo's mj_crb/mj_rne/mj_comVel that
the reference calls via mj_step (/root/reference/mjpc/trajectory.cc:158).

All builders key their lru_cache on the model's static tuples (hashable),
so masks are built once per model structure per process and appear as
constants inside jit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from mujoco_mpc_tpu.physics.model import JointType, Model


@functools.lru_cache(maxsize=None)
def subtree_mask(body_parentid: Tuple[int, ...]) -> np.ndarray:
  """D[a, b] = 1 iff a is ancestor-or-self of b: (D @ x) accumulates
  per-body quantities over subtrees (CRB inertias, RNE forces, masses)."""
  n = len(body_parentid)
  d = np.zeros((n, n), dtype=np.float32)
  for b in range(n):
    a = b
    while True:
      d[a, b] = 1.0
      if a == 0:
        break
      a = body_parentid[a]
  return d


@functools.lru_cache(maxsize=None)
def body_ancestor_dof_mask(body_parentid: Tuple[int, ...],
                           body_dofadr: Tuple[int, ...],
                           body_dofnum: Tuple[int, ...],
                           nv: int) -> np.ndarray:
  """A[b, i] = 1 iff dof i belongs to an ancestor-or-self body of b:
  cvel = A @ (cdof * qvel), cacc = A @ (cdof_dot * qvel) + base."""
  n = len(body_parentid)
  a = np.zeros((n, nv), dtype=np.float32)
  for b in range(n):
    c = b
    while c > 0:
      a[b, body_dofadr[c]:body_dofadr[c] + body_dofnum[c]] = 1.0
      c = body_parentid[c]
  return a


@functools.lru_cache(maxsize=None)
def dof_vel_mask(body_parentid: Tuple[int, ...],
                 body_jntadr: Tuple[int, ...],
                 body_jntnum: Tuple[int, ...],
                 jnt_type: Tuple[int, ...],
                 jnt_dofadr: Tuple[int, ...],
                 nv: int) -> np.ndarray:
  """V[i, j] = 1 iff dof j's velocity contributes to the spatial velocity
  used for cdof_dot[i] = v x cdof[i] (mj_comVel ordering: ancestor-body
  dofs plus same-body dofs already processed; a free joint's rotation dofs
  see its translation dofs; ball/free rotation triples share one v; free
  translation dofs have v = 0 i.e. cdof_dot = 0)."""
  nbody = len(body_parentid)
  v = np.zeros((nv, nv), dtype=np.float32)

  # dofs of strict-ancestor bodies
  body_dofs = [[] for _ in range(nbody)]
  for b in range(1, nbody):
    for j in range(body_jntadr[b], body_jntadr[b] + body_jntnum[b]):
      nd = {JointType.FREE: 6, JointType.BALL: 3}.get(jnt_type[j], 1)
      body_dofs[b].extend(range(jnt_dofadr[j], jnt_dofadr[j] + nd))

  for b in range(1, nbody):
    anc = []
    c = body_parentid[b]
    while c > 0:
      anc.extend(body_dofs[c])
      c = body_parentid[c]
    seen = list(anc)
    for j in range(body_jntadr[b], body_jntadr[b] + body_jntnum[b]):
      jt = jnt_type[j]
      adr = jnt_dofadr[j]
      if jt == JointType.FREE:
        # translation dofs: cdof_dot = 0 (mask row stays empty)
        seen.extend(range(adr, adr + 3))
        for k in range(3, 6):
          v[adr + k, seen] = 1.0
        seen.extend(range(adr + 3, adr + 6))
      elif jt == JointType.BALL:
        for k in range(3):
          v[adr + k, seen] = 1.0
        seen.extend(range(adr, adr + 3))
      else:
        v[adr, seen] = 1.0
        seen.append(adr)
  return v


@functools.lru_cache(maxsize=None)
def cdof_gather(body_parentid: Tuple[int, ...],
                body_rootid: Tuple[int, ...],
                body_jntadr: Tuple[int, ...],
                body_jntnum: Tuple[int, ...],
                jnt_type: Tuple[int, ...],
                jnt_dofadr: Tuple[int, ...],
                jnt_bodyid: Tuple[int, ...],
                nv: int):
  """Static index arrays to build cdof (nv, 6) in a handful of batched ops.

  Per dof: ang = ANG[ang_idx], lin = cross(ang, origin - PT[pt_idx]) +
  LINC[lin_idx], with candidate tables
    ANG  = [0_3, xaxis (njnt), xmat columns (nbody*3)]
    PT   = [0_3, xanchor (njnt), xpos (nbody)]
    LINC = [0_3, xaxis (njnt), e_x, e_y, e_z]
  (the offset is irrelevant wherever ang == 0, so pt_idx can stay 0 there).
  Returns (ang_idx, pt_idx, lin_idx, dof_rootid) int arrays.
  """
  njnt = len(jnt_type)
  ang_idx = np.zeros(nv, dtype=np.int32)
  pt_idx = np.zeros(nv, dtype=np.int32)
  lin_idx = np.zeros(nv, dtype=np.int32)
  dof_rootid = np.zeros(nv, dtype=np.int32)

  def xaxis_id(j):
    return 1 + j

  def xmat_col_id(b, k):
    return 1 + njnt + 3 * b + k

  def xanchor_id(j):
    return 1 + j

  def xpos_id(b):
    return 1 + njnt + b

  def e_id(k):
    return 1 + njnt + k

  for j in range(njnt):
    jt = jnt_type[j]
    adr = jnt_dofadr[j]
    b = jnt_bodyid[j]
    root = body_rootid[b]
    if jt == JointType.FREE:
      for k in range(3):  # translation: ang = 0, lin = e_k
        lin_idx[adr + k] = e_id(k)
        dof_rootid[adr + k] = root
      for k in range(3):  # rotation: ang = xmat[b][:,k], offset vs xpos[b]
        ang_idx[adr + 3 + k] = xmat_col_id(b, k)
        pt_idx[adr + 3 + k] = xpos_id(b)
        dof_rootid[adr + 3 + k] = root
    elif jt == JointType.BALL:
      for k in range(3):  # ang = xmat[b][:,k], offset vs xanchor[j]
        ang_idx[adr + k] = xmat_col_id(b, k)
        pt_idx[adr + k] = xanchor_id(j)
        dof_rootid[adr + k] = root
    elif jt == JointType.SLIDE:
      lin_idx[adr] = xaxis_id(j)
      dof_rootid[adr] = root
    else:  # hinge
      ang_idx[adr] = xaxis_id(j)
      pt_idx[adr] = xanchor_id(j)
      dof_rootid[adr] = root
  return ang_idx, pt_idx, lin_idx, dof_rootid


@functools.lru_cache(maxsize=None)
def dof_body_gather(dof_bodyid: Tuple[int, ...]) -> np.ndarray:
  return np.asarray(dof_bodyid, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def scalar_joint_limits(jnt_limited: Tuple[int, ...],
                        jnt_type: Tuple[int, ...],
                        jnt_qposadr: Tuple[int, ...],
                        jnt_dofadr: Tuple[int, ...]):
  """(joint ids, qpos addresses, dof addresses) of limited hinge/slide
  joints, for the vectorized limit-row assembly."""
  ids = [j for j in range(len(jnt_type))
         if jnt_limited[j] and jnt_type[j] in (JointType.HINGE,
                                               JointType.SLIDE)]
  return (np.asarray(ids, dtype=np.int32),
          np.asarray([jnt_qposadr[j] for j in ids], dtype=np.int32),
          np.asarray([jnt_dofadr[j] for j in ids], dtype=np.int32))


@functools.lru_cache(maxsize=None)
def joint_coords(jnt_type: Tuple[int, ...],
                 jnt_qposadr: Tuple[int, ...],
                 jnt_dofadr: Tuple[int, ...]):
  """Static coordinate maps for per-joint qpos<->qvel operations.

  Returns (sq, sd, sj, quat_q, quat_d, qj):
    sq/sd/sj — 1-D spring/integration components (hinge, slide and free
      translation): qpos index, dof index, owning joint id;
    quat_q (n,4) / quat_d (n,3) / qj — quaternion block indices and their
      angular-velocity dof indices (free rotation + ball joints)."""
  sq, sd, sj = [], [], []
  quat_q, quat_d, qj = [], [], []
  for j, jt in enumerate(jnt_type):
    qadr, dadr = jnt_qposadr[j], jnt_dofadr[j]
    if jt == JointType.FREE:
      for k in range(3):
        sq.append(qadr + k)
        sd.append(dadr + k)
        sj.append(j)
      quat_q.append([qadr + 3 + k for k in range(4)])
      quat_d.append([dadr + 3 + k for k in range(3)])
      qj.append(j)
    elif jt == JointType.BALL:
      quat_q.append([qadr + k for k in range(4)])
      quat_d.append([dadr + k for k in range(3)])
      qj.append(j)
    else:
      sq.append(qadr)
      sd.append(dadr)
      sj.append(j)
  return (np.asarray(sq, dtype=np.int32), np.asarray(sd, dtype=np.int32),
          np.asarray(sj, dtype=np.int32),
          np.asarray(quat_q, dtype=np.int32).reshape(-1, 4),
          np.asarray(quat_d, dtype=np.int32).reshape(-1, 3),
          np.asarray(qj, dtype=np.int32))


class LevelPlan:
  """One tree depth level of the batched kinematics sweep."""

  def __init__(self, bodies, parents):
    self.bodies = np.asarray(bodies, dtype=np.int32)
    self.parents = np.asarray(parents, dtype=np.int32)
    # overrides of the parent-composed frame
    self.free_pos = []      # (pos-in-level, qadr) for single-free-joint
    self.mocap = []         # (pos-in-level, mocapid)
    # slots[s] = {jnt_type: [(pos-in-level, joint id, qadr)]}
    self.slots = []


@functools.lru_cache(maxsize=None)
def kinematic_levels(body_parentid: Tuple[int, ...],
                     body_jntadr: Tuple[int, ...],
                     body_jntnum: Tuple[int, ...],
                     body_mocapid: Tuple[int, ...],
                     jnt_type: Tuple[int, ...],
                     jnt_qposadr: Tuple[int, ...]):
  """Group bodies by tree depth for the level-batched kinematics sweep.

  Within a level every body's frame depends only on already-computed
  parent frames, so the whole level is one batch of quaternion ops; joints
  are applied slot-by-slot (bodies with several joints apply them in
  order), partitioned by joint type inside each slot."""
  nbody = len(body_parentid)
  depth = [0] * nbody
  for b in range(1, nbody):
    depth[b] = depth[body_parentid[b]] + 1
  maxd = max(depth) if nbody > 1 else 0

  plans = []
  for lvl in range(1, maxd + 1):
    bodies = [b for b in range(1, nbody) if depth[b] == lvl]
    plan = LevelPlan(bodies, [body_parentid[b] for b in bodies])
    max_slots = 0
    for i, b in enumerate(bodies):
      jadr, jnum = body_jntadr[b], body_jntnum[b]
      if jnum == 1 and jnt_type[jadr] == JointType.FREE:
        plan.free_pos.append((i, jadr, jnt_qposadr[jadr]))
        continue
      if body_mocapid[b] >= 0:
        plan.mocap.append((i, body_mocapid[b]))
      max_slots = max(max_slots, jnum)
    for s in range(max_slots):
      slot = {}
      for i, b in enumerate(bodies):
        jadr, jnum = body_jntadr[b], body_jntnum[b]
        if jnum == 1 and jnt_type[jadr] == JointType.FREE:
          continue
        if s < jnum:
          j = jadr + s
          slot.setdefault(jnt_type[j], []).append(
              (i, j, jnt_qposadr[j]))
      plan.slots.append(slot)
    plans.append(plan)
  return tuple(plans)


def masks(m: Model):
  """Convenience bundle of the accumulation masks for a model."""
  d_sub = subtree_mask(m.body_parentid)
  a_body = body_ancestor_dof_mask(m.body_parentid, m.body_dofadr,
                                  m.body_dofnum, m.nv)
  v_dof = dof_vel_mask(m.body_parentid, m.body_jntadr, m.body_jntnum,
                       m.jnt_type, m.jnt_dofadr, m.nv)
  return d_sub, a_body, v_dof
