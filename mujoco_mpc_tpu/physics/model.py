"""Physics model / data pytrees and the MJCF model compiler.

This is the TPU-native analog of the reference's physics layer (MuJoCo C,
see /root/reference/mjpc/trajectory.cc mj_step usage). We do NOT port MuJoCo;
we define our own pure-functional pipeline over these pytrees. The installed
`mujoco` pip package is used ONLY as an MJCF *compiler* (XML -> sizes, masses,
kinematic tree) on the host, and as a golden-test oracle in tests.

Design notes (TPU-first):
  * `Model` holds structural integers as static (hashable) tuples so jitted
    functions specialize on the kinematic structure and XLA sees static
    shapes and unrolled tree traversals.
  * All float quantities are jnp array leaves, so task parameters, gravity,
    timestep etc. can change without recompilation.
  * `Data` is a flat pytree of arrays — `jax.vmap` over it gives batched
    rollouts (the reference fans trajectories over a ThreadPool with one
    mjData per thread; here a leading batch axis replaces the pool).
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Tuple

from flax import struct
import jax
import jax.numpy as jnp
import numpy as np


class JointType(enum.IntEnum):
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


class IntegratorType(enum.IntEnum):
  EULER = 0          # semi-implicit Euler, implicit joint damping
  RK4 = 1
  IMPLICITFAST = 2   # reserved


class GeomType(enum.IntEnum):
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7
  OTHER = 100


class TrnType(enum.IntEnum):
  JOINT = 0
  JOINTINPARENT = 1
  SLIDERCRANK = 2
  TENDON = 3
  SITE = 4
  BODY = 5


class DynType(enum.IntEnum):
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3


class GainType(enum.IntEnum):
  FIXED = 0
  AFFINE = 1


class BiasType(enum.IntEnum):
  NONE = 0
  AFFINE = 1


def _static(x):
  return struct.field(pytree_node=False, default=x)


@struct.dataclass
class Option:
  """Simulation options (array leaves so they are tunable without recompile)."""
  timestep: jax.Array
  gravity: jax.Array        # (3,)
  wind: jax.Array           # (3,)
  magnetic: jax.Array       # (3,) global magnetic flux (magnetometer)
  density: jax.Array
  viscosity: jax.Array
  integrator: int = _static(int(IntegratorType.EULER))
  # constraint-solver iteration cap (MJCF <option iterations=.../>). Static:
  # under vmap the Newton while_loop runs until the WORST sample converges,
  # so batched planning models set a small explicit cap in their XML.
  iterations: int = _static(100)
  # friction-cone type (MJCF <option cone=.../>): 0 pyramidal, 1 elliptic
  # (mjtCone). Reference tasks fingers / manipulation / a1-quadruped /
  # aloha-bimanual set cone="elliptic".
  cone: int = _static(0)
  # noslip post-pass sweeps (MJCF <option noslip_iterations=.../>), static:
  # 0 disables the pass entirely (no traced ops). See physics/noslip.py.
  noslip_iterations: int = _static(0)


@struct.dataclass
class Model:
  """Static physics model. Structure fields are hashable python tuples."""

  # ---- sizes (static) ----
  nq: int = _static(0)
  nv: int = _static(0)
  nu: int = _static(0)
  na: int = _static(0)
  nbody: int = _static(0)
  njnt: int = _static(0)
  ngeom: int = _static(0)
  nsite: int = _static(0)
  nmocap: int = _static(0)
  ntendon: int = _static(0)
  neq: int = _static(0)

  # ---- tree structure (static tuples of ints) ----
  body_parentid: Tuple[int, ...] = _static(())
  body_rootid: Tuple[int, ...] = _static(())
  body_jntadr: Tuple[int, ...] = _static(())
  body_jntnum: Tuple[int, ...] = _static(())
  body_dofadr: Tuple[int, ...] = _static(())
  body_dofnum: Tuple[int, ...] = _static(())
  body_mocapid: Tuple[int, ...] = _static(())
  jnt_type: Tuple[int, ...] = _static(())
  jnt_qposadr: Tuple[int, ...] = _static(())
  jnt_dofadr: Tuple[int, ...] = _static(())
  jnt_bodyid: Tuple[int, ...] = _static(())
  jnt_limited: Tuple[int, ...] = _static(())
  dof_bodyid: Tuple[int, ...] = _static(())
  dof_jntid: Tuple[int, ...] = _static(())
  dof_parentid: Tuple[int, ...] = _static(())
  geom_type: Tuple[int, ...] = _static(())
  geom_bodyid: Tuple[int, ...] = _static(())
  geom_group: Tuple[int, ...] = _static(())
  geom_contype: Tuple[int, ...] = _static(())
  geom_conaffinity: Tuple[int, ...] = _static(())
  geom_condim: Tuple[int, ...] = _static(())
  geom_priority: Tuple[int, ...] = _static(())
  # static candidate collision pairs (geom1, geom2), prefiltered
  collision_pairs: Tuple[Tuple[int, int], ...] = _static(())
  # static cap on pyramidal contact POINTS per condim group (custom
  # numeric `contact_point_cap`; 0 = uncapped). Groups above the cap
  # keep only the cap deepest candidate points per step (traced top-k)
  # and enter the solver as dense facet rows — many-candidate hand+cube
  # models carry hundreds of candidate points of which only dozens can
  # physically touch (constraint._capped_point_rows)
  contact_point_cap: int = _static(0)
  # per-model override of the condim-1 dynamic-cluster row cap (custom
  # numeric `contact_cap`; 0 = the MJPC_TPU_CONTACT_CAP env default,
  # constraint._contact_capacity)
  contact_cap: int = _static(0)
  site_bodyid: Tuple[int, ...] = _static(())
  site_type: Tuple[int, ...] = _static(())    # mjtGeom (touch-sensor zones)
  tendon_limited: Tuple[int, ...] = _static(())
  tendon_names: Tuple[str, ...] = _static(())
  eq_type: Tuple[int, ...] = _static(())      # mjtEq values
  eq_obj1id: Tuple[int, ...] = _static(())
  eq_obj2id: Tuple[int, ...] = _static(())
  eq_active0: Tuple[int, ...] = _static(())
  actuator_trntype: Tuple[int, ...] = _static(())
  actuator_dyntype: Tuple[int, ...] = _static(())
  actuator_gaintype: Tuple[int, ...] = _static(())
  actuator_biastype: Tuple[int, ...] = _static(())
  actuator_trnid: Tuple[int, ...] = _static(())     # joint/site id per act
  actuator_refid: Tuple[int, ...] = _static(())     # refsite id or -1
  actuator_actadr: Tuple[int, ...] = _static(())
  actuator_actnum: Tuple[int, ...] = _static(())
  actuator_ctrllimited: Tuple[int, ...] = _static(())
  actuator_forcelimited: Tuple[int, ...] = _static(())
  has_fluid: bool = _static(False)

  # sensors (static metadata; values computed by physics/sensors.py)
  nsensordata: int = _static(0)
  sensor_type: Tuple[int, ...] = _static(())
  sensor_objtype: Tuple[int, ...] = _static(())
  sensor_objid: Tuple[int, ...] = _static(())
  sensor_adr: Tuple[int, ...] = _static(())
  sensor_dim: Tuple[int, ...] = _static(())
  sensor_names: Tuple[str, ...] = _static(())

  # names for host-side lookup (static)
  body_names: Tuple[str, ...] = _static(())
  joint_names: Tuple[str, ...] = _static(())
  geom_names: Tuple[str, ...] = _static(())
  site_names: Tuple[str, ...] = _static(())
  actuator_names: Tuple[str, ...] = _static(())
  keyframe_names: Tuple[str, ...] = _static(())

  # ---- numeric model (jnp leaves) ----
  qpos0: jax.Array = None
  qpos_spring: jax.Array = None
  body_pos: jax.Array = None        # (nbody, 3)
  body_quat: jax.Array = None       # (nbody, 4)
  body_ipos: jax.Array = None       # (nbody, 3)
  body_iquat: jax.Array = None      # (nbody, 4)
  body_mass: jax.Array = None       # (nbody,)
  body_gravcomp: jax.Array = None   # (nbody,) gravity compensation [0, 1]
  # static: any body has gravcomp (skips the passive-force term otherwise)
  any_gravcomp: bool = _static(False)
  body_subtreemass: jax.Array = None  # (nbody,)
  body_inertia: jax.Array = None    # (nbody, 3)
  jnt_pos: jax.Array = None         # (njnt, 3)
  jnt_axis: jax.Array = None        # (njnt, 3)
  jnt_stiffness: jax.Array = None   # (njnt,)
  jnt_range: jax.Array = None       # (njnt, 2)
  jnt_solref: jax.Array = None      # (njnt, 2)
  jnt_solimp: jax.Array = None      # (njnt, 5)
  jnt_margin: jax.Array = None      # (njnt,)
  dof_damping: jax.Array = None     # (nv,)
  dof_armature: jax.Array = None    # (nv,)
  dof_invweight0: jax.Array = None  # (nv,)
  # dofs with joint frictionloss > 0 (static set; menagerie robot models —
  # shadow hand, a1, aloha — set it on most joints). Per friction dof:
  # loss bound, solreffriction/solimpfriction (constraint.py friction rows)
  friction_dof: Tuple[int, ...] = _static(())
  dof_frictionloss: jax.Array = None     # (nf,)
  dof_friction_solref: jax.Array = None  # (nf, 2)
  dof_friction_solimp: jax.Array = None  # (nf, 5)
  geom_pos: jax.Array = None        # (ngeom, 3)
  geom_quat: jax.Array = None       # (ngeom, 4)
  geom_size: jax.Array = None       # (ngeom, 3)
  geom_friction: jax.Array = None   # (ngeom, 3)
  geom_solref: jax.Array = None     # (ngeom, 2)
  geom_solimp: jax.Array = None     # (ngeom, 5)
  geom_margin: jax.Array = None     # (ngeom,)
  geom_gap: jax.Array = None        # (ngeom,)
  geom_solmix: jax.Array = None     # (ngeom,)
  body_invweight0: jax.Array = None  # (nbody, 2) [trans, rot]
  site_pos: jax.Array = None        # (nsite, 3)
  site_size: jax.Array = None       # (nsite, 3)
  site_quat: jax.Array = None       # (nsite, 4)
  actuator_gear: jax.Array = None   # (nu, 6)
  actuator_dynprm: jax.Array = None   # (nu, k)
  actuator_gainprm: jax.Array = None  # (nu, k)
  actuator_biasprm: jax.Array = None  # (nu, k)
  actuator_ctrlrange: jax.Array = None  # (nu, 2)
  actuator_forcerange: jax.Array = None  # (nu, 2)
  act_range: jax.Array = None           # (na, 2) per-slot clamp, +-big
                                        # when unlimited (actrange)

  # convex-hull data for MESH geoms: geom id -> (hull verts (V, 3),
  # face normals (F, 3), face offsets (F,)), all in the geom frame.
  # Computed at model compile (scipy ConvexHull); a dict-of-arrays pytree
  # so shapes stay static per geom.
  geom_mesh: Dict[int, Tuple[jax.Array, jax.Array, jax.Array]] = None
  # height fields: geom id -> (elevation grid (nrow, ncol) in [0, 1],
  # size (4,) = (radius_x, radius_y, z_top, z_bottom)); grid shapes are
  # static per geom (reference terrain: quadruped hill task.xml hfield)
  geom_hfield: Dict[int, Tuple[jax.Array, jax.Array]] = None

  # fixed tendons (wrap type joint only; spatial tendons rejected at
  # compile). Moments are configuration-independent, so both maps are
  # constant model leaves: length = ten_qmat @ qpos, J = ten_moment.
  eq_data: jax.Array = None         # (neq, 11)
  eq_solref: jax.Array = None       # (neq, 2)
  eq_solimp: jax.Array = None       # (neq, 5)

  ten_moment: jax.Array = None      # (ntendon, nv) fixed-tendon rows
  ten_qmat: jax.Array = None        # (ntendon, nq) fixed-tendon rows
  # spatial tendons: per-tendon static wrap plan, () for fixed tendons,
  # ((divisor, (site ids...)), ...) branches for spatial ones
  ten_spatial: Tuple = _static(())
  ten_length0: jax.Array = None     # (ntendon,) lengths at qpos0
  tendon_stiffness: jax.Array = None    # (ntendon,)
  tendon_damping: jax.Array = None      # (ntendon,)
  tendon_lengthspring: jax.Array = None  # (ntendon, 2) deadband [lo, hi]
  tendon_range: jax.Array = None        # (ntendon, 2)
  tendon_margin: jax.Array = None       # (ntendon,)
  tendon_solref_lim: jax.Array = None   # (ntendon, 2)
  tendon_solimp_lim: jax.Array = None   # (ntendon, 5)
  tendon_invweight0: jax.Array = None   # (ntendon,)

  # dense (nv, nv) mask: M[i, j] structurally nonzero (j ancestor-or-self of i)
  dof_ancestor_mask: jax.Array = None

  # keyframes
  key_qpos: jax.Array = None        # (nkey, nq)
  key_qvel: jax.Array = None        # (nkey, nv)
  key_act: jax.Array = None         # (nkey, na)
  key_ctrl: jax.Array = None        # (nkey, nu)

  opt: Option = None

  # ---- host-side lookups (static) ----
  def name2id(self, names: Tuple[str, ...], name: str) -> int:
    try:
      return names.index(name)
    except ValueError:
      return -1

  def body(self, name: str) -> int:
    return self.name2id(self.body_names, name)

  def joint(self, name: str) -> int:
    return self.name2id(self.joint_names, name)

  def site(self, name: str) -> int:
    return self.name2id(self.site_names, name)

  def geom(self, name: str) -> int:
    return self.name2id(self.geom_names, name)

  def keyframe_qpos(self, name: str) -> jax.Array:
    return self.key_qpos[self.name2id(self.keyframe_names, name)]


@struct.dataclass
class Data:
  """Per-step simulation state + computed quantities (all jnp leaves)."""
  # state
  time: jax.Array
  qpos: jax.Array           # (nq,)
  qvel: jax.Array           # (nv,)
  act: jax.Array            # (na,)
  ctrl: jax.Array           # (nu,)
  qfrc_applied: jax.Array   # (nv,)
  xfrc_applied: jax.Array   # (nbody, 6) [force(3), torque(3)] world frame
  mocap_pos: jax.Array      # (nmocap, 3)
  mocap_quat: jax.Array     # (nmocap, 4)
  userdata: jax.Array       # (nuserdata,)

  # computed by kinematics
  xpos: jax.Array = None    # (nbody, 3)
  xquat: jax.Array = None   # (nbody, 4)
  xmat: jax.Array = None    # (nbody, 3, 3)
  xipos: jax.Array = None   # (nbody, 3)
  ximat: jax.Array = None   # (nbody, 3, 3)
  xanchor: jax.Array = None  # (njnt, 3)
  xaxis: jax.Array = None   # (njnt, 3)
  geom_xpos: jax.Array = None  # (ngeom, 3)
  geom_xmat: jax.Array = None  # (ngeom, 3, 3)
  site_xpos: jax.Array = None  # (nsite, 3)
  site_xmat: jax.Array = None  # (nsite, 3, 3)

  # computed by com_pos
  subtree_com: jax.Array = None  # (nbody, 3)
  cinert: jax.Array = None  # (nbody, 10)
  cdof: jax.Array = None    # (nv, 6)

  # computed by com_vel
  cvel: jax.Array = None    # (nbody, 6)
  cdof_dot: jax.Array = None  # (nv, 6)

  # dynamics quantities
  qM: jax.Array = None          # (nv, nv) dense mass matrix
  qfrc_bias: jax.Array = None   # (nv,)
  qfrc_passive: jax.Array = None  # (nv,)
  qfrc_constraint: jax.Array = None  # (nv,)
  actuator_length: jax.Array = None    # (nu,)
  actuator_velocity: jax.Array = None  # (nu,)
  actuator_force: jax.Array = None     # (nu,)
  actuator_moment: jax.Array = None    # (nu, nv)
  qfrc_actuator: jax.Array = None  # (nv,)
  qfrc_smooth: jax.Array = None    # (nv,)
  qacc: jax.Array = None           # (nv,)
  act_dot: jax.Array = None        # (na,)

  # tendons
  ten_length: jax.Array = None     # (ntendon,)
  ten_velocity: jax.Array = None   # (ntendon,)
  ten_J: jax.Array = None          # (ntendon, nv) moment/Jacobian rows

  # sensors (task-defined residual inputs live here)
  sensordata: jax.Array = None


# ---------------------------------------------------------------------------
# Model compiler: mujoco.MjModel -> Model
# ---------------------------------------------------------------------------

_SUPPORTED_GEOMS = {0: GeomType.PLANE, 1: GeomType.HFIELD,
                    2: GeomType.SPHERE, 3: GeomType.CAPSULE,
                    4: GeomType.ELLIPSOID, 5: GeomType.CYLINDER,
                    6: GeomType.BOX, 7: GeomType.MESH}


def _names(mj, adr_array, count, objtype=None) -> Tuple[str, ...]:
  import mujoco  # local import: host-only dependency
  out = []
  for i in range(count):
    adr = adr_array[i]
    end = mj.names.find(b'\x00', adr)
    out.append(mj.names[adr:end].decode())
  return tuple(out)


def put_model(mj, dtype=jnp.float32, strict_sensors: bool = True) -> Model:
  """Compile a mujoco.MjModel into our device Model pytree.

  strict_sensors: fail at compile time on sensor types sensordata() cannot
  evaluate, instead of silently returning zeros for them at run time."""
  import mujoco
  t = lambda a: tuple(int(x) for x in np.asarray(a).reshape(-1))
  # np.array(copy=True): jnp.asarray on CPU may zero-copy ALIAS the mujoco
  # buffers, which mj_step then mutates under us
  f = lambda a: jnp.asarray(np.array(a, dtype=np.float64), dtype=dtype)

  if strict_sensors:
    from mujoco_mpc_tpu.physics import sensors as sensors_mod
    bad = []
    for s in range(mj.nsensor):
      st = int(mj.sensor_type[s])
      if st not in sensors_mod.SUPPORTED_SENSORS:
        adr = mj.name_sensoradr[s]
        end = mj.names.find(b'\x00', adr)
        bad.append(f'{mj.names[adr:end].decode()!r} (mjtSensor {st})')
    if bad:
      raise NotImplementedError(
          'unsupported sensor types (silent zeros would corrupt residuals/'
          'estimators): ' + ', '.join(bad) +
          '. Pass strict_sensors=False to compile anyway.')

  # MJCF <option><flag .../></option> disable bits the pipeline honors
  dis = int(mj.opt.disableflags)
  contact_disabled = bool(dis & mujoco.mjtDisableBit.mjDSBL_CONTACT) or bool(
      dis & mujoco.mjtDisableBit.mjDSBL_CONSTRAINT)
  limit_disabled = bool(dis & mujoco.mjtDisableBit.mjDSBL_LIMIT) or bool(
      dis & mujoco.mjtDisableBit.mjDSBL_CONSTRAINT)
  gravity_disabled = bool(dis & mujoco.mjtDisableBit.mjDSBL_GRAVITY)
  clampctrl_disabled = bool(dis & mujoco.mjtDisableBit.mjDSBL_CLAMPCTRL)
  equality_disabled = bool(dis & mujoco.mjtDisableBit.mjDSBL_EQUALITY) or bool(
      dis & mujoco.mjtDisableBit.mjDSBL_CONSTRAINT)
  friction_disabled = bool(
      dis & mujoco.mjtDisableBit.mjDSBL_FRICTIONLOSS) or bool(
      dis & mujoco.mjtDisableBit.mjDSBL_CONSTRAINT)

  # static set of dofs with joint friction rows (constraint.py Huber rows)
  friction_dof = () if friction_disabled else tuple(
      int(i) for i in np.flatnonzero(mj.dof_frictionloss > 0))
  if not friction_disabled and mj.ntendon and np.any(
      mj.tendon_frictionloss > 0):
    raise NotImplementedError(
        'tendon frictionloss is not supported (joint/dof frictionloss is); '
        'set tendon frictionloss=0 or disable the frictionloss flag')

  nv = mj.nv
  # dense ancestor mask from dof_parentid: mask[i, j] = j is ancestor-or-self
  mask = np.zeros((nv, nv), dtype=bool)
  for i in range(nv):
    j = i
    while j >= 0:
      mask[i, j] = True
      j = int(mj.dof_parentid[j])

  geom_type = []
  for g in range(mj.ngeom):
    geom_type.append(int(_SUPPORTED_GEOMS.get(int(mj.geom_type[g]),
                                              GeomType.OTHER)))

  # static candidate collision pairs (analog: mj_collision broadphase +
  # contype/conaffinity + parent filtering, computed once at compile time)
  pairs = []
  # <contact><exclude> body pairs (signature = (body1<<16) + body2)
  excluded = set()
  for e in range(mj.nexclude):
    sig = int(mj.exclude_signature[e])
    excluded.add((sig >> 16, sig & 0xFFFF))
    excluded.add((sig & 0xFFFF, sig >> 16))
  for g1 in range(mj.ngeom if not contact_disabled else 0):
    for g2 in range(g1 + 1, mj.ngeom):
      b1, b2 = int(mj.geom_bodyid[g1]), int(mj.geom_bodyid[g2])
      if b1 == b2:
        continue
      if (b1, b2) in excluded:
        continue
      # parent filter (mjDSBL_FILTERPARENT default on; world parent exempt)
      w1 = int(mj.body_weldid[b1])
      w2 = int(mj.body_weldid[b2])
      if w1 == w2:
        continue
      p1 = int(mj.body_weldid[mj.body_parentid[w1]])
      p2 = int(mj.body_weldid[mj.body_parentid[w2]])
      if (w1 != 0 and w2 != 0) and (p1 == w2 or p2 == w1):
        continue
      c1, a1 = int(mj.geom_contype[g1]), int(mj.geom_conaffinity[g1])
      c2, a2 = int(mj.geom_contype[g2]), int(mj.geom_conaffinity[g2])
      if not ((c1 & a2) or (c2 & a1)):
        continue
      t1 = _SUPPORTED_GEOMS.get(int(mj.geom_type[g1]), GeomType.OTHER)
      t2 = _SUPPORTED_GEOMS.get(int(mj.geom_type[g2]), GeomType.OTHER)
      # order so the lower-valued type comes first (plane first)
      if t2 < t1:
        g1o, g2o = g2, g1
      else:
        g1o, g2o = g1, g2
      pairs.append((g1o, g2o))

  # tendons. Fixed (joint-wrap) tendons are constant joint-space maps;
  # spatial tendons are paths over site waypoints and sphere/cylinder
  # wrap surfaces with optional pulley branch divisors (mj_tendon
  # semantics) — their static wrap plan is recorded in ten_spatial as
  # ((divisor, (elements...)), ...) per branch, each element ('s', site)
  # or ('g', geom, kind, sidesite) with kind 0=sphere 1=cylinder and
  # sidesite -1 when absent; the state-dependent length/Jacobian is
  # computed in smooth.tendon after kinematics (wrap tangent geometry in
  # smooth._wrap_geom).
  ten_moment = np.zeros((mj.ntendon, mj.nv))
  ten_qmat = np.zeros((mj.ntendon, mj.nq))
  ten_spatial = []
  for ti in range(mj.ntendon):
    adr, num = int(mj.tendon_adr[ti]), int(mj.tendon_num[ti])
    wtypes = [int(mj.wrap_type[w]) for w in range(adr, adr + num)]
    if all(w == int(mujoco.mjtWrap.mjWRAP_JOINT) for w in wtypes):
      for w in range(adr, adr + num):
        j = int(mj.wrap_objid[w])
        coef = float(mj.wrap_prm[w])
        ten_moment[ti, mj.jnt_dofadr[j]] += coef
        ten_qmat[ti, mj.jnt_qposadr[j]] += coef
      ten_spatial.append(())
      continue
    branches = []
    divisor, elems = 1.0, []
    for w in range(adr, adr + num):
      wt = int(mj.wrap_type[w])
      if wt == int(mujoco.mjtWrap.mjWRAP_SITE):
        elems.append(('s', int(mj.wrap_objid[w])))
      elif wt in (int(mujoco.mjtWrap.mjWRAP_SPHERE),
                  int(mujoco.mjtWrap.mjWRAP_CYLINDER)):
        kind = 0 if wt == int(mujoco.mjtWrap.mjWRAP_SPHERE) else 1
        elems.append(('g', int(mj.wrap_objid[w]), kind,
                      int(round(float(mj.wrap_prm[w])))
                      if mj.wrap_prm[w] >= 0 else -1))
      elif wt == int(mujoco.mjtWrap.mjWRAP_PULLEY):
        if len(elems) >= 2:
          branches.append((divisor, tuple(elems)))
        divisor, elems = float(mj.wrap_prm[w]), []
      else:
        raise NotImplementedError(
            f'tendon {ti} uses wrap type {wt}; only joint, site, '
            'sphere/cylinder geom and pulley wraps are supported')
    if len(elems) >= 2:
      branches.append((divisor, tuple(elems)))
    ten_spatial.append(tuple(branches))
  # spatial tendons may not participate in tendon-coupling equalities
  # (their residual closure evaluates lengths via the constant qmat)
  for e in range(mj.neq):
    if int(mj.eq_type[e]) == int(mujoco.mjtEq.mjEQ_TENDON):
      for tid in (int(mj.eq_obj1id[e]), int(mj.eq_obj2id[e])):
        if tid >= 0 and ten_spatial[tid]:
          raise NotImplementedError(
              f'equality {e} couples spatial tendon {tid}; tendon '
              'equality constraints support fixed tendons only')
  # reference lengths at qpos0 (spatial lengths need FK; take them from
  # the C oracle once at compile time)
  if mj.ntendon and any(ten_spatial):
    _d0 = mujoco.MjData(mj)
    mujoco.mj_forward(mj, _d0)
    ten_length0 = np.array(_d0.ten_length, dtype=np.float64)
  else:
    ten_length0 = ten_qmat @ np.asarray(mj.qpos0, dtype=np.float64)

  # convex hulls for mesh geoms (vertex cap keeps narrowphase tensors
  # small; farthest-point subsampling preserves the silhouette). Cylinder
  # and ellipsoid geoms also get tessellated hulls so their non-exact
  # pairs (cyl-box, cyl-cyl, ellipsoid-anything-convex) route through the
  # generic hull narrowphase (MuJoCo resolves these pairs with its convex
  # collider, engine_collision_convex.c; here the polyhedral hull is
  # fixed at compile time so the contact stage stays static-shaped).
  geom_mesh = {}
  for g in range(mj.ngeom):
    gt = int(mj.geom_type[g])
    if gt not in (4, 5, 7):   # ELLIPSOID, CYLINDER, MESH
      continue
    from scipy.spatial import ConvexHull
    if gt == 7:               # mjGEOM_MESH
      mid = int(mj.geom_dataid[g])
      va, vn = int(mj.mesh_vertadr[mid]), int(mj.mesh_vertnum[mid])
      verts = np.array(mj.mesh_vert[va:va + vn], dtype=np.float64)
    elif gt == 5:             # CYLINDER: 2 x 16-gon rims (on-surface)
      r, h = float(mj.geom_size[g, 0]), float(mj.geom_size[g, 1])
      ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
      rim = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
      verts = np.concatenate([
          np.concatenate([rim, np.full((16, 1), h)], axis=1),
          np.concatenate([rim, np.full((16, 1), -h)], axis=1)])
    else:                     # ELLIPSOID: Fibonacci-sphere sample
      ga = np.pi * (3.0 - np.sqrt(5.0))
      k = np.arange(32, dtype=np.float64)
      z = 1.0 - 2.0 * (k + 0.5) / 32
      rho = np.sqrt(np.maximum(1.0 - z * z, 0.0))
      sph = np.stack([rho * np.cos(ga * k), rho * np.sin(ga * k), z],
                     axis=1)
      verts = sph * np.asarray(mj.geom_size[g], dtype=np.float64)[None]
    hull = ConvexHull(verts)
    hv = verts[hull.vertices]
    if hv.shape[0] > 32:
      keep = [0]
      d2 = np.sum((hv - hv[0]) ** 2, axis=1)
      for _ in range(31):
        k = int(np.argmax(d2))
        keep.append(k)
        d2 = np.minimum(d2, np.sum((hv - hv[k]) ** 2, axis=1))
      hv = hv[sorted(set(keep))]
    eqs = hull.equations                      # n.x + b <= 0 inside
    if eqs.shape[0] > 64:
      eqs = eqs[np.argsort(eqs[:, 3])[:64]]
    face_n, face_b = eqs[:, :3], eqs[:, 3]
    if gt in (4, 5):
      # split the tessellation error: faces of the inscribed hull are
      # pushed to the midpoint between the inscribed plane and the true
      # surface's support plane along each face normal, so resting depth
      # error is half the sag in either direction
      if gt == 4:             # ellipsoid support: ||diag(size) n||
        sup = np.linalg.norm(face_n * np.asarray(
            mj.geom_size[g], dtype=np.float64)[None], axis=1)
      else:                   # cylinder support: r |n_xy| + h |n_z|
        sup = (r * np.linalg.norm(face_n[:, :2], axis=1)
               + h * np.abs(face_n[:, 2]))
      face_b = 0.5 * (face_b - sup)
    geom_mesh[g] = (f(hv), f(face_n), f(face_b))

  # height-field elevation grids (mjGEOM_HFIELD)
  geom_hfield = {}
  for g in range(mj.ngeom):
    if int(mj.geom_type[g]) == 1:
      hid = int(mj.geom_dataid[g])
      nrow = int(mj.hfield_nrow[hid])
      ncol = int(mj.hfield_ncol[hid])
      adr = int(mj.hfield_adr[hid])
      grid = np.array(mj.hfield_data[adr:adr + nrow * ncol],
                      dtype=np.float64).reshape(nrow, ncol)
      geom_hfield[g] = (f(grid), f(mj.hfield_size[hid]))

  # per-activation-slot clamp range (actrange; mj_advance clips act after
  # integration for actlimited actuators — intvelocity relies on this)
  act_range = np.tile(np.array([-1e30, 1e30]), (max(mj.na, 1), 1))[:mj.na]
  for u in range(mj.nu):
    if mj.actuator_actlimited[u] and int(mj.actuator_actadr[u]) >= 0:
      a0 = int(mj.actuator_actadr[u])
      for k in range(int(mj.actuator_actnum[u])):
        act_range[a0 + k] = mj.actuator_actrange[u]

  opt = Option(
      timestep=f(mj.opt.timestep),
      gravity=f(np.zeros(3) if gravity_disabled else mj.opt.gravity),
      wind=f(mj.opt.wind),
      magnetic=f(mj.opt.magnetic),
      density=f(mj.opt.density),
      viscosity=f(mj.opt.viscosity),
      integrator=int(mj.opt.integrator),
      iterations=int(mj.opt.iterations),
      cone=int(mj.opt.cone),
      noslip_iterations=int(mj.opt.noslip_iterations),
  )

  # contact-point cap from the model's custom numerics (config system
  # convention, SURVEY 5.6; 0 = uncapped)
  point_cap, dyn_cap = 0, 0
  for ni in range(mj.nnumeric):
    adr = mj.name_numericadr[ni]
    name = mj.names[adr:mj.names.find(b'\x00', adr)].decode()
    if name == 'contact_point_cap':
      point_cap = int(mj.numeric_data[mj.numeric_adr[ni]])
    elif name == 'contact_cap':
      dyn_cap = int(mj.numeric_data[mj.numeric_adr[ni]])

  return Model(
      contact_point_cap=point_cap,
      contact_cap=dyn_cap,
      nq=mj.nq, nv=mj.nv, nu=mj.nu, na=mj.na, nbody=mj.nbody, njnt=mj.njnt,
      ngeom=mj.ngeom, nsite=mj.nsite, nmocap=mj.nmocap, ntendon=mj.ntendon,
      neq=0 if equality_disabled else mj.neq,
      eq_type=t(mj.eq_type),
      eq_obj1id=t(mj.eq_obj1id),
      eq_obj2id=t(mj.eq_obj2id),
      eq_active0=t(mj.eq_active0),
      tendon_limited=t(np.zeros_like(mj.tendon_limited) if limit_disabled
                       else mj.tendon_limited),
      tendon_names=_names(mj, mj.name_tendonadr, mj.ntendon),
      body_parentid=t(mj.body_parentid),
      body_rootid=t(mj.body_rootid),
      body_jntadr=t(mj.body_jntadr),
      body_jntnum=t(mj.body_jntnum),
      body_dofadr=t(mj.body_dofadr),
      body_dofnum=t(mj.body_dofnum),
      body_mocapid=t(mj.body_mocapid),
      jnt_type=t(mj.jnt_type),
      jnt_qposadr=t(mj.jnt_qposadr),
      jnt_dofadr=t(mj.jnt_dofadr),
      jnt_bodyid=t(mj.jnt_bodyid),
      jnt_limited=t(np.zeros_like(mj.jnt_limited) if limit_disabled
                    else mj.jnt_limited),
      dof_bodyid=t(mj.dof_bodyid),
      dof_jntid=t(mj.dof_jntid),
      dof_parentid=t(mj.dof_parentid),
      geom_type=tuple(geom_type),
      geom_bodyid=t(mj.geom_bodyid),
      geom_group=t(mj.geom_group),
      geom_contype=t(mj.geom_contype),
      geom_conaffinity=t(mj.geom_conaffinity),
      geom_condim=t(mj.geom_condim),
      geom_priority=t(mj.geom_priority),
      collision_pairs=tuple(pairs),
      site_bodyid=t(mj.site_bodyid),
      site_type=t(mj.site_type),
      actuator_trntype=t(mj.actuator_trntype),
      actuator_dyntype=t(mj.actuator_dyntype),
      actuator_gaintype=t(mj.actuator_gaintype),
      actuator_biastype=t(mj.actuator_biastype),
      actuator_trnid=t(mj.actuator_trnid[:, 0]) if mj.nu else (),
      actuator_refid=t(mj.actuator_trnid[:, 1]) if mj.nu else (),
      actuator_actadr=t(mj.actuator_actadr),
      actuator_actnum=t(mj.actuator_actnum),
      actuator_ctrllimited=t(np.zeros_like(mj.actuator_ctrllimited)
                             if clampctrl_disabled
                             else mj.actuator_ctrllimited),
      actuator_forcelimited=t(mj.actuator_forcelimited),
      has_fluid=bool(mj.opt.density > 0 or mj.opt.viscosity > 0
                     or np.any(mj.opt.wind)),
      nsensordata=mj.nsensordata,
      sensor_type=t(mj.sensor_type),
      sensor_objtype=t(mj.sensor_objtype),
      sensor_objid=t(mj.sensor_objid),
      sensor_adr=t(mj.sensor_adr),
      sensor_dim=t(mj.sensor_dim),
      sensor_names=_names(mj, mj.name_sensoradr, mj.nsensor),
      body_names=_names(mj, mj.name_bodyadr, mj.nbody),
      joint_names=_names(mj, mj.name_jntadr, mj.njnt),
      geom_names=_names(mj, mj.name_geomadr, mj.ngeom),
      site_names=_names(mj, mj.name_siteadr, mj.nsite),
      actuator_names=_names(mj, mj.name_actuatoradr, mj.nu),
      keyframe_names=_names(mj, mj.name_keyadr, mj.nkey),
      qpos0=f(mj.qpos0),
      qpos_spring=f(mj.qpos_spring),
      body_pos=f(mj.body_pos),
      body_quat=f(mj.body_quat),
      body_ipos=f(mj.body_ipos),
      body_iquat=f(mj.body_iquat),
      body_mass=f(mj.body_mass),
      body_gravcomp=f(mj.body_gravcomp),
      any_gravcomp=bool(np.any(mj.body_gravcomp > 0)),
      body_subtreemass=f(mj.body_subtreemass),
      body_inertia=f(mj.body_inertia),
      jnt_pos=f(mj.jnt_pos),
      jnt_axis=f(mj.jnt_axis),
      jnt_stiffness=f(mj.jnt_stiffness),
      jnt_range=f(mj.jnt_range),
      jnt_solref=f(mj.jnt_solref),
      jnt_solimp=f(mj.jnt_solimp),
      jnt_margin=f(mj.jnt_margin),
      dof_damping=f(mj.dof_damping),
      dof_armature=f(mj.dof_armature),
      dof_invweight0=f(mj.dof_invweight0),
      friction_dof=friction_dof,
      dof_frictionloss=f(mj.dof_frictionloss[list(friction_dof)]),
      dof_friction_solref=f(mj.dof_solref[list(friction_dof)]),
      dof_friction_solimp=f(mj.dof_solimp[list(friction_dof)]),
      geom_pos=f(mj.geom_pos),
      geom_quat=f(mj.geom_quat),
      geom_size=f(mj.geom_size),
      geom_friction=f(mj.geom_friction),
      geom_solref=f(mj.geom_solref),
      geom_solimp=f(mj.geom_solimp),
      geom_margin=f(mj.geom_margin),
      geom_gap=f(mj.geom_gap),
      geom_solmix=f(mj.geom_solmix),
      body_invweight0=f(mj.body_invweight0),
      site_pos=f(mj.site_pos),
      site_size=f(mj.site_size),
      site_quat=f(mj.site_quat),
      actuator_gear=f(mj.actuator_gear),
      actuator_dynprm=f(mj.actuator_dynprm),
      actuator_gainprm=f(mj.actuator_gainprm),
      actuator_biasprm=f(mj.actuator_biasprm),
      actuator_ctrlrange=f(mj.actuator_ctrlrange),
      actuator_forcerange=f(mj.actuator_forcerange),
      act_range=f(act_range),
      geom_mesh=geom_mesh,
      geom_hfield=geom_hfield,
      eq_data=f(mj.eq_data),
      eq_solref=f(mj.eq_solref),
      eq_solimp=f(mj.eq_solimp),
      ten_moment=f(ten_moment),
      ten_qmat=f(ten_qmat),
      ten_spatial=tuple(ten_spatial),
      ten_length0=f(ten_length0),
      tendon_stiffness=f(mj.tendon_stiffness),
      tendon_damping=f(mj.tendon_damping),
      tendon_lengthspring=f(np.atleast_2d(mj.tendon_lengthspring)
                            if mj.ntendon else np.zeros((0, 2))),
      tendon_range=f(mj.tendon_range),
      tendon_margin=f(mj.tendon_margin),
      tendon_solref_lim=f(mj.tendon_solref_lim),
      tendon_solimp_lim=f(mj.tendon_solimp_lim),
      tendon_invweight0=f(mj.tendon_invweight0),
      dof_ancestor_mask=jnp.asarray(mask),
      key_qpos=f(mj.key_qpos) if mj.nkey else jnp.zeros((0, mj.nq), dtype),
      key_qvel=f(mj.key_qvel) if mj.nkey else jnp.zeros((0, mj.nv), dtype),
      key_act=f(mj.key_act) if mj.nkey else jnp.zeros((0, mj.na), dtype),
      key_ctrl=f(mj.key_ctrl) if mj.nkey else jnp.zeros((0, mj.nu), dtype),
      opt=opt,
  )


def load_model(xml_path: str = None, xml_string: str = None,
               dtype=jnp.float32, mj_patch=None) -> Tuple[Model, Any]:
  """Load MJCF from path or string. Returns (Model, mujoco.MjModel).

  mj_patch: optional callable applied to the mujoco.MjModel before
  compilation to Model (e.g. filling procedural hfield_data that MJCF
  can only source from image files)."""
  import mujoco
  if xml_string is not None:
    mj = mujoco.MjModel.from_xml_string(xml_string)
  else:
    mj = mujoco.MjModel.from_xml_path(xml_path)
  if mj_patch is not None:
    mj_patch(mj)
  return put_model(mj, dtype=dtype), mj


def make_data(m: Model, dtype=jnp.float32) -> Data:
  """Fresh Data at qpos0 / zero velocity (analog of mj_makeData+mj_resetData)."""
  z = lambda *shape: jnp.zeros(shape, dtype=dtype)
  nuserdata = 16
  # mocap bodies initialize to their model frame (analog: mj_resetData)
  if m.nmocap:
    rows_pos, rows_quat = [], []
    for b in range(m.nbody):
      if m.body_mocapid[b] >= 0:
        rows_pos.append((m.body_mocapid[b], m.body_pos[b]))
        rows_quat.append((m.body_mocapid[b], m.body_quat[b]))
    mocap_pos = jnp.zeros((m.nmocap, 3), dtype=dtype)
    mocap_quat = jnp.zeros((m.nmocap, 4), dtype=dtype)
    for i, v in rows_pos:
      mocap_pos = mocap_pos.at[i].set(v.astype(dtype))
    for i, v in rows_quat:
      mocap_quat = mocap_quat.at[i].set(v.astype(dtype))
  else:
    mocap_pos = z(0, 3)
    mocap_quat = jnp.zeros((0, 4), dtype=dtype)
  return Data(
      time=jnp.asarray(0.0, dtype=dtype),
      qpos=jnp.asarray(m.qpos0, dtype=dtype),
      qvel=z(m.nv),
      act=z(m.na),
      ctrl=z(m.nu),
      qfrc_applied=z(m.nv),
      xfrc_applied=z(m.nbody, 6),
      mocap_pos=mocap_pos,
      mocap_quat=mocap_quat,
      userdata=z(nuserdata),
      xpos=z(m.nbody, 3),
      xquat=z(m.nbody, 4),
      xmat=z(m.nbody, 3, 3),
      xipos=z(m.nbody, 3),
      ximat=z(m.nbody, 3, 3),
      xanchor=z(m.njnt, 3),
      xaxis=z(m.njnt, 3),
      geom_xpos=z(m.ngeom, 3),
      geom_xmat=z(m.ngeom, 3, 3),
      site_xpos=z(m.nsite, 3),
      site_xmat=z(m.nsite, 3, 3),
      subtree_com=z(m.nbody, 3),
      cinert=z(m.nbody, 10),
      cdof=z(m.nv, 6),
      cvel=z(m.nbody, 6),
      cdof_dot=z(m.nv, 6),
      qM=z(m.nv, m.nv),
      qfrc_bias=z(m.nv),
      qfrc_passive=z(m.nv),
      qfrc_constraint=z(m.nv),
      actuator_length=z(m.nu),
      actuator_velocity=z(m.nu),
      actuator_force=z(m.nu),
      actuator_moment=z(m.nu, m.nv),
      qfrc_actuator=z(m.nv),
      qfrc_smooth=z(m.nv),
      qacc=z(m.nv),
      act_dot=z(m.na),
      ten_length=z(m.ntendon),
      ten_velocity=z(m.ntendon),
      ten_J=z(m.ntendon, m.nv),
      sensordata=z(0),
  )
