"""Interlocked 3x3x3 Rubik's cube MJCF generator + exact group action.

TPU-first redesign of the reference Rubik mechanism
(/root/reference/mjpc/tasks/rubik/cube_3x3x3.xml.patch + solve.cc:35-49):

* The PLANNING model is a real interlocked cube: a free-floating core,
  6 center cubelets on face hinges, and 20 edge/corner cubelets on ball
  joints whose rotation center is the cube center — face turns drag the
  ring cubelets through frictionless (condim=1) normal contact between
  chamfered-box hulls, and a misaligned layer blocks perpendicular
  turns, exactly the coupling the reference's cubelet model provides.
* Where the reference generates scramble goals by stepping a SECOND
  mjModel for 2000 host steps per move (solve.cc:140-199), the group
  action of a face turn on the cube's configuration is exact arithmetic:
  rotate the 8 ring-cubelet ball quaternions by +-90 deg about the face
  axis and advance the face hinge angle (apply_move). Scrambled states
  are composed moves — no transition model, no host stepping.

The cubelet-cubelet pair count (310 same-hull pairs) is what makes this
model expensive; physics/collision.py batches same-hull mesh pairs into
one vectorized narrowphase and physics/constraint.py keeps only the
deepest `contact capacity` candidates per sample (top-k selection), so
the constraint size is static and small regardless of pair count.
"""

from __future__ import annotations

import numpy as np

from mujoco_mpc_tpu.models.hands import (_chamfered_cube_vertices, _digit,
                                         _digit_actuators)

# face order and axes follow the reference (solve.cc residual (3):
# red/orange/blue/green/white/yellow = pX/nX/pY/nY/pZ/nZ)
FACE_NAMES = ('pX', 'nX', 'pY', 'nY', 'pZ', 'nZ')
FACE_AXES = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], dtype=np.float64)

PITCH = 0.019            # cubelet spacing; full cube ~5.7 cm
# cubelet half-size / chamfer / contact softness tuned so the cam
# transmission both DRIVES (a hinged center drags its ring through
# corner contact — sharper corners = stronger cams) and RELEASES
# (quarter-turns complete without wedging). Measured on the P-control
# unscramble harness: half 0.0086 + chamfer 0.0034 ratchets (the center
# spins past the ring); half 0.0090 + chamfer 0.0026 + stiff contacts
# wedges ~70% through a turn; 0.0088/0.0026 with solref (0.04, 1)
# completes consecutive quarter-turns and restores slot occupancy
CUBELET_HALF = 0.0088
CHAMFER = 0.0026
CUBELET_SOLREF = '0.05 1'
# center cubelets get a deeper, sharper profile than the ring: the face
# hinge drives its ring purely through corner cams, and symmetric
# profiles either ratchet (soft/round) or wedge (stiff/sharp); a large
# sharp center engaging a slightly rounder ring transmits without
# slipping while ring-ring clearance stays forgiving
CENTER_HALF = 0.0094
CENTER_CHAMFER = 0.0020


def ring_slots():
  """The 20 edge/corner slots (unit grid coords, excluding centers/core),
  in the fixed order the ball-joint bodies are declared."""
  slots = []
  for x in (-1, 0, 1):
    for y in (-1, 0, 1):
      for z in (-1, 0, 1):
        n_nonzero = (x != 0) + (y != 0) + (z != 0)
        if n_nonzero >= 2:   # edges (2) + corners (3)
          slots.append((x, y, z))
  return np.array(slots, dtype=np.float64)           # (20, 3)


def cube_body_xml(with_freejoint: bool = True, pos: str = '0 0 0.072',
                  damping: float = 0.002, armature: float = 0.0002,
                  frictionloss: float = 0.0005,
                  face_damping: float = 0.08) -> str:
  """The interlocked cube subtree (26 cubelets + core).

  face_damping: heavy damping on the 6 face hinges keeps layer turns
  quasistatic (~tau/d <= 1.5 rad/s) — torque bursts from knot-hold MPC
  policies otherwise slam a layer through the cam backlash fast enough
  to pop the center past its ring cubelets (ratcheting). Real cubes are
  friction-damped the same way."""
  slots = ring_slots()
  p = PITCH
  faces = []
  for name, ax in zip(FACE_NAMES, FACE_AXES):
    off = ax * p
    faces.append(f"""
      <body name="face_{name}" pos="0 0 0">
        <joint name="face_{name}" type="hinge"
               axis="{ax[0]:.0f} {ax[1]:.0f} {ax[2]:.0f}" limited="false"
               damping="{face_damping}" armature="{armature}"
               frictionloss="{frictionloss}"/>
        <geom name="cubelet_{name}" type="mesh" mesh="cubelet_c"
              pos="{off[0]:.5f} {off[1]:.5f} {off[2]:.5f}"
              mass="0.0025" condim="1" solref="{CUBELET_SOLREF}" contype="32" conaffinity="9"/>
      </body>""")
  rings = []
  for i, s in enumerate(slots):
    off = s * p
    rings.append(f"""
      <body name="ring_{i}" pos="0 0 0">
        <joint name="ring_{i}" type="ball" limited="false"
               damping="{damping}" armature="{armature}"
               frictionloss="{frictionloss}"/>
        <geom name="cubelet_r{i}" type="mesh" mesh="cubelet"
              pos="{off[0]:.5f} {off[1]:.5f} {off[2]:.5f}"
              mass="0.0025" condim="1" solref="{CUBELET_SOLREF}" contype="1" conaffinity="43"/>
      </body>""")
  joint = '<freejoint name="cube_root"/>' if with_freejoint else ''
  return f"""
    <body name="cube" pos="{pos}">
      {joint}
      <geom name="cube_core" type="sphere" size="0.006" mass="0.01"
            contype="0" conaffinity="0"/>
      <site name="cube_site" pos="0 0 0"/>{''.join(faces)}{''.join(rings)}
    </body>"""


def cube_assets() -> str:
  verts = _chamfered_cube_vertices(CUBELET_HALF, CHAMFER)
  cverts = _chamfered_cube_vertices(CENTER_HALF, CENTER_CHAMFER)
  return f"""
  <asset>
    <mesh name="cubelet" vertex="{verts}"/>
    <mesh name="cubelet_c" vertex="{cverts}"/>
  </asset>"""


def cube_only_xml(model_name: str = 'rubik_cube',
                  with_motors: bool = True) -> str:
  """Free-standing cube with direct face motors — the mechanism-test twin
  of the reference transition model (rubik/transition_model.xml.patch):
  MPC on face torques demonstrates interlocked unscrambling without the
  hand's grasp problem."""
  motors = ''
  if with_motors:
    motors = '\n'.join(
        f'    <motor name="m_{n}" joint="face_{n}" ctrlrange="-0.2 0.2"/>'
        for n in FACE_NAMES)
  return f"""<mujoco model="{model_name}">
  <option timestep="0.005" gravity="0 0 0" iterations="8"/>

  <custom>
    <numeric name="agent_planner" data="0"/>
    <numeric name="agent_horizon" data="0.25"/>
    <numeric name="agent_timestep" data="0.01"/>
    <numeric name="sampling_spline_points" data="3"/>
    <numeric name="sampling_exploration" data="0.6"/>
    <numeric name="sampling_trajectories" data="64"/>
    <numeric name="residual_Red goal" data="0 -3.2 3.2"/>
    <numeric name="residual_Orange goal" data="0 -3.2 3.2"/>
    <numeric name="residual_Blue goal" data="0 -3.2 3.2"/>
    <numeric name="residual_Green goal" data="0 -3.2 3.2"/>
    <numeric name="residual_White goal" data="0 -3.2 3.2"/>
    <numeric name="residual_Yellow goal" data="0 -3.2 3.2"/>
  </custom>
  {cube_assets()}
  <worldbody>{cube_body_xml(with_freejoint=False, pos='0 0 0')}
  </worldbody>
  <actuator>
{motors}
  </actuator>

  <sensor>
    <user name="Face Goals" dim="6" user="0 10.0 0.0 30.0"/>
    <user name="Cube Motion" dim="6" user="0 0.03 0.0 0.3"/>
    <user name="Actuation" dim="6" user="0 0.05 0.0 1.0"/>
  </sensor>
</mujoco>"""


def rubik3x3_xml(model_name: str, n_fingers: int = 4,
                 cube_qpos=None) -> str:
  """Hand + interlocked cube task model (reference: rubik/task.xml).

  cube_qpos: optional (93,) scrambled cube configuration
  (free 7 + hinges 6 + ring quats 80) baked into the home keyframe.
  """
  finger_span = 0.075
  digits, acts = [], []
  for i in range(n_fingers):
    y = (i - (n_fingers - 1) / 2) * (finger_span / max(n_fingers - 1, 1))
    digits.append(_digit(f'f{i}', f'0.045 {y:.4f} 0.01'))
    acts.append(_digit_actuators(f'f{i}'))
  digits.append(_digit('th', '-0.045 0.0 0.012', yaw_deg=180.0))
  acts.append(_digit_actuators('th'))

  if cube_qpos is None:
    cube_qpos = home_cube_qpos()
  cube_str = ' '.join(f'{v:.6f}' for v in np.asarray(cube_qpos))
  home_hand = ' '.join(['0.3 0.5 0.4'] * (n_fingers + 1))

  return f"""<mujoco model="{model_name}">
  <!-- iterations: planning-model Newton cap (docs/PERF.md "batched
       while_loop runs to the worst sample"); 5 measured sufficient on
       the interlocked cube (quadruped A/B found 4-6, round 4) -->
  <option timestep="0.004" gravity="0 0 -9.81" iterations="5"/>

  <custom>
    <numeric name="agent_planner" data="0"/>
    <!-- 0.25 s horizon matches the reference task
         (mjpc/tasks/rubik/task.xml:10-11) -->
    <numeric name="agent_horizon" data="0.25"/>
    <numeric name="agent_timestep" data="0.01"/>
    <numeric name="sampling_spline_points" data="3"/>
    <numeric name="sampling_exploration" data="0.25"/>
    <numeric name="sampling_trajectories" data="128"/>
    <!-- depth-cap the ~460 hand/floor/palm-vs-cubelet candidate points
         (physics/constraint._capped_point_rows): only dozens can touch
         at once; uncapped they materialize a (batch, ~1850, nv) facet
         Jacobian inside the contact Newton loop -->
    <numeric name="contact_point_cap" data="64"/>
    <!-- cubelet-cubelet condim-1 rows: ~40-80 active during a layer
         turn; 128 halves the dense block vs the 256 env default -->
    <numeric name="contact_cap" data="128"/>
    <numeric name="residual_Red goal" data="0 -3.2 3.2"/>
    <numeric name="residual_Orange goal" data="0 -3.2 3.2"/>
    <numeric name="residual_Blue goal" data="0 -3.2 3.2"/>
    <numeric name="residual_Green goal" data="0 -3.2 3.2"/>
    <numeric name="residual_White goal" data="0 -3.2 3.2"/>
    <numeric name="residual_Yellow goal" data="0 -3.2 3.2"/>
  </custom>
  {cube_assets()}
  <default>
    <joint type="hinge" damping="0.08" armature="0.002" limited="true"/>
    <geom type="capsule" friction="1.2" contype="0" conaffinity="0"/>
    <position kp="1.5" ctrllimited="true"/>
  </default>

  <worldbody>
    <geom name="floor" type="plane" size="1 1 0.1" pos="0 0 -0.25"
          friction="0.8" contype="8" conaffinity="11"/>
    <body name="goal" mocap="true" pos="0.3 0 0.1">
      <geom name="goal_marker" type="box" size="0.028 0.028 0.028"
            contype="0" conaffinity="0" mass="0"/>
    </body>
{cube_body_xml(with_freejoint=True, pos='0 0 0.072')}
    <body name="palm" pos="0 0 0">
      <geom name="palm_geom" type="box" size="0.05 0.05 0.015" mass="0.4"
            contype="16" conaffinity="35"/>
      <site name="palm_site" pos="0 0 0.02"/>{''.join(digits)}
    </body>
  </worldbody>

  <actuator>{''.join(acts)}
  </actuator>

  <sensor>
    <user name="Cube Position" dim="3" user="2 20.0 0.0 40.0 0.005"/>
    <user name="Cube Orientation" dim="3" user="0 1.0 0.0 10.0"/>
    <user name="Cube Velocity" dim="3" user="0 0.3 0.0 1.0"/>
    <user name="Actuation" dim="{3 * (n_fingers + 1)}" user="0 0.1 0.0 1.0"/>
    <user name="Face Goals" dim="6" user="0 10.0 0.0 30.0"/>
    <user name="Hand Posture" dim="{3 * (n_fingers + 1)}" user="0 0.05 0.0 0.5"/>
    <user name="Progress" dim="1" user="0 1.0 0.0 5.0"/>
    <framepos name="cube_position" objtype="site" objname="cube_site"/>
  </sensor>

  <keyframe>
    <key name="home" qpos="{cube_str} {home_hand}"
         ctrl="{home_hand}"/>
  </keyframe>
</mujoco>"""


# ---------------------------------------------------------------------------
# Exact group action (replaces the reference's host-stepped transition
# model, solve.cc:140-199)
# ---------------------------------------------------------------------------


def home_cube_qpos() -> np.ndarray:
  """Unscrambled cube configuration (93,): identity free joint pose at
  the in-hand height, zero hinges, identity ring quaternions."""
  q = np.zeros(93)
  q[:7] = [0., 0., 0.072, 1., 0., 0., 0.]
  for i in range(20):
    q[13 + 4 * i] = 1.0
  return q


def _quat_mul(a, b):
  w1, x1, y1, z1 = a
  w2, x2, y2, z2 = b
  return np.array([
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _axis_angle_quat(axis, angle):
  axis = np.asarray(axis, dtype=np.float64)
  axis = axis / np.linalg.norm(axis)
  h = 0.5 * angle
  return np.concatenate([[np.cos(h)], np.sin(h) * axis])


def _quat_rotmat(q):
  w, x, y, z = q
  return np.array([
      [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
      [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
      [2 * (x * z - w * y), 2 * (y * z + w * x),
       1 - 2 * (x * x + y * y)]])


def ring_slot_now(cube_qpos: np.ndarray, i: int) -> np.ndarray:
  """Current grid slot of ring cubelet i (rounded unit coords)."""
  q = cube_qpos[13 + 4 * i:13 + 4 * i + 4]
  s0 = ring_slots()[i]
  return np.round(_quat_rotmat(q) @ s0).astype(int)


def apply_move(cube_qpos: np.ndarray, face: int,
               direction: float) -> np.ndarray:
  """Exact 90-degree face turn on a (93,) cube configuration.

  Advances the face hinge by direction*pi/2 and rotates the 8 ring
  cubelets currently in that layer about the face axis. This is the
  group action the reference realizes by stepping its transition model
  (solve.cc:183-189); here it is closed-form, so scrambles and goal
  caches need no simulation.
  """
  out = np.array(cube_qpos, dtype=np.float64)
  axis = FACE_AXES[face]
  angle = direction * np.pi / 2.0
  out[7 + face] += angle
  rot = _axis_angle_quat(axis, angle)
  for i in range(20):
    if int(np.dot(ring_slot_now(out, i), axis)) == 1:
      adr = 13 + 4 * i
      q = _quat_mul(rot, out[adr:adr + 4])
      out[adr:adr + 4] = q / np.linalg.norm(q)
  return out


def scramble_states(n_moves: int, seed: int = 11):
  """Exact cube configurations along a scramble.

  Returns (states (n_moves+1, 93), cache (n_moves+1, 6), moves):
  states[k] = the exact group-action configuration after k moves,
  cache[k] = its face-hinge angles. Used by the unscramble transition's
  DETENT SNAP: when MPC has physically carried a layer to within the cam
  backlash of states[k] (faces aligned AND every ring cubelet in
  states[k]'s slot), the cube coordinates are projected onto states[k] —
  the role a real cube's alignment detents play, realized as host-side
  state surgery exactly like the reference's TransitionLocked qpos
  copies (solve.cc:167-189)."""
  rng = np.random.RandomState(seed)
  q = home_cube_qpos()
  states, cache, moves = [q.copy()], [np.array(q[7:13])], []
  for _ in range(n_moves):
    face = int(rng.randint(6))
    direction = float(rng.choice([-1.0, 1.0]))
    q = apply_move(q, face, direction)
    moves.append((face, direction))
    states.append(q.copy())
    cache.append(np.array(q[7:13]))
  return np.stack(states), np.stack(cache), moves


def ring_slot_table(states: np.ndarray) -> np.ndarray:
  """(K, 20, 3) int slot occupancy for a (K, 93) state array."""
  out = np.zeros((states.shape[0], 20, 3), dtype=np.int32)
  for k in range(states.shape[0]):
    for i in range(20):
      out[k, i] = ring_slot_now(states[k], i)
  return out


def scramble(n_moves: int, seed: int = 11):
  """Compose random face turns; returns (cube_qpos (93,),
  goal_cache (n_moves+1, 6) of hinge-angle snapshots, moves list).
  goal_cache[k] = face angles after k moves — identical semantics to the
  reference's goal cache (solve.cc:163-199), unscrambled by walking the
  cache backwards."""
  rng = np.random.RandomState(seed)
  q = home_cube_qpos()
  cache = [np.array(q[7:13])]
  moves = []
  for _ in range(n_moves):
    face = int(rng.randint(6))
    direction = float(rng.choice([-1.0, 1.0]))
    q = apply_move(q, face, direction)
    moves.append((face, direction))
    cache.append(np.array(q[7:13]))
  return q, np.stack(cache), moves
