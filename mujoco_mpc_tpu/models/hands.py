"""Programmatic MJCF generators for dexterous-hand tasks.

Original primitive-geometry hands with capability parity to the reference's
hand tasks (mjpc/tasks/shadow_reorient/, mjpc/tasks/allegro/,
mjpc/tasks/rubik/): an upward-facing palm with `n_fingers` digits plus an
opposing thumb, and a free cube to reorient. Generated as a string so the
digit count is a parameter instead of hand-maintained XML.
"""

from __future__ import annotations


def _digit(name: str, pos: str, yaw_deg: float = 0.0) -> str:
  """One 3-joint digit: MCP pitch, PIP, DIP; spherical fingertip."""
  return f"""
      <body name="{name}_base" pos="{pos}" euler="0 0 {yaw_deg}">
        <joint name="{name}_mcp" axis="0 -1 0" range="-20 90"/>
        <geom name="{name}_prox" size="0.009" fromto="0 0 0 0.032 0 0"
              mass="0.03" contype="4" conaffinity="2"/>
        <body name="{name}_mid" pos="0.032 0 0">
          <joint name="{name}_pip" axis="0 -1 0" range="0 100"/>
          <geom name="{name}_midg" size="0.008" fromto="0 0 0 0.028 0 0"
                mass="0.02" contype="4" conaffinity="2"/>
          <body name="{name}_tip" pos="0.028 0 0">
            <joint name="{name}_dip" axis="0 -1 0" range="0 90"/>
            <geom name="{name}_distg" size="0.007" fromto="0 0 0 0.02 0 0"
                  mass="0.012" contype="4" conaffinity="2"/>
            <geom name="{name}_tipg" type="sphere" size="0.009"
                  pos="0.022 0 0" friction="1.8" mass="0.006"
                  contype="12" conaffinity="10"/>
            <site name="{name}_site" pos="0.022 0 0"/>
          </body>
        </body>
      </body>"""


def _digit_actuators(name: str) -> str:
  return f"""
    <position name="{name}_mcp_m" joint="{name}_mcp"
              ctrlrange="-0.35 1.57"/>
    <position name="{name}_pip_m" joint="{name}_pip" ctrlrange="0 1.74"/>
    <position name="{name}_dip_m" joint="{name}_dip" ctrlrange="0 1.57"/>"""


def _chamfered_cube_vertices(s: float, c: float) -> str:
  """Corner-truncated cube vertex list (24 verts): each corner of the
  box [-s, s]^3 is cut by insetting one coordinate by the chamfer c —
  the generated-mesh analog of the reference's rounded cube asset
  (mjpc/tasks/shadow_reorient model meshes)."""
  verts = []
  for sx in (-1, 1):
    for sy in (-1, 1):
      for sz in (-1, 1):
        verts.append((sx * (s - c), sy * s, sz * s))
        verts.append((sx * s, sy * (s - c), sz * s))
        verts.append((sx * s, sy * s, sz * (s - c)))
  return ' '.join(f'{x:.5f} {y:.5f} {z:.5f}' for x, y, z in verts)


def hand_xml(model_name: str, n_fingers: int, cube_size: float = 0.03,
             extra_custom: str = '', sensors: str = None,
             mesh_cube: bool = False) -> str:
  """Palm-up hand with n_fingers digits + thumb, free cube above the palm.

  mesh_cube=True swaps the box cube for a chamfered-cube mesh asset so
  the task exercises the convex mesh-hull collision path end-to-end."""
  finger_span = 0.075
  digits, acts = [], []
  for i in range(n_fingers):
    y = (i - (n_fingers - 1) / 2) * (finger_span / max(n_fingers - 1, 1))
    name = f'f{i}'
    digits.append(_digit(name, f'0.045 {y:.4f} 0.01'))
    acts.append(_digit_actuators(name))
  # opposing thumb from the palm's -x edge
  digits.append(_digit('th', '-0.045 0.0 0.012', yaw_deg=180.0))
  acts.append(_digit_actuators('th'))
  nu = 3 * (n_fingers + 1)

  if sensors is None:
    sensors = f"""
    <user name="Cube Position" dim="3" user="2 20.0 0.0 40.0 0.005"/>
    <user name="Cube Orientation" dim="3" user="0 3.0 0.0 10.0"/>
    <user name="Cube Velocity" dim="6" user="0 0.3 0.0 1.0"/>
    <user name="Actuation" dim="{nu}" user="0 0.1 0.0 1.0"/>"""

  if mesh_cube:
    chamfer = cube_size * 0.25
    asset = (f'\n  <asset>\n    <mesh name="cube_mesh" vertex='
             f'"{_chamfered_cube_vertices(cube_size, chamfer)}"/>\n'
             '  </asset>\n')
    cube_geom = ('<geom name="cube_geom" type="mesh" mesh="cube_mesh" '
                 'mass="0.07" friction="1.0" contype="2" conaffinity="3"/>')
  else:
    asset = ''
    cube_geom = (f'<geom name="cube_geom" type="box" size="{cube_size} '
                 f'{cube_size} {cube_size}" mass="0.07" friction="1.0" '
                 'contype="2" conaffinity="3"/>')

  return f"""<mujoco model="{model_name}">
  <!-- Original dexterous hand (generated, models/hands.py): capability
       parity with the reference hand tasks on an original model. -->
  <option timestep="0.004" gravity="0 0 -9.81" iterations="8"/>{asset}

  <custom>
    <numeric name="agent_planner" data="0"/>
    <numeric name="agent_horizon" data="0.3"/>
    <numeric name="agent_timestep" data="0.01"/>
    <numeric name="sampling_spline_points" data="3"/>
    <numeric name="sampling_exploration" data="0.25"/>
    <numeric name="sampling_trajectories" data="128"/>{extra_custom}
  </custom>

  <default>
    <joint type="hinge" damping="0.08" armature="0.002" limited="true"/>
    <geom type="capsule" friction="1.2" contype="0" conaffinity="0"/>
    <position kp="1.5" ctrllimited="true"/>
  </default>

  <worldbody>
    <geom name="floor" type="plane" size="1 1 0.1" pos="0 0 -0.25"
          friction="0.8" contype="1" conaffinity="1"/>
    <body name="goal" mocap="true" pos="0.3 0 0.1">
      <geom name="goal_marker" type="box"
            size="{cube_size} {cube_size} {cube_size}" contype="0"
            conaffinity="0" mass="0"/>
    </body>

    <body name="cube" pos="0 0 {cube_size + 0.035:.4f}">
      <freejoint name="cube_root"/>
      {cube_geom}
      <site name="cube_site" pos="0 0 0"/>
    </body>

    <body name="palm" pos="0 0 0">
      <geom name="palm_geom" type="box" size="0.05 0.05 0.015" mass="0.4"
            contype="4" conaffinity="2"/>
      <site name="palm_site" pos="0 0 0.02"/>{''.join(digits)}
    </body>
  </worldbody>

  <actuator>{''.join(acts)}
  </actuator>

  <sensor>{sensors}
    <framepos name="cube_position" objtype="site" objname="cube_site"/>
  </sensor>
</mujoco>
"""
