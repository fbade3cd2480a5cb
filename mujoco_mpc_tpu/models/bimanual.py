"""Programmatic MJCF for bimanual (ALOHA-style) tasks.

Original two-arm workcell with capability parity to the reference's bimanual
tasks (mjpc/tasks/bimanual/{handover,insert,reorient}): two 4-dof arms with
pinch grippers facing each other across a table, plus a task object.
"""

from __future__ import annotations


def _arm(side: str, y: float, mirror: float) -> str:
  """4-dof arm (yaw, shoulder, elbow, wrist) + 2-finger pinch gripper."""
  return f"""
    <body name="{side}_base" pos="0 {y} 0.02">
      <geom name="{side}_base_geom" type="cylinder" size="0.045 0.02"
            mass="1.0"/>
      <body name="{side}_link1" pos="0 0 0.04">
        <joint name="{side}_yaw" axis="0 0 1" range="-150 150"/>
        <geom name="{side}_l1" size="0.03" fromto="0 0 0 0 0 0.08"
              mass="0.8"/>
        <body name="{side}_link2" pos="0 0 0.08">
          <joint name="{side}_shoulder" axis="1 0 0" range="-120 120"/>
          <geom name="{side}_l2" size="0.025"
                fromto="0 0 0 0 {-0.22 * mirror:.3f} 0.06" mass="0.7"/>
          <body name="{side}_link3" pos="0 {-0.22 * mirror:.3f} 0.06">
            <joint name="{side}_elbow" axis="1 0 0" range="-140 140"/>
            <geom name="{side}_l3" size="0.02"
                  fromto="0 0 0 0 {-0.2 * mirror:.3f} -0.04" mass="0.5"/>
            <body name="{side}_wrist" pos="0 {-0.2 * mirror:.3f} -0.04">
              <joint name="{side}_wrist_j" axis="1 0 0" range="-100 100"/>
              <geom name="{side}_wg" type="box" size="0.02 0.03 0.015"
                    mass="0.2"/>
              <site name="{side}_gripper_site" pos="0 {-0.05 * mirror:.3f} 0"/>
              <body name="{side}_finger_a" pos="0.018 {-0.03 * mirror:.3f} 0">
                <joint name="{side}_fa" type="slide" axis="1 0 0"
                       range="-0.028 0" damping="4"/>
                <geom name="{side}_fag" size="0.006"
                      fromto="0 0 0 0 {-0.04 * mirror:.3f} 0" mass="0.04"/>
                <geom name="{side}_fat" type="sphere" size="0.008"
                      pos="0 {-0.045 * mirror:.3f} 0" friction="1.8"
                      mass="0.01" contype="4" conaffinity="2"/>
                <site name="{side}_fa_site"
                      pos="0 {-0.045 * mirror:.3f} 0"/>
              </body>
              <body name="{side}_finger_b"
                    pos="-0.018 {-0.03 * mirror:.3f} 0">
                <joint name="{side}_fb" type="slide" axis="-1 0 0"
                       range="-0.028 0" damping="4"/>
                <geom name="{side}_fbg" size="0.006"
                      fromto="0 0 0 0 {-0.04 * mirror:.3f} 0" mass="0.04"/>
                <geom name="{side}_fbt" type="sphere" size="0.008"
                      pos="0 {-0.045 * mirror:.3f} 0" friction="1.8"
                      mass="0.01" contype="4" conaffinity="2"/>
                <site name="{side}_fb_site"
                      pos="0 {-0.045 * mirror:.3f} 0"/>
              </body>
            </body>
          </body>
        </body>
      </body>
    </body>"""


def _arm_actuators(side: str) -> str:
  return f"""
    <position name="{side}_yaw_m" joint="{side}_yaw" ctrlrange="-2.6 2.6"/>
    <position name="{side}_shoulder_m" joint="{side}_shoulder"
              ctrlrange="-2.0 2.0"/>
    <position name="{side}_elbow_m" joint="{side}_elbow"
              ctrlrange="-2.4 2.4"/>
    <position name="{side}_wrist_m" joint="{side}_wrist_j"
              ctrlrange="-1.7 1.7"/>
    <position name="{side}_fa_m" joint="{side}_fa" ctrlrange="-0.028 0"
              kp="25"/>
    <position name="{side}_fb_m" joint="{side}_fb" ctrlrange="-0.028 0"
              kp="25"/>"""


def bimanual_xml(model_name: str, objects: str, sensors: str) -> str:
  """Two facing arms + task-specific objects and cost sensors."""
  return f"""<mujoco model="{model_name}">
  <!-- Original bimanual workcell (generated, models/bimanual.py):
       capability parity with reference mjpc/tasks/bimanual/. -->
  <option timestep="0.004" gravity="0 0 -9.81" iterations="6"/>

  <custom>
    <numeric name="agent_planner" data="0"/>
    <numeric name="agent_horizon" data="0.5"/>
    <numeric name="agent_timestep" data="0.01"/>
    <numeric name="sampling_spline_points" data="4"/>
    <numeric name="sampling_exploration" data="0.12"/>
    <numeric name="sampling_trajectories" data="96"/>
  </custom>

  <default>
    <joint type="hinge" damping="1.5" armature="0.02" limited="true"/>
    <geom type="capsule" friction="0.9" contype="0" conaffinity="0"/>
    <position kp="35" ctrllimited="true"/>
  </default>

  <worldbody>
    <geom name="table" type="plane" size="1 1 0.1" friction="0.8"
          contype="1" conaffinity="1"/>
{objects}
{_arm('left', 0.35, 1.0)}
{_arm('right', -0.35, -1.0)}
  </worldbody>

  <actuator>{_arm_actuators('left')}{_arm_actuators('right')}
  </actuator>

  <sensor>
{sensors}
  </sensor>
</mujoco>
"""


HANDOVER_OBJECTS = """    <body name="target" mocap="true" pos="0.15 -0.25 0.25">
      <geom name="target_marker" type="sphere" size="0.012" contype="0"
            conaffinity="0" mass="0"/>
    </body>
    <body name="object" pos="0.12 0.22 0.025">
      <freejoint name="object_root"/>
      <geom name="object_geom" type="box" size="0.022 0.022 0.022"
            mass="0.06" friction="1.0" contype="2" conaffinity="3"/>
      <site name="object_site" pos="0 0 0"/>
    </body>"""

HANDOVER_SENSORS = """    <user name="Reach L" dim="3" user="2 0.1 0.0 0.5 0.01"/>
    <user name="Reach R" dim="3" user="2 0.1 0.0 0.5 0.01"/>
    <user name="Grasp" dim="1" user="0 0.05 0.0 0.5"/>
    <user name="Bring" dim="3" user="2 0.4 0.0 1.0 0.003"/>
    <framepos name="object_position" objtype="site" objname="object_site"/>"""

INSERT_OBJECTS = """    <body name="socket" pos="0 0 0">
      <geom name="sock_a" type="box" size="0.01 0.05 0.04"
            pos="0.045 0 0.04" contype="1" conaffinity="1"/>
      <geom name="sock_b" type="box" size="0.01 0.05 0.04"
            pos="-0.045 0 0.04" contype="1" conaffinity="1"/>
      <geom name="sock_c" type="box" size="0.035 0.01 0.04"
            pos="0 0.045 0.04" contype="1" conaffinity="1"/>
      <geom name="sock_d" type="box" size="0.035 0.01 0.04"
            pos="0 -0.045 0.04" contype="1" conaffinity="1"/>
      <site name="socket_site" pos="0 0 0.05"/>
    </body>
    <body name="peg" pos="0.15 0.2 0.028">
      <freejoint name="peg_root"/>
      <geom name="peg_geom" type="box" size="0.024 0.024 0.07"
            mass="0.08" friction="1.0" contype="2" conaffinity="3"/>
      <site name="peg_site" pos="0 0 0"/>
      <site name="peg_tip" pos="0 0 -0.07"/>
    </body>"""

INSERT_SENSORS = """    <user name="Reach L" dim="3" user="2 0.3 0.0 1.0 0.01"/>
    <user name="Reach R" dim="3" user="2 0.3 0.0 1.0 0.01"/>
    <user name="Grasp L" dim="1" user="0 0.4 0.0 1.0"/>
    <user name="Grasp R" dim="1" user="0 0.4 0.0 1.0"/>
    <user name="Lift" dim="1" user="6 0.7 0.0 1.0 0.05"/>
    <user name="Insert" dim="6" user="2 0.4 0.0 1.0 0.01"/>
    <framepos name="peg_position" objtype="site" objname="peg_site"/>"""

REORIENT_OBJECTS = """    <body name="goal" mocap="true" pos="0 0 0.3">
      <geom name="goal_marker" type="box" size="0.025 0.025 0.025"
            contype="0" conaffinity="0" mass="0"/>
    </body>
    <body name="object" pos="0 0 0.025">
      <freejoint name="object_root"/>
      <geom name="object_geom" type="box" size="0.025 0.025 0.025"
            mass="0.07" friction="1.0" contype="2" conaffinity="3"/>
      <site name="object_site" pos="0 0 0"/>
    </body>"""

REORIENT_SENSORS = """    <user name="Reach L" dim="3" user="2 0.1 0.0 0.5 0.05"/>
    <user name="Reach R" dim="3" user="2 0.1 0.0 0.5 0.05"/>
    <user name="Grasp L" dim="1" user="0 0.05 0.0 0.5"/>
    <user name="Grasp R" dim="1" user="0 0.05 0.0 0.5"/>
    <user name="Bring" dim="6" user="2 1.0 0.0 5.0 0.01"/>
    <framepos name="object_position" objtype="site" objname="object_site"/>"""
