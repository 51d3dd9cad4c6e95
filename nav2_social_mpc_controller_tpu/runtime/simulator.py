"""Closed-loop simulator: the framework's replacement for the reference's
Gazebo validation loop (SURVEY.md section 4 — the reference was validated by
driving a simulated Jackal with the controller at 20 Hz).

Each tick: the controller produces a command from the current world state,
the robot integrates it for one control period, and pedestrians advance
under the Social Force Model (reacting to the robot). Runs fully jitted as a
lax.scan over ticks; vmaps over scenario batches.

This is both a demo and the behavioral test harness: tests assert the robot
makes progress along the plan, respects velocity bounds, and keeps social
distance from pedestrians.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nav2_social_mpc_controller_tpu.core.config import SocialMPCConfig
from nav2_social_mpc_controller_tpu.core.types import AgentsState, Scenario
from nav2_social_mpc_controller_tpu.controller.controller import make_carry, step
from nav2_social_mpc_controller_tpu.models import sfm
from nav2_social_mpc_controller_tpu.models.motion import integrate_step
from nav2_social_mpc_controller_tpu.world.grid import esdf_nearest_obstacle_diff


class SimResult(NamedTuple):
    robot_traj: jnp.ndarray  # (T+1, 3) robot poses
    people_traj: jnp.ndarray  # (T+1, N, 6)
    cmds: jnp.ndarray  # (T, 2) executed [v, w]
    status: jnp.ndarray  # (T,) int32 controller status per tick
    min_people_dist: jnp.ndarray  # () closest robot-pedestrian approach
    goal_dist: jnp.ndarray  # () final distance to the plan's last point


def _advance_people(cfg: SocialMPCConfig, people: AgentsState, robot_pose, robot_speed, esdf, dt):
    """One SFM step for the simulated pedestrians (robot as social agent).

    Pedestrians feel all three forces of the controller's own world model —
    desired + social + obstacle (sfm.hpp:205-235, 462-485) — so the
    Gazebo-replacement harness is no more forgiving than the SFM world the
    controller assumes during people projection (models/sfm.py:299-309)."""
    st = people.state
    valid = people.valid
    pos = st[:, 0:2]
    yaw = st[:, 2]
    lv = st[:, 4]
    vel = jnp.stack([lv * jnp.cos(yaw), lv * jnp.sin(yaw)], axis=-1)
    goal = pos + vel * 10.0  # keep walking their way

    r_vel = jnp.stack(
        [robot_speed[0] * jnp.cos(robot_pose[2]), robot_speed[0] * jnp.sin(robot_pose[2])]
    )
    all_pos = jnp.concatenate([pos, robot_pose[None, 0:2]], axis=0)
    all_vel = jnp.concatenate([vel, r_vel[None, :]], axis=0)
    all_valid = jnp.concatenate([valid, jnp.ones((1,), bool)])
    social = sfm.pairwise_social_force(all_pos, all_vel, all_valid, sfm.DEFAULT_PARAMS)[:-1]

    desired = jnp.full(valid.shape, cfg.people_desired_vel, st.dtype)
    f_des, _ = sfm.desired_force(
        pos, vel, goal, valid, cfg.goal_radius, desired, sfm.DEFAULT_PARAMS
    )
    obs_entry, obs_in = esdf_nearest_obstacle_diff(
        esdf.distances, esdf.indexes, esdf.origin, esdf.resolution, pos
    )
    f_obs = sfm.obstacle_force(
        pos, obs_entry, obs_in & esdf.valid & valid, cfg.people_radius, sfm.DEFAULT_PARAMS
    )
    pos_n, vel_n, yaw_n, lv_n, av_n, _ = sfm.sfm_update(
        pos, vel, yaw, f_des + social + f_obs, desired, goal, valid, cfg.goal_radius, dt
    )
    new = jnp.stack(
        [pos_n[:, 0], pos_n[:, 1], yaw_n, st[:, 3], lv_n, av_n], axis=-1
    )
    return AgentsState(state=jnp.where(valid[:, None], new, st))


def simulate(cfg: SocialMPCConfig, scenario: Scenario, n_ticks: int, control_period: float = 0.05):
    """Run the closed loop for n_ticks. Returns SimResult. Jittable."""

    ctrl_step = functools.partial(step, cfg)
    carry0 = make_carry(cfg, dtype=scenario.robot.pose.dtype)

    def tick(sim_state, _):
        scen, ctrl_carry = sim_state
        cmd, aux, ctrl_carry = ctrl_step(scen, ctrl_carry)

        pose = scen.robot.pose
        x, y, th = integrate_step(
            pose[0], pose[1], pose[2], cmd.linear_x, cmd.linear_y, cmd.angular_z, control_period
        )
        new_pose = jnp.stack([x, y, th])
        new_speed = jnp.stack([cmd.linear_x, cmd.angular_z])

        people = _advance_people(
            cfg, scen.people, pose, scen.robot.speed, scen.esdf, control_period
        )
        scen = scen._replace(
            robot=scen.robot._replace(pose=new_pose, speed=new_speed), people=people
        )

        pd = jnp.linalg.norm(
            people.state[:, 0:2] - new_pose[None, 0:2], axis=-1
        )
        pd = jnp.min(jnp.where(people.valid, pd, jnp.inf))
        out = (new_pose, people.state, jnp.stack([cmd.linear_x, cmd.angular_z]), aux.status, pd)
        return (scen, ctrl_carry), out

    (final_scen, _), (poses, people_t, cmds, status, pd) = jax.lax.scan(
        tick, (scenario, carry0), None, length=n_ticks
    )

    robot_traj = jnp.concatenate([scenario.robot.pose[None, :], poses], axis=0)
    people_traj = jnp.concatenate([scenario.people.state[None], people_t], axis=0)
    last = jnp.clip(scenario.path.n - 1, 0, scenario.path.points.shape[0] - 1)
    goal = scenario.path.points[last]
    goal_dist = jnp.linalg.norm(robot_traj[-1, 0:2] - goal)
    return SimResult(
        robot_traj=robot_traj,
        people_traj=people_traj,
        cmds=cmds,
        status=status,
        min_people_dist=jnp.min(pd),
        goal_dist=goal_dist,
    )


def make_simulate(cfg: SocialMPCConfig, n_ticks: int, control_period: float = 0.05):
    return jax.jit(
        functools.partial(simulate, cfg, n_ticks=n_ticks, control_period=control_period)
    )
