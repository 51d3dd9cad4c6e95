"""Closed-loop behavioral tests: the controller driving a simulated robot
among SFM pedestrians (the framework's Gazebo-equivalent validation,
SURVEY.md section 4)."""

import numpy as np

from nav2_social_mpc_controller_tpu.core.config import (
    benchmark_obstacle_only_config,
    benchmark_social_config,
)
from nav2_social_mpc_controller_tpu.runtime.simulator import make_simulate
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario


def test_robot_progresses_along_plan():
    cfg = benchmark_obstacle_only_config()
    sc = make_scenario(cfg, seed=0, n_valid_people=0, path_kind="straight", with_obstacles=False)
    sim = make_simulate(cfg, n_ticks=40)
    res = sim(sc)
    start = np.asarray(sc.robot.pose[0:2])
    end = np.asarray(res.robot_traj[-1, 0:2])
    goal = np.asarray(sc.path.points[int(sc.path.n) - 1])
    assert np.linalg.norm(end - goal) < np.linalg.norm(start - goal) - 0.5, (
        "robot should close at least 0.5 m toward the goal in 2 s"
    )
    cmds = np.asarray(res.cmds)
    assert (cmds[:, 0] >= -1e-6).all() and (cmds[:, 0] <= 0.6 + 1e-6).all()
    assert (np.abs(cmds[:, 1]) <= 1.4 + 1e-6).all()
    assert (np.asarray(res.status) == 0).all()


def test_social_scenario_keeps_distance():
    cfg = benchmark_social_config()
    sc = make_scenario(cfg, seed=3, n_valid_people=3, path_kind="straight")
    sim = make_simulate(cfg, n_ticks=30)
    res = sim(sc)
    assert np.isfinite(np.asarray(res.robot_traj)).all()
    # the robot never collides with a pedestrian (0.2 m bodies)
    assert float(res.min_people_dist) > 0.2
