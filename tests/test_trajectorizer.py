"""Trajectorizer tests vs the oracle's direct replica of the reference loop,
covering diff-drive, omnidirectional, rotate-in-place, and termination."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from nav2_social_mpc_controller_tpu.core.config import TrajectorizerConfig, benchmark_social_config
from nav2_social_mpc_controller_tpu.core.types import PathInput
from nav2_social_mpc_controller_tpu.controller.trajectorizer import trajectorize
from nav2_social_mpc_controller_tpu.utils.scenarios import make_path, make_scenario
from parity import oracle


def _run_both(tcfg, path, pose):
    res = trajectorize(tcfg, path, jnp.asarray(pose))
    pts = np.asarray(path.points[: int(path.n)], np.float64)
    o = oracle.oracle_trajectorize(tcfg, pts, pose)
    return res, o


@pytest.mark.parametrize("omni", [False, True])
@pytest.mark.parametrize("kind", ["sine", "straight", "arc"])
def test_matches_oracle(omni, kind):
    cfg = benchmark_social_config()
    tcfg = dataclasses.replace(cfg.trajectorizer, omnidirectional=omni)
    rng = np.random.default_rng(11)
    path = make_path(30, 64, kind, rng, np.float64)
    pose = np.array([float(path.points[0, 0]), float(path.points[0, 1]) + 0.2, 0.3])
    res, o = _run_both(tcfg, path, pose)
    o_poses, o_cmds = o
    n = int(res.n_steps)
    assert n == len(o_cmds)
    np.testing.assert_allclose(np.asarray(res.poses[: n + 1]), o_poses, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.cmds[:n]), o_cmds, atol=1e-9)


def test_rotate_in_place_branch():
    tcfg = TrajectorizerConfig(desired_linear_vel=0.6, lookahead_dist=2.0, max_angular_vel=1.4,
                               time_step=0.05, max_time=1.5)
    # Path behind the robot: |dtheta| > pi/2 -> vx = 0, wz = +-max
    pts = np.zeros((16, 2))
    pts[:, 0] = -np.linspace(1.0, 4.0, 16)
    path = PathInput(points=pts, yaw=np.zeros(16), n=np.int32(16))
    pose = np.array([0.0, 0.0, 0.0])
    res, o = _run_both(tcfg, path, pose)
    assert float(res.cmds[0, 0]) == 0.0
    assert abs(float(res.cmds[0, 2])) == pytest.approx(1.4)
    np.testing.assert_allclose(np.asarray(res.cmds[: int(res.n_steps)]), o[1], atol=1e-9)


def test_terminates_at_goal():
    tcfg = TrajectorizerConfig(desired_linear_vel=0.6, lookahead_dist=0.4, max_angular_vel=1.4,
                               time_step=0.05, max_time=3.0)
    pts = np.zeros((8, 2))
    pts[:, 0] = np.linspace(0.0, 0.5, 8)  # goal 0.5 m ahead
    path = PathInput(points=pts, yaw=np.zeros(8), n=np.int32(8))
    pose = np.array([0.0, 0.0, 0.0])
    res, o = _run_both(tcfg, path, pose)
    n = int(res.n_steps)
    assert n < tcfg.max_steps  # stopped early at goal_dist <= 0.2
    assert n == len(o[1])
    # Padding holds the final pose
    np.testing.assert_allclose(
        np.asarray(res.poses[n + 1 :]), np.asarray(res.poses[n])[None, :].repeat(tcfg.max_steps - n, 0), atol=0
    )


def test_short_path_fails():
    tcfg = TrajectorizerConfig()
    pts = np.zeros((4, 2))
    path = PathInput(points=pts, yaw=np.zeros(4), n=np.int32(1))
    res = trajectorize(tcfg, path, jnp.asarray([0.0, 0.0, 0.0]))
    assert not bool(res.ok)
    assert int(res.n_steps) == 0
