"""Host-wrapper tests: SocialMPCController lifecycle and the stored-plan
pruning side effect the reference applies every tick
(path_handler.cpp:100 erases the passed poses from the stored plan)."""

import numpy as np

from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.core.types import PathInput, RobotState
from nav2_social_mpc_controller_tpu.controller.controller import (
    SocialMPCController,
    prune_plan,
)
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario


def _long_straight_plan(cfg, length_m=12.0, n=None):
    n = n or cfg.max_path_points
    pts = np.zeros((cfg.max_path_points, 2), np.float32)
    pts[:, 0] = np.linspace(0.0, length_m, cfg.max_path_points)
    return PathInput(
        points=pts, yaw=np.zeros(cfg.max_path_points, np.float32), n=np.int32(n)
    )


def test_prune_plan_shifts_and_shrinks():
    cfg = benchmark_social_config()
    plan = _long_straight_plan(cfg)
    n0 = int(plan.n)
    pruned = prune_plan(plan, 10)
    assert int(pruned.n) == n0 - 10
    np.testing.assert_allclose(
        np.asarray(pruned.points[: n0 - 10]), np.asarray(plan.points[10:n0])
    )
    # Tail padding holds the last valid pose (safe for downstream gathers).
    np.testing.assert_allclose(
        np.asarray(pruned.points[n0 - 10 :]),
        np.broadcast_to(plan.points[n0 - 1], (10 + plan.points.shape[0] - n0, 2)),
    )
    # Never erases the whole plan; no-ops are identity.
    assert int(prune_plan(plan, n0 + 50).n) == 1
    assert prune_plan(plan, 0) is plan


def test_multi_tick_plan_pruning_long_plan():
    """Drive several ticks along a 12 m plan: the stored plan must shrink as
    the robot advances (the reference's erase side effect), keeping the
    max_robot_pose_search_dist window anchored near the robot instead of the
    stale plan head."""
    cfg = benchmark_social_config()
    ctrl = SocialMPCController(cfg)
    ctrl.activate()

    sc = make_scenario(cfg, seed=0, n_valid_people=0)
    plan = _long_straight_plan(cfg)
    ctrl.set_plan(plan)

    pose = np.array([0.0, 0.0, 0.0], np.float32)
    starts = [0]
    for _ in range(6):
        sc_t = sc._replace(
            robot=RobotState(pose=pose, speed=np.array([0.3, 0.0], np.float32))
        )
        cmd, aux = ctrl.compute_velocity_commands(sc_t)
        assert np.isfinite(float(cmd.linear_x))
        starts.append(int(aux.plan_start_index))
        # Teleport the robot 1.2 m down the plan to force passed poses.
        pose = pose + np.array([1.2, 0.0, 0.0], np.float32)

    # The erase is now the in-graph cursor (ControllerCarry.plan_start): it
    # must advance monotonically and end well past the stale plan head.
    assert all(b >= a for a, b in zip(starts, starts[1:])), starts
    assert starts[-1] > starts[1], f"prune cursor never advanced: {starts}"
    # The pruned head must track the robot: the plan point at the cursor
    # lies within the search distance of the *previous* robot x.
    head_x = float(np.asarray(plan.points)[starts[-1], 0])
    assert head_x > 1.0, f"plan head did not advance: {head_x}"
