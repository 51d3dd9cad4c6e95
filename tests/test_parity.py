"""Golden parity tests: the JAX framework vs the independent NumPy oracle
(parity/oracle.py), in float64, per SURVEY.md section 4b. The oracle
re-integrates rollouts per residual exactly like the reference
(computeUpdatedStateRedux) and differentiates with exact dual numbers
(Ceres-jet semantics, parity/jets.py), so agreement here validates both the
shared-rollout restructuring and the analytic/AD derivative path."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.core.types import ControllerCarry
from nav2_social_mpc_controller_tpu.controller.optimize import (
    ProblemDims,
    build_residual_fn,
    format_to_optimize,
)
from nav2_social_mpc_controller_tpu.controller.trajectorizer import trajectorize
from nav2_social_mpc_controller_tpu.models.sfm import project_people
from nav2_social_mpc_controller_tpu.solver.lm import LMConfig, lm_solve
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario
from parity import oracle


@pytest.fixture(scope="module")
def cfg():
    return benchmark_social_config()


def _scenario64(cfg, seed=0, n_people=3):
    return make_scenario(cfg, seed=seed, n_valid_people=n_people, dtype=np.float64)


def _valid_path_pts(sc):
    n = int(sc.path.n)
    return np.asarray(sc.path.points[:n], dtype=np.float64)


def test_trajectorize_parity(cfg):
    for seed in range(3):
        sc = _scenario64(cfg, seed=seed)
        res = trajectorize(cfg.trajectorizer, sc.path, jnp.asarray(sc.robot.pose))
        o = oracle.oracle_trajectorize(cfg.trajectorizer, _valid_path_pts(sc), sc.robot.pose)
        assert o is not None
        o_poses, o_cmds = o
        n = int(res.n_steps)
        assert n == len(o_cmds), f"step count mismatch seed {seed}"
        np.testing.assert_allclose(
            np.asarray(res.poses[: n + 1]), np.asarray(o_poses), atol=1e-9
        )
        np.testing.assert_allclose(np.asarray(res.cmds[:n]), np.asarray(o_cmds), atol=1e-9)


def _prep_problem(cfg, seed=0, n_people=3):
    sc = _scenario64(cfg, seed=seed, n_people=n_people)
    dims = ProblemDims.from_config(cfg)
    res = trajectorize(cfg.trajectorizer, sc.path, jnp.asarray(sc.robot.pose))
    carry = ControllerCarry(
        prev_path=jnp.zeros((dims.maxsize, 3), jnp.float64),
        prev_cmds=jnp.zeros((dims.maxsize, 2), jnp.float64),
        prev_n=jnp.zeros((), jnp.int32),
    )
    rows, n_rows = format_to_optimize(
        cfg, dims, res.poses, res.cmds, res.n_steps, jnp.asarray(sc.robot.speed), carry
    )
    return sc, dims, res, rows, n_rows


def test_format_parity(cfg):
    sc, dims, res, rows, n_rows = _prep_problem(cfg)
    o = oracle.oracle_trajectorize(cfg.trajectorizer, _valid_path_pts(sc), sc.robot.pose)
    o_rows = oracle.oracle_format(cfg, o[0], o[1], sc.robot.speed, None, None)
    n = int(n_rows)
    assert n == len(o_rows)
    np.testing.assert_allclose(np.asarray(rows[:n]), o_rows, atol=1e-9)


def test_project_people_parity(cfg):
    sc, dims, res, rows, n_rows = _prep_problem(cfg, seed=2)
    proj = project_people(
        jnp.asarray(sc.people.state, jnp.float64),
        rows,
        n_rows,
        jnp.asarray(sc.esdf.distances, jnp.float64),
        jnp.asarray(sc.esdf.indexes),
        jnp.asarray(sc.esdf.origin, jnp.float64),
        jnp.asarray(sc.esdf.resolution, jnp.float64),
        jnp.asarray(sc.esdf.valid),
        maxtime=cfg.trajectorizer.max_time,
        dt=cfg.trajectorizer.time_step,
        people_desired_vel=cfg.people_desired_vel,
        people_radius=cfg.people_radius,
        robot_desired_vel=cfg.robot_sfm_desired_vel,
        robot_radius=cfg.robot_sfm_radius,
        goal_radius=cfg.goal_radius,
    )
    n = int(n_rows)
    o_rows = np.asarray(rows[:n], dtype=np.float64)
    esdf = (
        np.asarray(sc.esdf.distances, np.float64),
        np.asarray(sc.esdf.indexes),
        np.asarray(sc.esdf.origin, np.float64),
        float(sc.esdf.resolution),
    )
    o_proj = oracle.oracle_project_people(cfg, np.asarray(sc.people.state, np.float64), o_rows, esdf)
    assert len(o_proj) == n
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(proj[i]), o_proj[i], atol=1e-8, err_msg=f"step {i}"
        )


def _costmap_tuple(sc):
    return (
        np.asarray(sc.costmap.data, np.float64),
        np.asarray(sc.costmap.origin, np.float64),
        float(sc.costmap.resolution),
    )


def _residual_setup(cfg, seed=0, n_people=3):
    sc, dims, res, rows, n_rows = _prep_problem(cfg, seed=seed, n_people=n_people)
    proj = project_people(
        jnp.asarray(sc.people.state, jnp.float64),
        rows,
        n_rows,
        jnp.asarray(sc.esdf.distances, jnp.float64),
        jnp.asarray(sc.esdf.indexes),
        jnp.asarray(sc.esdf.origin, jnp.float64),
        jnp.asarray(sc.esdf.resolution, jnp.float64),
        jnp.asarray(sc.esdf.valid),
        maxtime=cfg.trajectorizer.max_time,
        dt=cfg.trajectorizer.time_step,
    )
    people_present = jnp.any(jnp.asarray(sc.people.state)[:, 3] != -1.0)
    rfn = build_residual_fn(cfg, dims, rows, n_rows, proj, people_present, sc.costmap)
    n = int(n_rows)
    o_proj = [np.asarray(p, np.float64) for p in proj[:n]]
    return sc, dims, rows, n_rows, rfn, o_proj, bool(people_present)


def test_residual_vector_parity(cfg):
    sc, dims, rows, n_rows, rfn, o_proj, present = _residual_setup(cfg, seed=1)
    rng = np.random.default_rng(7)
    for _ in range(3):
        u = rng.uniform([0.0, -1.4], [0.6, 1.4], size=(dims.n_blocks, 2))
        r_jax = np.asarray(rfn(jnp.asarray(u.reshape(-1), jnp.float64)))
        r_oracle = oracle.oracle_residuals(
            cfg,
            np.asarray(rows[: int(n_rows)], np.float64),
            o_proj,
            present,
            _costmap_tuple(sc),
            u,
        )
        assert r_jax.shape == r_oracle.shape
        np.testing.assert_allclose(r_jax, r_oracle, atol=1e-8)


def test_jacobian_matches_finite_difference(cfg):
    sc, dims, rows, n_rows, rfn, o_proj, present = _residual_setup(cfg, seed=3)
    u0 = np.asarray(rows[: dims.n_blocks, 4:6], np.float64).reshape(-1)
    J = np.asarray(jax.jacfwd(rfn)(jnp.asarray(u0)))
    eps = 1e-7
    for k in range(len(u0)):
        e = np.zeros_like(u0)
        e[k] = eps
        fd = (np.asarray(rfn(jnp.asarray(u0 + e))) - np.asarray(rfn(jnp.asarray(u0 - e)))) / (
            2 * eps
        )
        np.testing.assert_allclose(J[:, k], fd, atol=1e-5)


def test_full_solve_cmd_parity(cfg):
    """North-star parity check (BASELINE.md): first cmd_vel within 1e-3 of
    the oracle's Ceres-semantics LM solve."""
    sc, dims, rows, n_rows, rfn, o_proj, present = _residual_setup(cfg, seed=4)
    opt = cfg.optimizer
    n_bounded = dims.horizon // dims.block_length
    lo = np.where(
        (np.arange(dims.n_blocks) < n_bounded)[:, None], [[opt.v_min, opt.w_min]], -np.inf
    ).reshape(-1)
    hi = np.where(
        (np.arange(dims.n_blocks) < n_bounded)[:, None], [[opt.v_max, opt.w_max]], np.inf
    ).reshape(-1)
    u0 = np.clip(np.asarray(rows[: dims.n_blocks, 4:6], np.float64).reshape(-1), lo, hi)

    lm_cfg = LMConfig(
        max_iterations=opt.max_iterations,
        fn_tol=opt.fn_tol,
        gradient_tol=opt.gradient_tol,
        param_tol=opt.param_tol,
    )
    u_jax, stats = lm_solve(rfn, jnp.asarray(u0), jnp.asarray(lo), jnp.asarray(hi), lm_cfg)

    def oracle_rfn(u):
        return oracle.oracle_residuals(
            cfg,
            np.asarray(rows[: int(n_rows)], np.float64),
            o_proj,
            present,
            _costmap_tuple(sc),
            u.reshape(dims.n_blocks, 2),
        )

    u_oracle, c_oracle = oracle.oracle_lm_solve(
        oracle_rfn, u0, lo, hi, opt.max_iterations, opt.fn_tol, opt.gradient_tol, opt.param_tol
    )
    assert bool(stats.usable)
    # The executed command is block 0:
    np.testing.assert_allclose(np.asarray(u_jax[:2]), u_oracle[:2], atol=1e-3)
    # Costs should agree to solver tolerance:
    c_jax = float(stats.final_cost)
    assert abs(c_jax - c_oracle) <= 1e-3 * max(1.0, c_oracle)


_SWEEP_CONFIGS = ["social3", "social2", "obstacle0", "omni6", "stress36"]


def _sweep_cfg(name):
    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_obstacle_only_config,
        benchmark_omni_6agents_config,
        benchmark_stress_h36_config,
    )

    return {
        "social3": (benchmark_social_config(), 3),
        "social2": (benchmark_social_config(), 2),
        "obstacle0": (benchmark_obstacle_only_config(), 0),
        "omni6": (benchmark_omni_6agents_config(), 6),
        "stress36": (benchmark_stress_h36_config(), 3),
    }[name]


@pytest.mark.parametrize("name", list(_SWEEP_CONFIGS))
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
def test_residual_parity_sweep(name, seed):
    """Residual-vector parity across every benchmark config x 10 seeds
    (VERDICT r1 item 3): omnidirectional control law, obstacle-only
    weights, H=36 stress horizon, and 0/2/3/6-agent scenarios all match the
    oracle bit-for-bit at 1e-8 in float64."""
    c, n_people = _sweep_cfg(name)
    sc, dims, rows, n_rows, rfn, o_proj, present = _residual_setup(
        c, seed=seed, n_people=n_people
    )
    assert present == (n_people > 0)
    rng = np.random.default_rng(100 + seed)
    u = rng.uniform([0.0, -1.4], [0.6, 1.4], size=(dims.n_blocks, 2))
    r_jax = np.asarray(rfn(jnp.asarray(u.reshape(-1), jnp.float64)))
    r_oracle = oracle.oracle_residuals(
        c,
        np.asarray(rows[: int(n_rows)], np.float64),
        o_proj,
        present,
        _costmap_tuple(sc),
        u,
    )
    assert r_jax.shape == r_oracle.shape
    np.testing.assert_allclose(r_jax, r_oracle, atol=1e-8)


@pytest.mark.parametrize("name", ["omni6", "obstacle0"])
def test_trajectorize_parity_sweep(name):
    """Trajectorizer parity for the omnidirectional control law
    (path_trajectorizer.cpp:190-194) and the obstacle-only config."""
    c, n_people = _sweep_cfg(name)
    for seed in range(5):
        sc = make_scenario(c, seed=seed, n_valid_people=n_people, dtype=np.float64)
        res = trajectorize(c.trajectorizer, sc.path, jnp.asarray(sc.robot.pose))
        o = oracle.oracle_trajectorize(c.trajectorizer, _valid_path_pts(sc), sc.robot.pose)
        n = int(res.n_steps)
        assert n == len(o[1]), f"step count mismatch seed {seed}"
        np.testing.assert_allclose(np.asarray(res.poses[: n + 1]), np.asarray(o[0]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(res.cmds[:n]), np.asarray(o[1]), atol=1e-9)


def test_short_path_dynamic_horizon_parity(cfg):
    """Goal-approach regime: n_vel < control_horizon engages the reference's
    dynamic horizon shrink (optimizer.cpp:248-249); residuals must still
    match the oracle exactly."""
    import numpy as np
    from nav2_social_mpc_controller_tpu.core.types import PathInput, RobotState

    sc = _scenario64(cfg, seed=5, n_people=2)
    # 0.55 m straight path -> trajectorizer stops after ~12 steps
    pts = np.zeros((cfg.max_path_points, 2))
    pts[:, 0] = np.linspace(0.0, 0.55, cfg.max_path_points)
    path = PathInput(points=pts, yaw=np.zeros(cfg.max_path_points), n=np.int32(cfg.max_path_points))
    sc = sc._replace(
        path=path,
        robot=RobotState(pose=np.array([0.0, 0.0, 0.0]), speed=np.array([0.2, 0.0])),
    )

    dims = ProblemDims.from_config(cfg)
    res = trajectorize(cfg.trajectorizer, sc.path, jnp.asarray(sc.robot.pose))
    n_steps = int(res.n_steps)
    assert 1 < n_steps < cfg.optimizer.control_horizon, f"want short path, got {n_steps} steps"

    carry = ControllerCarry(
        prev_path=jnp.zeros((dims.maxsize, 3), jnp.float64),
        prev_cmds=jnp.zeros((dims.maxsize, 2), jnp.float64),
        prev_n=jnp.zeros((), jnp.int32),
    )
    rows, n_rows = format_to_optimize(
        cfg, dims, res.poses, res.cmds, res.n_steps, jnp.asarray(sc.robot.speed), carry
    )
    proj = project_people(
        jnp.asarray(sc.people.state, jnp.float64),
        rows,
        n_rows,
        jnp.asarray(sc.esdf.distances, jnp.float64),
        jnp.asarray(sc.esdf.indexes),
        jnp.asarray(sc.esdf.origin, jnp.float64),
        jnp.asarray(sc.esdf.resolution, jnp.float64),
        jnp.asarray(sc.esdf.valid),
        maxtime=cfg.trajectorizer.max_time,
        dt=cfg.trajectorizer.time_step,
    )
    rfn = build_residual_fn(cfg, dims, rows, n_rows, proj, jnp.asarray(True), sc.costmap)

    n = int(n_rows)
    o_proj = [np.asarray(p, np.float64) for p in proj[:n]]
    rng = np.random.default_rng(11)
    for _ in range(2):
        u = rng.uniform([0.0, -1.4], [0.6, 1.4], size=(dims.n_blocks, 2))
        r_jax = np.asarray(rfn(jnp.asarray(u.reshape(-1), jnp.float64)))
        r_oracle = oracle.oracle_residuals(
            cfg,
            np.asarray(rows[:n], np.float64),
            o_proj,
            True,
            _costmap_tuple(sc),
            u,
        )
        assert r_jax.shape == r_oracle.shape
        np.testing.assert_allclose(r_jax, r_oracle, atol=1e-8)
