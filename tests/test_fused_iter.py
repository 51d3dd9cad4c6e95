"""Fused LM iteration path (ops/fused_iter.py): rollout sensitivities and
the fused value_grad pinned against the production linearize path."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.models.motion import (
    block_index_sequence_dynamic,
    rollout_poses,
)
from nav2_social_mpc_controller_tpu.ops.fused_iter import rollout_with_sensitivities


def test_rollout_sensitivities_match_jacfwd():
    rng = np.random.default_rng(0)
    s, n_blocks = 29, 3
    dt = 0.05
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (n_blocks, 2)))
    pose0 = jnp.asarray([0.3, -0.2, 0.7])
    block_idx = block_index_sequence_dynamic(s, 18, 6)

    poses, vw, tx, ty, tth, eb = rollout_with_sensitivities(
        u, pose0, dt, block_idx, n_blocks
    )
    poses_ref = rollout_poses(pose0, u, dt, block_idx)
    np.testing.assert_allclose(np.asarray(poses), np.asarray(poses_ref), atol=1e-12)

    jac = jax.jacfwd(
        lambda uf: rollout_poses(pose0, uf.reshape(n_blocks, 2), dt, block_idx)[1:]
    )(u.reshape(-1))  # (S, 3, D)
    np.testing.assert_allclose(np.asarray(tx), np.asarray(jac[:, 0, :]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ty), np.asarray(jac[:, 1, :]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(tth), np.asarray(jac[:, 2, :]), atol=1e-9)


def test_rollout_sensitivities_dynamic_horizon():
    """Shrunk dynamic horizon (near-goal) changes block_idx; sensitivities
    must follow it exactly."""
    rng = np.random.default_rng(1)
    s, n_blocks = 29, 3
    dt = 0.05
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (n_blocks, 2)))
    pose0 = jnp.asarray([0.0, 0.0, -1.2])
    block_idx = block_index_sequence_dynamic(s, 7, 4)  # h_dyn=7, bl_dyn=4

    _, _, tx, ty, tth, _ = rollout_with_sensitivities(u, pose0, dt, block_idx, n_blocks)
    jac = jax.jacfwd(
        lambda uf: rollout_poses(pose0, uf.reshape(n_blocks, 2), dt, block_idx)[1:]
    )(u.reshape(-1))
    np.testing.assert_allclose(np.asarray(tx), np.asarray(jac[:, 0, :]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ty), np.asarray(jac[:, 1, :]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(tth), np.asarray(jac[:, 2, :]), atol=1e-9)


def _batch_problem(cfg_fn, n_people, seeds, dtype=np.float32):
    """Build the (rows, n_rows, proj, present, costmap) operand batch the
    fused value_grad consumes, straight from the production pipeline."""
    from nav2_social_mpc_controller_tpu.controller.optimize import (
        ProblemDims,
        format_to_optimize,
    )
    from nav2_social_mpc_controller_tpu.controller.trajectorizer import trajectorize
    from nav2_social_mpc_controller_tpu.core.types import ControllerCarry
    from nav2_social_mpc_controller_tpu.models.sfm import project_people
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario

    cfg = cfg_fn()
    dims = ProblemDims.from_config(cfg)
    batch = {k: [] for k in ("u", "rows", "n_rows", "proj", "present", "cmd", "cmo", "cmr")}
    for seed in seeds:
        sc = make_scenario(cfg, seed=seed, n_valid_people=n_people, dtype=dtype)
        res = trajectorize(cfg.trajectorizer, sc.path, jnp.asarray(sc.robot.pose))
        carry = ControllerCarry(
            prev_path=jnp.zeros((dims.maxsize, 3), dtype),
            prev_cmds=jnp.zeros((dims.maxsize, 2), dtype),
            prev_n=jnp.zeros((), jnp.int32),
        )
        rows, n_rows = format_to_optimize(
            cfg, dims, res.poses, res.cmds, res.n_steps, jnp.asarray(sc.robot.speed), carry
        )
        proj = project_people(
            jnp.asarray(sc.people.state, dtype), rows, n_rows,
            jnp.asarray(sc.esdf.distances, dtype), jnp.asarray(sc.esdf.indexes),
            jnp.asarray(sc.esdf.origin, dtype), jnp.asarray(sc.esdf.resolution, dtype),
            jnp.asarray(sc.esdf.valid),
            maxtime=cfg.trajectorizer.max_time, dt=cfg.trajectorizer.time_step,
            esdf_window=cfg.esdf_window_cells,
        )
        u0 = jnp.clip(rows[: dims.n_blocks, 4:6].reshape(-1), -0.6, 0.6)
        batch["u"].append(u0)
        batch["rows"].append(rows)
        batch["n_rows"].append(n_rows)
        batch["proj"].append(proj)
        batch["present"].append(jnp.any(jnp.asarray(sc.people.state)[:, 3] != -1.0))
        batch["cmd"].append(jnp.asarray(sc.costmap.data, dtype))
        batch["cmo"].append(jnp.asarray(sc.costmap.origin, dtype))
        batch["cmr"].append(jnp.asarray(sc.costmap.resolution, dtype))
    stacked = {k: jnp.stack(v) for k, v in batch.items()}
    return cfg, dims, stacked


def _compare_fused_vs_ref(cfg_fn, n_people, perturb_seed=0):
    import functools

    from nav2_social_mpc_controller_tpu.ops.fused_iter import (
        _fused_batched,
        _ref_value_grad,
    )

    cfg, dims, bt = _batch_problem(cfg_fn, n_people, seeds=range(4))
    rng = np.random.default_rng(perturb_seed)
    u = bt["u"] + jnp.asarray(rng.uniform(-0.05, 0.05, bt["u"].shape), jnp.float32)

    args = (u, bt["rows"], bt["n_rows"], bt["proj"], bt["present"],
            bt["cmd"], bt["cmo"], bt["cmr"])
    c_ref, g_ref, jtj_ref = jax.vmap(functools.partial(_ref_value_grad, cfg, dims))(*args)
    c_f, g_f, jtj_f = _fused_batched(cfg, dims, *args, interpret=True)

    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref), rtol=2e-5)
    scale_g = np.maximum(np.abs(np.asarray(g_ref)).max(axis=(1,), keepdims=True), 1.0)
    np.testing.assert_allclose(
        np.asarray(g_f) / scale_g, np.asarray(g_ref) / scale_g, atol=3e-5
    )
    scale_j = np.maximum(
        np.abs(np.asarray(jtj_ref)).max(axis=(1, 2), keepdims=True), 1.0
    )
    np.testing.assert_allclose(
        np.asarray(jtj_f) / scale_j, np.asarray(jtj_ref) / scale_j, atol=3e-5
    )


def test_fused_value_grad_matches_reference_social():
    from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config

    _compare_fused_vs_ref(benchmark_social_config, 3)


def test_fused_value_grad_matches_reference_obstacle_only():
    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_obstacle_only_config,
    )

    _compare_fused_vs_ref(benchmark_obstacle_only_config, 0)


def test_fused_value_grad_matches_reference_omni6():
    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_omni_6agents_config,
    )

    _compare_fused_vs_ref(benchmark_omni_6agents_config, 6)


def test_fused_value_grad_matches_reference_stress36():
    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_stress_h36_config,
    )

    _compare_fused_vs_ref(benchmark_stress_h36_config, 3)
