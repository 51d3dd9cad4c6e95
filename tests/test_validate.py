"""Window-exactness validation (VERDICT r2 weak-item 3): a configured
obstacle/ESDF window smaller than its reachable-set bound must either raise
at a host boundary or fall back to the exact unwindowed path with a warning
— never silently corrupt results."""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.core.types import ControllerCarry
from nav2_social_mpc_controller_tpu.core.validate import (
    esdf_window_min_cells,
    obstacle_window_min_cells,
    validate_scenario_windows,
)
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario


def _with_windows(cfg, obstacle=None, esdf=None):
    opt = cfg.optimizer
    if obstacle is not None:
        opt = dataclasses.replace(opt, obstacle_window_cells=obstacle)
    out = dataclasses.replace(cfg, optimizer=opt)
    if esdf is not None:
        out = dataclasses.replace(out, esdf_window_cells=esdf)
    return out


def test_benchmark_windows_satisfy_bounds():
    """The shipped benchmark presets clear their own exactness bounds at the
    benchmark grid resolution 0.05 (documented on the config fields)."""
    cfg = benchmark_social_config()
    assert cfg.optimizer.obstacle_window_cells >= obstacle_window_min_cells(cfg, 0.05)
    assert cfg.esdf_window_cells >= esdf_window_min_cells(cfg, 0.05)


def test_validate_raises_on_small_obstacle_window():
    cfg = _with_windows(benchmark_social_config(), obstacle=16)
    with pytest.raises(ValueError, match="obstacle_window_cells"):
        validate_scenario_windows(cfg, 0.05, 0.05)


def test_validate_raises_on_small_esdf_window():
    cfg = _with_windows(benchmark_social_config(), esdf=8)
    with pytest.raises(ValueError, match="esdf_window_cells"):
        validate_scenario_windows(cfg, 0.05, 0.05)


def test_validate_passes_when_windows_disabled():
    cfg = _with_windows(benchmark_social_config(), obstacle=0, esdf=0)
    validate_scenario_windows(cfg, 0.05, 0.05)


def test_scenario_generator_rejects_bad_window():
    cfg = _with_windows(benchmark_social_config(), obstacle=16)
    with pytest.raises(ValueError, match="obstacle_window_cells"):
        make_scenario(cfg, seed=0, n_valid_people=0)


def test_make_step_batch_rejects_bad_window():
    """Closing the direct-entry bypass (VERDICT r3 weak 4): a hand-built
    batch reaching make_step_batch with a too-small window fails loudly at
    the call boundary — the traced-resolution in-graph check cannot fire."""
    from nav2_social_mpc_controller_tpu.controller.controller import (
        make_carry,
        make_step_batch,
    )
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch

    cfg_good = benchmark_social_config()
    scb = make_scenario_batch(cfg_good, 2, n_valid_people=0, grid_hw=(64, 64))
    carry = jax.vmap(lambda _: make_carry(cfg_good))(jnp.arange(2))

    cfg_bad = _with_windows(cfg_good, obstacle=16)
    with pytest.raises(ValueError, match="obstacle_window_cells"):
        make_step_batch(cfg_bad)(scb, carry)
    # Opt-out path still runs (validated-at-construction callers).
    cmd, aux, _ = make_step_batch(cfg_good)(scb, carry)
    assert cmd.linear_x.shape == (2,)


def test_coarser_resolution_tightens_nothing():
    """Coarser cells shrink the bound: the benchmark window must stay valid
    at any resolution >= the benchmark's."""
    cfg = benchmark_social_config()
    assert obstacle_window_min_cells(cfg, 0.1) < obstacle_window_min_cells(cfg, 0.05)
    assert esdf_window_min_cells(cfg, 0.1) < esdf_window_min_cells(cfg, 0.05)


def test_small_obstacle_window_falls_back_exactly():
    """Concrete (host-side) residual construction with a too-small window
    warns and produces residuals identical to the unwindowed config."""
    from nav2_social_mpc_controller_tpu.controller.optimize import (
        ProblemDims,
        build_residual_fn,
        format_to_optimize,
    )
    from nav2_social_mpc_controller_tpu.controller.trajectorizer import trajectorize

    cfg_bad = _with_windows(benchmark_social_config(), obstacle=16)
    cfg_off = _with_windows(benchmark_social_config(), obstacle=0)
    sc = make_scenario(cfg_off, seed=0, n_valid_people=0, dtype=np.float64)
    dims = ProblemDims.from_config(cfg_off)
    traj = trajectorize(cfg_off.trajectorizer, sc.path, jnp.asarray(sc.robot.pose))
    carry = ControllerCarry(
        prev_path=jnp.zeros((dims.maxsize, 3), jnp.float64),
        prev_cmds=jnp.zeros((dims.maxsize, 2), jnp.float64),
        prev_n=jnp.zeros((), jnp.int32),
    )
    rows, n_rows = format_to_optimize(
        cfg_off, dims, traj.poses, traj.cmds, traj.n_steps,
        jnp.asarray(sc.robot.speed), carry,
    )
    proj = jnp.zeros((dims.maxsize, cfg_off.n_agents, 6), jnp.float64).at[:, :, 3].set(-1.0)
    present = jnp.asarray(False)

    with pytest.warns(UserWarning, match="obstacle_window_cells"):
        rfn_bad = build_residual_fn(cfg_bad, dims, rows, n_rows, proj, present, sc.costmap)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rfn_off = build_residual_fn(cfg_off, dims, rows, n_rows, proj, present, sc.costmap)

    u = jnp.asarray(np.linspace(0.1, 0.5, dims.n_blocks * 2))
    np.testing.assert_array_equal(np.asarray(rfn_bad(u)), np.asarray(rfn_off(u)))


def test_small_esdf_window_falls_back_exactly():
    """project_people with a too-small window warns and matches the gather
    path bit-for-bit."""
    from nav2_social_mpc_controller_tpu.models.sfm import project_people

    cfg = _with_windows(benchmark_social_config(), esdf=0)
    sc = make_scenario(cfg, seed=1, n_valid_people=3, dtype=np.float64)
    s1 = cfg.trajectorizer.max_steps
    rows = np.zeros((s1, 6))
    rows[:, 0] = np.linspace(0.0, 1.0, s1)
    rows[:, 4] = 0.4

    def run(esdf_window):
        return project_people(
            jnp.asarray(sc.people.state, jnp.float64),
            jnp.asarray(rows),
            jnp.asarray(s1, jnp.int32),
            jnp.asarray(sc.esdf.distances, jnp.float64),
            jnp.asarray(sc.esdf.indexes),
            jnp.asarray(sc.esdf.origin, jnp.float64),
            float(sc.esdf.resolution),
            jnp.asarray(True),
            maxtime=cfg.trajectorizer.max_time,
            dt=cfg.trajectorizer.time_step,
            esdf_window=esdf_window,
        )

    with pytest.warns(UserWarning, match="esdf_window_cells"):
        bad = run(8)
    good = run(0)
    np.testing.assert_array_equal(np.asarray(bad), np.asarray(good))


def test_window_validator_cache_holds_references():
    """ADVICE r4 (low): the identity cache must HOLD the keyed resolution
    arrays — an id()-only cache can be fooled when a freed buffer's id is
    recycled by a new, never-validated array."""
    from nav2_social_mpc_controller_tpu.core.validate import make_window_validator
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch

    cfg = benchmark_social_config()
    scb = make_scenario_batch(cfg, 2, n_valid_people=0, grid_hw=(64, 64))
    check = make_window_validator(cfg)
    check(scb)
    # The cache keeps the arrays alive: their refcount includes the cache.
    cache = check.__closure__[0].cell_contents
    key = (
        id(scb.costmap.resolution),
        id(scb.esdf.resolution),
        id(scb.costmap.data),
    )
    assert cache[key][0] is scb.costmap.resolution
    assert cache[key][1] is scb.esdf.resolution
    assert cache[key][2] is scb.costmap.data
    # A DIFFERENT (bad) batch still validates and raises.
    cfg_bad = _with_windows(cfg, obstacle=16)
    check_bad = make_window_validator(cfg_bad)
    with pytest.raises(ValueError, match="obstacle_window_cells"):
        check_bad(scb)


def test_fused_dispatch_respects_latent_weights():
    """ADVICE r4 (medium): the custom_vmap rule must refuse the fused kernel
    for configs with latent-critic weights (AngleCost/CurvatureCost are not
    implemented in the kernel), independent of who built the op — previously
    only solve_prepared guarded this, so make_step_batch_compacted could
    dispatch the kernel on such a config."""
    import dataclasses as dc

    from nav2_social_mpc_controller_tpu.ops.fused_iter import _fused_dispatch_ok

    cfg = benchmark_social_config()
    u = jnp.zeros((4, 6), jnp.float32)
    assert _fused_dispatch_ok(cfg, u, backend="tpu")
    assert not _fused_dispatch_ok(cfg, u, backend="cpu")
    assert not _fused_dispatch_ok(cfg, jnp.zeros((6,), jnp.float32), backend="tpu")
    assert not _fused_dispatch_ok(cfg, u.astype(jnp.float64), backend="tpu")

    w_lat = dc.replace(cfg.optimizer.weights, pure_angle_weight=1.0)
    cfg_lat = dc.replace(cfg, optimizer=dc.replace(cfg.optimizer, weights=w_lat))
    assert not _fused_dispatch_ok(cfg_lat, u, backend="tpu")
    w_cur = dc.replace(cfg.optimizer.weights, curvature_weight=1.0)
    cfg_cur = dc.replace(cfg, optimizer=dc.replace(cfg.optimizer, weights=w_cur))
    assert not _fused_dispatch_ok(cfg_cur, u, backend="tpu")
