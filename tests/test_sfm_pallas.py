"""The fused SFM projection-scan kernel (models/sfm_pallas.py) vs the
reference lax.scan implementation, in interpret mode on CPU. The only
expected deviations are the documented Mosaic substitutions (polynomial
atan2, round-based wrap) at ~1 ulp of angle."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.models.sfm import (
    DEFAULT_PARAMS,
    _project_people_impl,
)
from nav2_social_mpc_controller_tpu.models.sfm_pallas import project_people_pallas
from nav2_social_mpc_controller_tpu.world.grid import crop_esdf_obstacle_window
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario


def _batch_inputs(b, n_people, seed0=0):
    cfg = benchmark_social_config()
    from nav2_social_mpc_controller_tpu.controller.optimize import ProblemDims
    from nav2_social_mpc_controller_tpu.controller.trajectorizer import trajectorize
    from nav2_social_mpc_controller_tpu.controller.optimize import format_to_optimize
    from nav2_social_mpc_controller_tpu.core.types import ControllerCarry

    dims = ProblemDims.from_config(cfg)
    rows_b, n_rows_b, sc_b = [], [], []
    for s in range(b):
        sc = make_scenario(cfg, seed=seed0 + s, n_valid_people=n_people)
        res = trajectorize(cfg.trajectorizer, sc.path, jnp.asarray(sc.robot.pose))
        carry = ControllerCarry(
            prev_path=jnp.zeros((dims.maxsize, 3), jnp.float32),
            prev_cmds=jnp.zeros((dims.maxsize, 2), jnp.float32),
            prev_n=jnp.zeros((), jnp.int32),
        )
        rows, n_rows = format_to_optimize(
            cfg, dims, res.poses, res.cmds, res.n_steps,
            jnp.asarray(sc.robot.speed), carry,
        )
        rows_b.append(rows)
        n_rows_b.append(n_rows)
        sc_b.append(sc)
    stackf = lambda xs: jnp.stack([jnp.asarray(x, jnp.float32) for x in xs])
    return cfg, dims, sc_b, stackf(rows_b), jnp.stack(n_rows_b)


def test_sfm_kernel_matches_reference_scan():
    b, n_people = 5, 3
    cfg, dims, scs, rows_b, n_rows_b = _batch_inputs(b, n_people)
    kw = dict(
        maxtime=cfg.trajectorizer.max_time,
        dt=cfg.trajectorizer.time_step,
        people_desired_vel=cfg.people_desired_vel,
        people_radius=cfg.people_radius,
        goal_radius=cfg.goal_radius,
    )
    window = cfg.esdf_window_cells
    ref, got = [], None
    init_b, oxy_b, sc_col, sc_row, org_b, res_b, val_b = [], [], [], [], [], [], []
    for i, sc in enumerate(scs):
        init = jnp.asarray(sc.people.state, jnp.float32)
        ref.append(
            _project_people_impl(
                init, rows_b[i], n_rows_b[i],
                jnp.asarray(sc.esdf.distances, jnp.float32),
                jnp.asarray(sc.esdf.indexes),
                jnp.asarray(sc.esdf.origin, jnp.float32),
                jnp.asarray(sc.esdf.resolution, jnp.float32),
                jnp.asarray(sc.esdf.valid),
                esdf_window=window,
                robot_desired_vel=cfg.robot_sfm_desired_vel,
                robot_radius=cfg.robot_sfm_radius,
                **kw,
            )
        )
        oxy, scol, srow = crop_esdf_obstacle_window(
            jnp.asarray(sc.esdf.indexes), init[:, 0:2],
            jnp.asarray(sc.esdf.origin, jnp.float32),
            jnp.asarray(sc.esdf.resolution, jnp.float32), window,
        )
        init_b.append(init)
        oxy_b.append(oxy)
        sc_col.append(scol)
        sc_row.append(srow)
        org_b.append(jnp.asarray(sc.esdf.origin, jnp.float32))
        res_b.append(jnp.asarray(sc.esdf.resolution, jnp.float32))
        val_b.append(jnp.asarray(sc.esdf.valid))
    grid_hw = scs[0].esdf.distances.shape
    got = project_people_pallas(
        jnp.stack(init_b), rows_b, n_rows_b, jnp.stack(oxy_b),
        jnp.stack(sc_col), jnp.stack(sc_row), jnp.stack(org_b),
        jnp.stack(res_b), jnp.stack(val_b),
        grid_hw, window, params=DEFAULT_PARAMS, interpret=True, **kw,
    )
    ref = jnp.stack(ref)
    assert got.shape == ref.shape
    # t column (validity) must match exactly; states to ~1 ulp of the
    # polynomial-angle substitutions propagated through the scan.
    np.testing.assert_array_equal(np.asarray(got[..., 3]), np.asarray(ref[..., 3]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sfm_kernel_invalid_esdf_freezes_agents():
    b, n_people = 2, 2
    cfg, dims, scs, rows_b, n_rows_b = _batch_inputs(b, n_people, seed0=7)
    window = cfg.esdf_window_cells
    init_b = jnp.stack([jnp.asarray(sc.people.state, jnp.float32) for sc in scs])
    oxy, scol, srow = jax.vmap(
        lambda idx, p0, o, r: crop_esdf_obstacle_window(idx, p0, o, r, window)
    )(
        jnp.stack([jnp.asarray(sc.esdf.indexes) for sc in scs]),
        init_b[:, :, 0:2],
        jnp.stack([jnp.asarray(sc.esdf.origin, jnp.float32) for sc in scs]),
        jnp.stack([jnp.asarray(sc.esdf.resolution, jnp.float32) for sc in scs]),
    )
    got = project_people_pallas(
        init_b, rows_b, n_rows_b, oxy, scol, srow,
        jnp.stack([jnp.asarray(sc.esdf.origin, jnp.float32) for sc in scs]),
        jnp.stack([jnp.asarray(sc.esdf.resolution, jnp.float32) for sc in scs]),
        jnp.zeros((b,), bool),  # invalid ESDF everywhere
        scs[0].esdf.distances.shape, window,
        maxtime=cfg.trajectorizer.max_time, dt=cfg.trajectorizer.time_step,
        params=DEFAULT_PARAMS,
        people_desired_vel=cfg.people_desired_vel,
        people_radius=cfg.people_radius, goal_radius=cfg.goal_radius,
        interpret=True,
    )
    # Invalid ESDF -> no agents projected: steps >= 1 all t = -1 (the
    # reference's continue-before-push_back quirk).
    assert np.all(np.asarray(got[:, 1:, :, 3]) == -1.0)
    np.testing.assert_array_equal(np.asarray(got[:, 0]), np.asarray(init_b))
