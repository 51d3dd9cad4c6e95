"""Config-vs-world exactness validation for the two TPU windowing
optimizations (VERDICT r2 weak-item 3).

Both `OptimizerConfig.obstacle_window_cells` and
`SocialMPCConfig.esdf_window_cells` are EXACT-output optimizations only when
the window covers the relevant reachable set; the sizing rules are documented
on the fields (core/config.py) and re-derived here from first principles:

  * obstacle window — the obstacle critic samples the costmap at the rollout
    front points (pose + 0.25 m heading offset,
    obstacle_cost_function.hpp:152-163). From pose_0 (the crop center) the
    robot can travel at most S * time_step * v_max in S steps
    (optimizer.cpp:373-379 bounds), so every sample lies within
    (S*dt*v_max + front_offset)/resolution cells of the center, and the
    Catmull-Rom stencil reads 2 more cells beyond the sample cell
    (world/grid.py _stencil_matrices).

  * ESDF window — the SFM projection refreshes each agent's nearest-obstacle
    cell from the agent's CURRENT position every scan step
    (optimizer.cpp:641-645); updatePosition clamps agent speed to
    people_desired_vel (sfm.hpp:533-540), so after the scan's S-1 steps an
    agent has drifted at most people_desired_vel * dt * (S-1) from the
    window center, plus 1 cell of floor() slack
    (world/grid.py crop_esdf_obstacle_window).

Grid resolution is runtime data (a Scenario leaf), so the checks run at the
jit boundary where values are concrete: host wrappers and scenario
generators raise; the traced kernels (build_residual_fn / project_people)
check opportunistically when their resolution argument happens to be
concrete and FALL BACK to the exact unwindowed path with a warning.
"""

import math
import warnings

FRONT_OFFSET = 0.25  # "size of jackal" heading offset (obstacle_cost_function.hpp:152)


def _concrete_float(x):
    """Return float(x) when x is a concrete value, None when traced."""
    import jax

    if isinstance(x, jax.core.Tracer):
        return None
    try:
        return float(x)
    except (TypeError, jax.errors.ConcretizationTypeError):
        return None


def obstacle_window_min_cells(cfg, resolution: float) -> int:
    """Smallest exact obstacle_window_cells at this costmap resolution."""
    s = cfg.trajectorizer.max_steps - 1  # velocity steps of the rollout
    reach_m = s * cfg.trajectorizer.time_step * cfg.optimizer.v_max + FRONT_OFFSET
    return 2 * (math.ceil(reach_m / resolution) + 2)


def esdf_window_min_cells(cfg, resolution: float) -> int:
    """Smallest exact esdf_window_cells at this ESDF resolution."""
    s = cfg.trajectorizer.max_steps
    drift_m = cfg.people_desired_vel * cfg.trajectorizer.time_step * (s - 1)
    return 2 * (math.ceil(drift_m / resolution) + 1)


def check_obstacle_window(cfg, resolution) -> bool:
    """True when the configured obstacle window is provably exact (or the
    resolution is traced and cannot be checked here). Emits a warning and
    returns False on a violation — callers fall back to the full grid."""
    if cfg.optimizer.obstacle_window_cells <= 0:
        return True
    res = _concrete_float(resolution)
    if res is None or res <= 0.0:
        return True  # traced/degenerate: checked at the host boundary instead
    need = obstacle_window_min_cells(cfg, res)
    if cfg.optimizer.obstacle_window_cells >= need:
        return True
    warnings.warn(
        f"obstacle_window_cells={cfg.optimizer.obstacle_window_cells} is below "
        f"the exactness bound {need} at costmap resolution {res}; falling back "
        "to full-grid sampling (exact, slower). See "
        "OptimizerConfig.obstacle_window_cells.",
        stacklevel=3,
    )
    return False


def check_esdf_window(cfg, resolution) -> bool:
    """Same contract as check_obstacle_window, for esdf_window_cells."""
    if cfg.esdf_window_cells <= 0:
        return True
    res = _concrete_float(resolution)
    if res is None or res <= 0.0:
        return True
    need = esdf_window_min_cells(cfg, res)
    if cfg.esdf_window_cells >= need:
        return True
    warnings.warn(
        f"esdf_window_cells={cfg.esdf_window_cells} is below the exactness "
        f"bound {need} at ESDF resolution {res}; falling back to the gather "
        "path (exact, slower). See SocialMPCConfig.esdf_window_cells.",
        stacklevel=3,
    )
    return False


def validate_batch_windows(cfg, scenario) -> None:
    """Window-exactness check for a (possibly batched) Scenario at a host
    boundary. Batched resolutions are reduced with min() — the smallest
    resolution needs the largest window, so it is the binding one. Called by
    the ``make_step_batch`` wrapper on every NEW resolution buffer (identity-
    cached), closing the bypass where a hand-built batch reached the jitted
    step with only the traced-resolution no-op check (VERDICT r3 weak 4)."""
    import numpy as np

    cm = np.min(np.asarray(scenario.costmap.resolution))
    es = np.min(np.asarray(scenario.esdf.resolution))
    validate_scenario_windows(cfg, float(cm), float(es))


def check_costmap_bf16_exact(costmap_data) -> None:
    """Guard for the packed bicubic kernel's 'split3' dot mode
    (ops/bicubic_pallas.py): its 3-pass bf16 MXU product is f32-exact ONLY
    when every costmap value is exactly representable in bfloat16 — true by
    construction for the reference's u8 cost grids (ceres::Grid2D<u_char>
    over Costmap2D, optimizer.cpp:167-170), where values are integers
    <= 255. A float-valued costmap would silently lose ~1.5e-5 relative in
    the obstacle stencil, so it must fail loudly here; set
    SOCIAL_MPC_BICUBIC_DOT=highest to run such grids with the 6-pass dot."""
    import ml_dtypes
    import numpy as np

    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import resolve_dot_mode

    if resolve_dot_mode() != "split3":
        return
    data = np.asarray(costmap_data, dtype=np.float32)
    rt = data.astype(ml_dtypes.bfloat16).astype(np.float32)
    if not np.array_equal(rt, data):
        bad = float(np.max(np.abs(rt - data)))
        raise ValueError(
            "costmap values are not exactly bfloat16-representable (max "
            f"round-trip error {bad:.3e}): the packed bicubic kernel's "
            "'split3' dot mode requires u8-style integer cost values (the "
            "reference's Grid2D<u_char> domain). Set "
            "SOCIAL_MPC_BICUBIC_DOT=highest to use the exact 6-pass dot "
            "for float-valued grids."
        )


def make_window_validator(cfg):
    """Identity-cached validate_batch_windows: returns check(scenario) that
    runs the hard window check once per distinct resolution buffer, so
    steady-state ticks that reuse scenario buffers pay nothing. The cache
    HOLDS the keyed resolution arrays (not just their ids) — otherwise a
    freed buffer's id could be recycled by a new, never-validated array and
    silently skip the check this wrapper exists to guarantee (ADVICE r4)."""
    cache = {}

    def check(scenario) -> None:
        key = (
            id(scenario.costmap.resolution),
            id(scenario.esdf.resolution),
            id(scenario.costmap.data),
        )
        if key not in cache:
            validate_batch_windows(cfg, scenario)
            check_costmap_bf16_exact(scenario.costmap.data)
            if len(cache) >= 1024:  # bound the cache for long campaigns
                cache.clear()
            cache[key] = (
                scenario.costmap.resolution,
                scenario.esdf.resolution,
                scenario.costmap.data,
            )

    return check


def validate_scenario_windows(cfg, costmap_resolution, esdf_resolution) -> None:
    """Hard check at a host boundary (concrete resolutions required): raises
    ValueError when a configured window is smaller than its exactness bound,
    so a misconfiguration cannot silently corrupt a jitted batch run where
    the in-graph fallback cannot fire."""
    cm_res = _concrete_float(costmap_resolution)
    if cfg.optimizer.obstacle_window_cells > 0 and cm_res is not None and cm_res > 0:
        need = obstacle_window_min_cells(cfg, cm_res)
        if cfg.optimizer.obstacle_window_cells < need:
            raise ValueError(
                f"obstacle_window_cells={cfg.optimizer.obstacle_window_cells} < "
                f"exactness bound {need} at costmap resolution {cm_res}: the "
                "rolling-window crop would clip reachable obstacle-critic "
                "samples. Raise obstacle_window_cells or set it to 0."
            )
    es_res = _concrete_float(esdf_resolution)
    if cfg.esdf_window_cells > 0 and es_res is not None and es_res > 0:
        need = esdf_window_min_cells(cfg, es_res)
        if cfg.esdf_window_cells < need:
            raise ValueError(
                f"esdf_window_cells={cfg.esdf_window_cells} < exactness bound "
                f"{need} at ESDF resolution {es_res}: projected agents could "
                "leave their nearest-obstacle window. Raise esdf_window_cells "
                "or set it to 0."
            )
