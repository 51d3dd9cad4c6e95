"""Grid sampling: Catmull-Rom bicubic costmap interpolation and ESDF
nearest-obstacle gathers.

Reference parity targets:
  bicubic_interpolate <- ceres::BiCubicInterpolator<ceres::Grid2D<u_char>>
      built per tick over the costmap (optimizer.cpp:167-170) and queried by
      ObstacleCost at grid coords (p - origin)/resolution with NO cell-center
      offset (obstacle_cost_function.hpp:160-163). Ceres' Grid2D clamps
      out-of-range rows/cols to the border; the interpolator is a cubic
      Hermite (Catmull-Rom) spline in each axis.
  esdf_nearest_obstacle_diff <- Optimizer::computeObstacle
      (optimizer.cpp:673-728): world point -> cell -> nearest-obstacle index
      lookup -> world vector from obstacle to the query point.

Everything is elementwise-differentiable JAX (the spline weights carry the
derivative, matching Ceres' analytic dfdr/dfdc) and vmaps over batches of
query points and of grids.
"""

import jax
import jax.numpy as jnp


def _cubic_hermite(p0, p1, p2, p3, x):
    """Catmull-Rom cubic through 4 samples, evaluated at x in [0,1].

    f(x) = p1 + 0.5 x (p2 - p0 + x (2p0 - 5p1 + 4p2 - p3 + x (3(p1-p2) + p3 - p0)))
    (the polynomial used by ceres::CubicHermiteSpline).
    """
    a = 0.5 * (-p0 + 3.0 * p1 - 3.0 * p2 + p3)
    b = 0.5 * (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3)
    c = 0.5 * (-p0 + p2)
    return p1 + x * (c + x * (b + x * a))


def bicubic_interpolate_gather(grid: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Gather-stencil bicubic (the textbook formulation). Kept as the
    cross-check implementation: 16 TPU gathers lower near-scalar (~1.9 ms
    each at batch 4096 on v5e — 80% of the whole controller step), so the
    hot path uses the MXU matmul formulation below instead.
    """
    h, w = grid.shape[-2], grid.shape[-1]
    r0 = jnp.floor(row)
    c0 = jnp.floor(col)
    fr = row - r0
    fc = col - c0
    r0 = r0.astype(jnp.int32)
    c0 = c0.astype(jnp.int32)

    def at(dr, dc):
        # Border clamp == ceres::Grid2D's index clamping.
        rr = jnp.clip(r0 + dr, 0, h - 1)
        cc = jnp.clip(c0 + dc, 0, w - 1)
        return grid[rr, cc]

    # 16-point stencil: interpolate along columns first, then rows.
    rows_interp = [
        _cubic_hermite(at(dr, -1), at(dr, 0), at(dr, 1), at(dr, 2), fc)
        for dr in (-1, 0, 1, 2)
    ]
    return _cubic_hermite(*rows_interp, fr)


def _stencil_weights(x: jnp.ndarray):
    """Catmull-Rom tap weights and their x-derivatives for fraction x.

    Weights are the _cubic_hermite polynomial regrouped per tap:
      w[-1] = 0.5(-x^3 + 2x^2 - x)     w[0] = 0.5(3x^3 - 5x^2 + 2)
      w[+1] = 0.5(-3x^3 + 4x^2 + x)    w[+2] = 0.5(x^3 - x^2)
    Returns (wts (S, 4), dwts (S, 4)).
    """
    x2 = x * x
    x3 = x2 * x
    wts = jnp.stack(
        [
            0.5 * (-x3 + 2.0 * x2 - x),
            0.5 * (3.0 * x3 - 5.0 * x2 + 2.0),
            0.5 * (-3.0 * x3 + 4.0 * x2 + x),
            0.5 * (x3 - x2),
        ],
        axis=-1,
    )
    dwts = jnp.stack(
        [
            0.5 * (-3.0 * x2 + 4.0 * x - 1.0),
            0.5 * (9.0 * x2 - 10.0 * x),
            0.5 * (-9.0 * x2 + 8.0 * x + 1.0),
            0.5 * (3.0 * x2 - 2.0 * x),
        ],
        axis=-1,
    )
    return wts, dwts


def _stencil_matrices(coord: jnp.ndarray, n: int, with_deriv: bool):
    """(S,) real coords -> sparse stencil matrix T (S, n) with the four
    Catmull-Rom weights placed one-hot at clip(floor(coord)+d-1, 0, n-1),
    d = 0..3, so that T @ values == the clamped cubic interpolation; plus
    the derivative-weight stencil T' when with_deriv.

    Clamped duplicate taps ACCUMULATE, matching the gather stencil; floor()
    contributes zero gradient (Ceres' analytic derivative likewise
    differentiates only through the fraction x).
    """
    i0 = jnp.floor(coord)
    wts, dwts = _stencil_weights(coord - i0)
    idx = jnp.clip(
        i0[..., None].astype(jnp.int32) + jnp.arange(-1, 3, dtype=jnp.int32), 0, n - 1
    )  # (S, 4)
    iota = jnp.arange(n, dtype=jnp.int32)
    onehot = idx[..., None] == iota  # (S, 4, n) bool
    # where/sum, not an einsum: a DEFAULT-precision TPU contraction would
    # round the Catmull-Rom weights to bf16 inside the stencil matrix
    # (round-4 on-chip parity study; same class of bug as expand_blocks).
    t = jnp.sum(jnp.where(onehot, wts[..., None], 0.0), axis=-2)
    if not with_deriv:
        return t, None
    return t, jnp.sum(jnp.where(onehot, dwts[..., None], 0.0), axis=-2)


def _bicubic_flat(grid, rowf, colf):
    """Primal-only path: value = (R @ grid) . C per sample."""
    h, w = grid.shape[-2], grid.shape[-1]
    r_mat, _ = _stencil_matrices(rowf, h, with_deriv=False)  # (S, H)
    c_mat, _ = _stencil_matrices(colf, w, with_deriv=False)  # (S, W)
    # HIGHEST: a DEFAULT TPU matmul truncates the f32 spline weights (and
    # any non-integer grid values) to bf16 — measured as ~0.4%-relative
    # obstacle-residual error on chip (round-4 on-chip parity study).
    rg = jnp.matmul(r_mat, grid, precision=jax.lax.Precision.HIGHEST)  # (S, W)
    return jnp.sum(rg * c_mat, axis=-1)


def _bicubic_flat_with_grads(grid, rowf, colf):
    """Value + analytic d/drow, d/dcol. ONE concatenated (2S, H) @ (H, W)
    matmul computes both the value and the row-derivative contractions; the
    column derivative reuses rg elementwise."""
    h, w = grid.shape[-2], grid.shape[-1]
    r_mat, rp_mat = _stencil_matrices(rowf, h, with_deriv=True)
    c_mat, cp_mat = _stencil_matrices(colf, w, with_deriv=True)
    # Materialize the stencils at a fusion boundary: under vmap, XLA's
    # fusion cost model otherwise emits them batch-minor and pays three
    # (B, S, n) transposition copies per LM iteration to feed the
    # row-major batched matmul (~0.45 ms/iter at B=4096 on v5e).
    both_r = jnp.concatenate([r_mat, rp_mat], axis=0)
    both_r, c_mat, cp_mat = jax.lax.optimization_barrier((both_r, c_mat, cp_mat))
    # HIGHEST for the same exactness reason as _bicubic_flat.
    both = jnp.matmul(both_r, grid, precision=jax.lax.Precision.HIGHEST)  # (2S, W)
    s = rowf.shape[0]
    rg, rpg = both[:s], both[s:]
    val = jnp.sum(rg * c_mat, axis=-1)
    d_row = jnp.sum(rpg * c_mat, axis=-1)
    d_col = jnp.sum(rg * cp_mat, axis=-1)
    return val, d_row, d_col


@jax.custom_batching.custom_vmap
def bicubic_linearize(grid, rowf, colf):
    """(value, d/drow, d/dcol) at flat coords. Batch-aware: under vmap with a
    per-scenario grid batch on TPU this dispatches the fused Pallas kernel
    (ops/bicubic_pallas.py), which builds the Catmull-Rom stencils in VMEM
    and never materializes the (B, S, n) stencil intermediates in HBM —
    traced at ~1.3 ms/LM-iteration (48% of the iteration) for the XLA
    formulation at B=4096 on v5e. Unbatched (or on CPU / f64 / shared-grid
    batches) it is the plain XLA stencil-matmul path."""
    return _bicubic_flat_with_grads(grid, rowf, colf)


@bicubic_linearize.def_vmap
def _bicubic_linearize_vmap_rule(axis_size, in_batched, grid, rowf, colf):
    g_b, r_b, c_b = in_batched
    out_batched = (True, True, True)
    use_pallas = (
        g_b
        and r_b
        and c_b
        and grid.ndim == 3  # no nested batching
        # bf16 grids are the split3 fast path: u8-valued costmap windows are
        # bf16-EXACT, so the fused pipeline stores the per-tick crop as bf16
        # to halve the packed kernel's per-iteration HBM window read.
        and grid.dtype in (jnp.float32, jnp.bfloat16)
        and rowf.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        # Deferred import: ops/__init__ imports back from this module.
        # Lane-packed variant: G scenarios share each 128-lane tile (falls
        # back to the per-scenario kernel when S is too long to pack).
        from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import (
            bicubic_linearize_pallas_packed,
        )

        return bicubic_linearize_pallas_packed(grid, rowf, colf), out_batched
    if grid.dtype == jnp.bfloat16:
        # XLA fallback (CPU tests / interpret mode): the bf16 window values
        # are exact by contract, so the f32 upcast restores identical math.
        grid = grid.astype(jnp.float32)
    gv = grid if g_b else jnp.broadcast_to(grid, (axis_size,) + grid.shape)
    rv = rowf if r_b else jnp.broadcast_to(rowf, (axis_size,) + rowf.shape)
    cv = colf if c_b else jnp.broadcast_to(colf, (axis_size,) + colf.shape)
    return jax.vmap(_bicubic_flat_with_grads)(gv, rv, cv), out_batched


@jax.custom_jvp
def _bicubic(grid, rowf, colf):
    return _bicubic_flat(grid, rowf, colf)


def _bicubic_jvp(primals, tangents):
    """Analytic JVP: without this rule, AD pushes EVERY tangent direction
    through its own (S, H) @ (H, W) stencil matmul — traced at ~3 ms per LM
    iteration for the 6-tangent Jacobian at batch 4096 on v5e. Here the
    primal computes the derivative contractions once and tangents are
    elementwise."""
    grid, rowf, colf = primals
    dgrid, drow, dcol = tangents
    zero = jax.custom_derivatives.SymbolicZero
    val, d_row, d_col = bicubic_linearize(grid, rowf, colf)
    dval = jnp.zeros_like(val)
    if type(drow) is not zero:
        dval = dval + d_row * drow
    if type(dcol) is not zero:
        dval = dval + d_col * dcol
    # Grid tangents (never taken in-framework: grids are scenario data, and
    # the LM loop differentiates w.r.t. controls only) still handled exactly:
    if type(dgrid) is not zero:
        h, w = grid.shape[-2], grid.shape[-1]
        r_mat, _ = _stencil_matrices(rowf, h, with_deriv=False)
        c_mat, _ = _stencil_matrices(colf, w, with_deriv=False)
        rdg = jnp.matmul(r_mat, dgrid, precision=jax.lax.Precision.HIGHEST)
        dval = dval + jnp.sum(rdg * c_mat, axis=-1)
    return val, dval


_bicubic.defjvp(_bicubic_jvp, symbolic_zeros=True)


def bicubic_interpolate(grid: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Sample `grid` (H, W) at real coords (row, col) with Catmull-Rom
    bicubic interpolation and border clamping, matching
    ceres::BiCubicInterpolator<Grid2D>::Evaluate.

    MXU formulation: value_s = R_s @ grid @ C_s with the spline weights
    embedded in sparse one-hot stencil matrices — identical math to the
    16-point gather stencil (up to fp reassociation: (R G) C vs R (G C)),
    but the inner product runs on the systolic array instead of near-scalar
    TPU gathers. Differentiable in row/col through the weight polynomials
    via an analytic custom JVP (floor has zero gradient, as in Ceres'
    analytic derivative).

    row/col: (...,) any matching shape; returns that shape.
    """
    shape = jnp.broadcast_shapes(jnp.shape(row), jnp.shape(col))
    dt = jnp.result_type(row, col)
    rowf = jnp.broadcast_to(row, shape).astype(dt).reshape(-1)
    colf = jnp.broadcast_to(col, shape).astype(dt).reshape(-1)
    return _bicubic(grid, rowf, colf).reshape(shape)


def crop_grid_window(data: jnp.ndarray, origin: jnp.ndarray, resolution, center_xy: jnp.ndarray, window: int):
    """Extract an (n, n) window of `data` centered (cell-wise) on the world
    point center_xy, clamped inside the grid; returns (window_data,
    window_origin). ONE dynamic-slice per tick, so the per-LM-iteration
    stencil matmuls read n*n cells instead of the full grid.

    Bit-identical to sampling the full grid (including border clamping)
    whenever every query stays >= 2 cells inside the window — see
    OptimizerConfig.obstacle_window_cells for the sizing rule."""
    h, w = data.shape[-2], data.shape[-1]
    if window <= 0 or window >= min(h, w):
        return data, origin
    cell = jnp.floor((center_xy - origin) / resolution).astype(jnp.int32)  # (col, row)
    half = window // 2
    start_col = jnp.clip(cell[0] - half, 0, w - window)
    start_row = jnp.clip(cell[1] - half, 0, h - window)
    # One-hot selector matmuls instead of lax.dynamic_slice: a batched
    # dynamic-slice with per-scenario offsets lowers to ONE slice PER
    # SCENARIO on TPU (traced: 1.3 us x 4096 = 5.3 ms/tick, 6% of the tick);
    # the selector dots run batched on the MXU and are exact (0/1 weights).
    iwin = jnp.arange(window, dtype=jnp.int32)
    rows_sel = (start_row + iwin[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(
        data.dtype
    )  # (window, H)
    cols_sel = (start_col + iwin[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :]).astype(
        data.dtype
    )  # (window, W)
    # One-hot selection must be a pure copy. Selector weights (0/1) are
    # bf16-exact; when the costmap is validated bf16-exact too (the split3
    # production mode — u8 integer cost values, check_costmap_bf16_exact),
    # the DEFAULT TPU matmul (bf16 operands, f32 accumulate) is ALSO a pure
    # copy at a third of HIGHEST's MXU passes (measured ~0.2 ms/tick at
    # B=1024). Float-valued grids (SOCIAL_MPC_BICUBIC_DOT=highest) keep
    # HIGHEST so the crop stays bit-exact for them.
    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import resolve_dot_mode

    hi = None if resolve_dot_mode() == "split3" else jax.lax.Precision.HIGHEST
    win_rows = jnp.matmul(rows_sel, data, precision=hi)  # (window, W) — MXU
    win = jnp.einsum("cw,rw->rc", cols_sel, win_rows, precision=hi)  # no transpose op
    shift = jnp.stack([start_col, start_row]).astype(origin.dtype) * resolution
    return win, origin + shift


def costmap_world_to_grid(point_xy: jnp.ndarray, origin: jnp.ndarray, resolution):
    """World -> continuous grid coords, reference convention (no center
    offset): (p - origin) / resolution (obstacle_cost_function.hpp:161-162).
    Returns (col=x_grid, row=y_grid)."""
    g = (point_xy - origin) / resolution
    return g[..., 0], g[..., 1]


def sample_costmap(costmap_data, origin, resolution, point_xy):
    """Bicubic costmap sample at world point(s), ObstacleCost convention:
    Evaluate(row=y_grid, col=x_grid)."""
    col, row = costmap_world_to_grid(point_xy, origin, resolution)
    return bicubic_interpolate(costmap_data, row, col)


def esdf_nearest_obstacle_diff(distances, indexes, origin, resolution, point_xy):
    """Vector from the nearest obstacle cell to the query point, replicating
    Optimizer::computeObstacle (optimizer.cpp:688-727).

    Steps: world -> (xcell, ycell) via floor; flat index xcell + ycell*W;
    gather nearest-obstacle flat index; index -> obstacle cell -> world
    coords at the cell CORNER (cell*res + origin, reference :719-720);
    return diff = point - obstacle (and an in-bounds validity flag instead
    of the reference's exceptions).

    distances: (H, W); indexes: (H, W) int32; point_xy: (..., 2).
    Returns (diff (..., 2), in_bounds (...,) bool).
    """
    h, w = distances.shape[-2], distances.shape[-1]
    cell = jnp.floor((point_xy - origin) / resolution).astype(jnp.int32)
    xcell, ycell = cell[..., 0], cell[..., 1]
    in_bounds = (xcell >= 0) & (xcell < w) & (ycell >= 0) & (ycell < h)
    xc = jnp.clip(xcell, 0, w - 1)
    yc = jnp.clip(ycell, 0, h - 1)
    ob_idx = indexes[yc, xc]
    ob_idx = jnp.clip(ob_idx, 0, h * w - 1)
    ob_y = (ob_idx // w).astype(point_xy.dtype)
    ob_x = (ob_idx % w).astype(point_xy.dtype)
    obstacle = jnp.stack([ob_x, ob_y], axis=-1) * resolution + origin
    return point_xy - obstacle, in_bounds


def crop_esdf_obstacle_window(indexes, centers_xy, origin, resolution, window: int):
    """Per-agent one-hot crop of the nearest-obstacle index grid into u8
    obstacle-cell-coordinate tables for the projection scan's lookups.

    The SFM projection (models.sfm.project_people) refreshes each agent's
    nearest obstacle EVERY scan step (optimizer.cpp:641-645); a batched
    `indexes[yc, xc]` lowers to a 62 us TPU gather per step (~12% of the
    6-agent tick at B=1024). Agents move at most desired_vel*dt per step
    (updatePosition clamps speed, sfm.hpp:533-540), so every query over the
    horizon stays within a static window of the agent's STARTING cell; this
    crops that window ONCE per tick with exact one-hot selector matmuls,
    after which the per-step lookup is a masked reduce over u8 planes
    (window^2 * 1 byte per agent) instead of a gather.

    EXACT-output requirement (mirrors OptimizerConfig.obstacle_window_cells):
      window/2 >= ceil(people_desired_vel * time_step * (S-1) / resolution) + 1
    and the grid must satisfy h, w <= 256 (u8 cell coords) and h*w < 2^24
    (f32-exact flat indices). crop callers fall back to the gather path
    otherwise.

    indexes: (H, W) int32; centers_xy: (N, 2) world points.
    Returns (oxy_u16 (N, window^2) — packed ox | oy << 8,
             start_col (N,) int32, start_row (N,) int32).
    """
    h, w = indexes.shape[-2], indexes.shape[-1]
    cell = jnp.floor((centers_xy - origin) / resolution).astype(jnp.int32)  # (N, 2)
    half = window // 2
    start_col = jnp.clip(cell[:, 0] - half, 0, w - window)
    start_row = jnp.clip(cell[:, 1] - half, 0, h - window)

    iwin = jnp.arange(window, dtype=jnp.int32)
    rows_sel = (
        start_row[:, None, None] + iwin[None, :, None] == jnp.arange(h, dtype=jnp.int32)
    ).astype(jnp.float32)  # (N, window, H)
    cols_sel = (
        start_col[:, None, None] + iwin[None, :, None] == jnp.arange(w, dtype=jnp.int32)
    ).astype(jnp.float32)  # (N, window, W)

    # One-hot dots are copies. The window path requires h, w <= 256 (u8
    # cell coords), so flat indices are < 2^16: splitting each index into
    # its two BYTES makes both operand planes bf16-exact (integers <= 255),
    # and the 0/1 selectors are bf16-exact too — so DEFAULT-precision TPU
    # matmuls (bf16 operands, f32 accumulate) select EXACTLY at a third of
    # HIGHEST's MXU passes (same trick as the split3 bicubic dot; measured
    # ~0.2 ms/tick at B=1024 across both byte planes).
    idx_c = jnp.clip(indexes, 0, h * w - 1)
    parts = []
    for plane in ((idx_c >> 8).astype(jnp.float32), (idx_c & 0xFF).astype(jnp.float32)):
        win_rows = jnp.einsum("krh,hw->krw", rows_sel, plane)  # (N, window, W)
        parts.append(jnp.einsum("kcw,krw->krc", cols_sel, win_rows))
    idx_i = (
        parts[0].astype(jnp.int32) * 256 + parts[1].astype(jnp.int32)
    ).reshape(parts[0].shape[0], -1)  # (N, window^2)
    oy = idx_i // w
    ox = idx_i % w
    # ONE packed u16 plane (ox | oy << 8) instead of two u8 planes: the
    # per-scan-step lookup then runs a SINGLE masked max-reduce over
    # window^2 — halving both the reduce passes and the table re-reads that
    # dominate project_people's bytes (VERDICT r3 item 5). Exact: cell
    # coords are < 256 by the crop contract.
    oxy = (ox + (oy << 8)).astype(jnp.uint16)
    return oxy, start_col, start_row


def esdf_nearest_obstacle_diff_windowed(
    oxy_u16, start_col, start_row, grid_hw, origin, resolution, window: int, point_xy
):
    """Windowed equivalent of esdf_nearest_obstacle_diff: same math, with the
    per-step gather replaced by ONE masked max-reduce over the packed-u16
    table from crop_esdf_obstacle_window. Exact whenever the query stays
    inside its agent's window (see the sizing rule there).

    point_xy: (N, 2) — one query per agent/window row.
    Returns (diff (N, 2), in_bounds (N,) bool).
    """
    h, w = grid_hw
    cell = jnp.floor((point_xy - origin) / resolution).astype(jnp.int32)
    xcell, ycell = cell[..., 0], cell[..., 1]
    in_bounds = (xcell >= 0) & (xcell < w) & (ycell >= 0) & (ycell < h)
    wx = jnp.clip(jnp.clip(xcell, 0, w - 1) - start_col, 0, window - 1)
    wy = jnp.clip(jnp.clip(ycell, 0, h - 1) - start_row, 0, window - 1)
    flat = wy * window + wx  # (N,)
    mask = flat[:, None] == jnp.arange(window * window, dtype=flat.dtype)  # (N, window^2)
    zero = jnp.zeros((), jnp.uint16)
    # The mask selects exactly one element, so max == the selected value.
    oxy = jnp.max(jnp.where(mask, oxy_u16, zero), axis=-1).astype(jnp.int32)
    ob_x = (oxy & 0xFF).astype(point_xy.dtype)
    ob_y = (oxy >> 8).astype(point_xy.dtype)
    obstacle = jnp.stack([ob_x, ob_y], axis=-1) * resolution + origin
    return point_xy - obstacle, in_bounds
