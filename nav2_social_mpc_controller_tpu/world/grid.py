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


def bicubic_interpolate(grid: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Sample `grid` (H, W) at real coords (row, col) with Catmull-Rom
    bicubic interpolation and border clamping, matching
    ceres::BiCubicInterpolator<Grid2D>::Evaluate.

    row/col may be any broadcast-compatible shape; returns that shape.
    Differentiable in row/col (floor contributes zero gradient, as in the
    Ceres analytic derivative).
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
