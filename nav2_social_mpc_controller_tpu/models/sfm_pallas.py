"""Pallas TPU kernel for the SFM people-projection scan (VERDICT r4 item 9).

project_people (models/sfm.py — the port of Optimizer::project_people,
optimizer.cpp:554-671) is a lax.scan of S ~ 29-35 steps, each a handful of
small XLA ops over (B, N) agent state plus a windowed nearest-obstacle
reduce. At B=1024 the scan costs ~1.15 ms/tick (~40 us/step, ~15x its VPU
bound — dispatch-dominated small ops). This kernel runs the ENTIRE scan for
128 scenarios per grid step inside VMEM: agent state as (1, 128) lane rows,
the S-step loop unrolled, the packed-u16 obstacle tables
(world/grid.crop_esdf_obstacle_window) resident across steps, and the
per-step lookup as one masked max-reduce per agent.

Semantics: identical to the XLA scan (same masks, same freeze logic, same
reference quirks — see models/sfm.py's module docstring), with two
documented TPU-only substitutions, the same ones the fused critic kernel
makes (ops/fused_iter.py): atan2 via the Cephes polynomial (Mosaic has no
atan lowering; ~1 ulp) and angle wrap via round() instead of mod(). Pinned
against the XLA path in interpret mode by tests/test_sfm_pallas.py and on
hardware by the batched on-chip parity study.

Dispatch: models.sfm.project_people is a custom_vmap op; unbatched (and
CPU / f64 / gather-fallback) execution keeps the reference scan, batched
f32 TPU execution with the windowed lookup enabled lands here.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nav2_social_mpc_controller_tpu.ops.fused_iter import _atan2_poly, _wrap_poly

_BT = 128  # scenarios per grid step
_EPS_DIR = 1e-6


def _norm2(x, y):
    return jnp.sqrt(x * x + y * y)


def _safe_dir(x, y):
    """_safe_normalize: zero-length vectors become the fixed (eps, 0)."""
    n = _norm2(x, y)
    tiny = n < _EPS_DIR
    x = jnp.where(tiny, _EPS_DIR, x)
    y = jnp.where(tiny, 0.0, y)
    n = jnp.where(tiny, _EPS_DIR, n)
    return x / n, y / n, n


def _pair_social(params, px_j, py_j, vx_j, vy_j, px_k, py_k, vx_k, vy_k):
    """One directed social-force term on entity j from entity k
    (computeSocialForce, sfm.hpp:237-281)."""
    lam, gamma, n_sfm, n_prime, factor = params
    dx = px_k - px_j
    dy = py_k - py_j
    ddx, ddy, dn = _safe_dir(dx, dy)
    ix = lam * (vx_j - vx_k) + ddx
    iy = lam * (vy_j - vy_k) + ddy
    idx, idy, ilen = _safe_dir(ix, iy)
    a1 = _atan2_poly(idy, idx)
    a2 = _atan2_poly(ddy, ddx)
    theta = _wrap_poly(a2 - a1)
    b = gamma * ilen
    fv = -jnp.exp(-dn / b - (n_prime * b * theta) ** 2)
    fa = -jnp.sign(theta) * jnp.exp(-dn / b - (n_sfm * b * theta) ** 2)
    fx = factor * (fv * idx + fa * (-idy))
    fy = factor * (fv * idy + fa * idx)
    return fx, fy


def _sfm_scan_kernel(
    statics,
    people_ref,   # (N*6, BT)      init agent rows [x, y, yaw, t, lv, av]
    traj_ref,     # (S*6, BT)      robot rows 0..S-1 (step inputs)
    meta_ref,     # (8, BT)        [n_rows, goal_x.., origin_x, origin_y, res, valid]
    oxy_ref,      # (N, WSQ, BT)   packed u16 nearest-obstacle tables (as i32)
    start_ref,    # (2*N, BT)      window start_col / start_row per agent (i32)
    out_ref,      # (S*N*6, BT)    projected agents, steps 1..S
):
    (n, s, wsq, window, grid_w, grid_h, maxtime, dt, params,
     people_desired, people_radius, goal_radius,
     f_desired, relax, f_obstacle, sigma_obstacle) = statics

    n_rows = meta_ref[0, :]
    origin_x = meta_ref[1, :]
    origin_y = meta_ref[2, :]
    res = meta_ref[3, :]
    esdf_valid = meta_ref[4, :] > 0.0

    lanes = people_ref.shape[1]

    def lookup(k, qx, qy):
        """esdf_nearest_obstacle_diff_windowed for agent slot k."""
        xcell = jnp.floor((qx - origin_x) / res).astype(jnp.int32)
        ycell = jnp.floor((qy - origin_y) / res).astype(jnp.int32)
        in_bounds = (xcell >= 0) & (xcell < grid_w) & (ycell >= 0) & (ycell < grid_h)
        wx = jnp.clip(jnp.clip(xcell, 0, grid_w - 1) - start_ref[k, :], 0, window - 1)
        wy = jnp.clip(jnp.clip(ycell, 0, grid_h - 1) - start_ref[n + k, :], 0, window - 1)
        flat = wy * window + wx  # (BT,) target row per lane
        iota = jax.lax.broadcasted_iota(jnp.int32, (wsq, lanes), 0)
        sel = jnp.where(iota == flat[None, :], oxy_ref[k], 0)
        oxy = jnp.max(sel, axis=0)  # exactly-one-hot -> max == select
        ob_x = (oxy & 0xFF).astype(qx.dtype) * res + origin_x
        ob_y = (oxy >> 8).astype(qx.dtype) * res + origin_y
        return qx - ob_x, qy - ob_y, in_bounds

    # --- initial agent state ---
    px, py, yaw, lv, av, valid0 = [], [], [], [], [], []
    vx, vy, gx, gy, has_goal, oex, oey, ohas = [], [], [], [], [], [], [], []
    for k in range(n):
        px.append(people_ref[6 * k + 0, :])
        py.append(people_ref[6 * k + 1, :])
        yaw.append(people_ref[6 * k + 2, :])
        lv.append(people_ref[6 * k + 4, :])
        av.append(people_ref[6 * k + 5, :])
        valid0.append((people_ref[6 * k + 3, :] != -1.0) & esdf_valid)
        vx.append(lv[k] * jnp.cos(yaw[k]))
        vy.append(lv[k] * jnp.sin(yaw[k]))
        gx.append(px[k] + maxtime * vx[k])
        gy.append(py[k] + maxtime * vy[k])
        # Boolean carries live as f32 masks: Mosaic cannot select/store i1
        # vectors (arith.trunci i8->i1 is unsupported).
        has_goal.append(jnp.where(valid0[k], 1.0, 0.0))
        ex, ey, inb = lookup(k, px[k], py[k])
        oex.append(ex)
        oey.append(ey)
        ohas.append(jnp.where(inb & esdf_valid, 1.0, 0.0))

    lam, gamma, n_sfm, n_prime, factor = params

    for i in range(s):
        r_px = traj_ref[6 * i + 0, :]
        r_py = traj_ref[6 * i + 1, :]
        r_yaw = traj_ref[6 * i + 2, :]
        r_lv = traj_ref[6 * i + 4, :]
        r_vx = r_lv * jnp.cos(r_yaw)
        r_vy = r_lv * jnp.sin(r_yaw)

        step_f = jnp.float32(i)
        active_step = step_f < (n_rows - 1.0)

        # Social force on each person from the other people + the robot.
        social_x, social_y = [], []
        for j in range(n):
            sx = jnp.zeros((lanes,), px[j].dtype)
            sy = jnp.zeros_like(sx)
            for k in range(n):
                if k == j:
                    continue
                fx, fy = _pair_social(
                    params, px[j], py[j], vx[j], vy[j], px[k], py[k], vx[k], vy[k]
                )
                m = valid0[j] & valid0[k]
                sx = sx + jnp.where(m, fx, 0.0)
                sy = sy + jnp.where(m, fy, 0.0)
            fx, fy = _pair_social(
                params, px[j], py[j], vx[j], vy[j], r_px, r_py, r_vx, r_vy
            )
            sx = sx + jnp.where(valid0[j], fx, 0.0)
            sy = sy + jnp.where(valid0[j], fy, 0.0)
            social_x.append(sx)
            social_y.append(sy)

        for j in range(n):
            # Desired force (sfm.hpp:188-203)
            dx = gx[j] - px[j]
            dy = gy[j] - py[j]
            dist = _norm2(dx, dy)
            pursuing = (has_goal[j] > 0.0) & (dist > goal_radius)
            inv = 1.0 / jnp.maximum(dist, _EPS_DIR)
            fdx = jnp.where(
                pursuing,
                f_desired * (dx * inv * people_desired - vx[j]) / relax,
                -vx[j] / relax,
            )
            fdy = jnp.where(
                pursuing,
                f_desired * (dy * inv * people_desired - vy[j]) / relax,
                -vy[j] / relax,
            )
            # Obstacle force (sfm.hpp:205-235) with the projection's stored
            # diff entry (minDiff = pos - entry, the replicated quirk)
            mdx = px[j] - oex[j]
            mdy = py[j] - oey[j]
            odist = _norm2(mdx, mdy) - people_radius
            odx, ody, _on = _safe_dir(mdx, mdy)
            oamp = f_obstacle * jnp.exp(-odist / sigma_obstacle)
            has_o = (ohas[j] > 0.0) & valid0[j]
            fox = jnp.where(has_o, oamp * odx, 0.0)
            foy = jnp.where(has_o, oamp * ody, 0.0)

            gfx = fdx + social_x[j] + fox
            gfy = fdy + social_y[j] + foy

            # updatePosition (sfm.hpp:525-573)
            nvx = vx[j] + gfx * dt
            nvy = vy[j] + gfy * dt
            speed = _norm2(nvx, nvy)
            over = speed > people_desired
            scale = people_desired / jnp.maximum(speed, _EPS_DIR)
            nvx = jnp.where(over, nvx * scale, nvx)
            nvy = jnp.where(over, nvy * scale, nvy)
            new_yaw = _wrap_poly(_atan2_poly(nvy, nvx))
            n_av = _wrap_poly(new_yaw - yaw[j]) / dt
            npx = px[j] + nvx * dt
            npy = py[j] + nvy * dt
            n_lv = _norm2(nvx, nvy)
            reach = (has_goal[j] > 0.0) & (
                _norm2(gx[j] - npx, gy[j] - npy) <= goal_radius
            )
            n_has_goal = jnp.where(reach, 0.0, has_goal[j])

            nex, ney, inb = lookup(j, npx, npy)
            n_ohas = jnp.where(inb & esdf_valid, 1.0, 0.0)

            act = valid0[j] & active_step
            px[j] = jnp.where(act, npx, px[j])
            py[j] = jnp.where(act, npy, py[j])
            vx[j] = jnp.where(act, nvx, vx[j])
            vy[j] = jnp.where(act, nvy, vy[j])
            yaw[j] = jnp.where(act, new_yaw, yaw[j])
            lv[j] = jnp.where(act, n_lv, lv[j])
            av[j] = jnp.where(act, n_av, av[j])
            has_goal[j] = jnp.where(act, n_has_goal, has_goal[j])
            oex[j] = jnp.where(act, nex, oex[j])
            oey[j] = jnp.where(act, ney, oey[j])
            ohas[j] = jnp.where(act, n_ohas, ohas[j])

            t_col = jnp.where(act, (step_f + 1.0) * dt, -1.0)
            base = (i * n + j) * 6
            out_ref[base + 0, :] = jnp.where(act, px[j], 0.0)
            out_ref[base + 1, :] = jnp.where(act, py[j], 0.0)
            out_ref[base + 2, :] = jnp.where(act, yaw[j], 0.0)
            out_ref[base + 3, :] = t_col
            out_ref[base + 4, :] = jnp.where(act, lv[j], 0.0)
            out_ref[base + 5, :] = jnp.where(act, av[j], 0.0)


def project_people_pallas(
    init_people,   # (B, N, 6)
    robot_traj,    # (B, S+1, 6)
    robot_traj_n,  # (B,)
    oxy_u16,       # (B, N, window^2) uint16
    start_col,     # (B, N) int32
    start_row,     # (B, N) int32
    esdf_origin,   # (B, 2)
    esdf_resolution,  # (B,)
    esdf_valid,    # (B,)
    grid_hw,       # (H, W) static
    window: int,
    maxtime: float,
    dt: float,
    params,
    people_desired_vel: float,
    people_radius: float,
    goal_radius: float,
    interpret: bool = False,
):
    """Returns (B, S+1, N, 6), slot 0 = init_people verbatim."""
    b, n, _ = init_people.shape
    s = robot_traj.shape[1] - 1
    wsq = window * window
    dtype = init_people.dtype
    b_pad = -(-b // _BT) * _BT

    def pad(x):
        if x.shape[-1] == b_pad:
            return x
        widths = [(0, 0)] * (x.ndim - 1) + [(0, b_pad - x.shape[-1])]
        return jnp.pad(x, widths)

    people_t = pad(jnp.transpose(init_people, (1, 2, 0)).reshape(n * 6, b))
    traj_t = pad(jnp.transpose(robot_traj[:, :-1], (1, 2, 0)).reshape(s * 6, b))
    meta = jnp.zeros((8, b), dtype)
    meta = meta.at[0].set(robot_traj_n.astype(dtype))
    meta = meta.at[1].set(esdf_origin[:, 0])
    meta = meta.at[2].set(esdf_origin[:, 1])
    meta = meta.at[3].set(esdf_resolution)
    meta = meta.at[4].set(esdf_valid.astype(dtype))
    meta_t = pad(meta)
    # Padded lanes: resolution 0 would divide by zero -> set 1 on padding.
    if b_pad != b:
        meta_t = meta_t.at[3, b:].set(1.0)
    oxy_t = pad(jnp.transpose(oxy_u16, (1, 2, 0)).astype(jnp.int32))  # (N, WSQ, B)
    start_t = pad(
        jnp.concatenate([start_col.T, start_row.T], axis=0).astype(jnp.int32)
    )  # (2N, B)

    from nav2_social_mpc_controller_tpu.models.sfm import SFMParams

    p: SFMParams = params
    statics = (
        n, s, wsq, window, grid_hw[1], grid_hw[0], maxtime, dt,
        (p.lam, p.gamma, p.n, p.n_prime, p.force_factor_social),
        people_desired_vel, people_radius, goal_radius,
        p.force_factor_desired, p.relaxation_time,
        p.force_factor_obstacle, p.force_sigma_obstacle,
    )

    def spec(rows):
        return pl.BlockSpec((rows, _BT), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_sfm_scan_kernel, statics),
        out_shape=jax.ShapeDtypeStruct((s * n * 6, b_pad), dtype),
        grid=(b_pad // _BT,),
        in_specs=[
            spec(n * 6),
            spec(s * 6),
            spec(8),
            pl.BlockSpec((n, wsq, _BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            spec(2 * n),
        ],
        out_specs=spec(s * n * 6),
        interpret=interpret,
    )(people_t, traj_t, meta_t, oxy_t, start_t)

    steps = jnp.transpose(out[:, :b].reshape(s, n, 6, b), (3, 0, 1, 2))  # (B, S, N, 6)
    return jnp.concatenate([init_people[:, None, :, :], steps], axis=1)
