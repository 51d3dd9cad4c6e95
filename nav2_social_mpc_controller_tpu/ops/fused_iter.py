"""Fused LM iteration: analytic residual+Jacobian -> (cost, g, JtJ) without
autodiff replay, with a Pallas TPU kernel for the batched hot path.

THE hot loop of the framework (VERDICT r3 weak 1): each of ~40 LM
iterations evaluates the critic stack and a 2B-tangent jax.linearize
replay, fragmenting into ~50 XLA ops of a few us launch+VPU time each —
73% of the controller tick at 7.6x measured headroom. This module replaces
value_grad for the benchmark configurations with:

  1. rollout + analytic sensitivities as TWO stacked cumsums (the unicycle
     prefix-sum rollout is linear in the per-step integrands, so
     d(poses)/du is itself a pair of cumsums — models/motion.py);
  2. the bicubic obstacle kernel (ops/bicubic_pallas.py) for the costmap
     value + row/col derivatives at the rollout front points;
  3. ONE fused Pallas kernel evaluating every remaining critic's residual
     AND per-step gradient (costs/critic_grads.py), chain-contracting them
     against the sensitivities, and accumulating cost, g = J^T r and
     JtJ = J^T J directly in VMEM — J is never materialized.

Residual semantics are IDENTICAL to controller.optimize.build_residual_fn
(same masks, same ordering quirks); equivalence is pinned by
tests/test_fused_iter.py against the linearize path. The fused path
engages only for batched f32 TPU execution via custom_vmap — single-lane
calls, CPU, and f64 keep the reference linearize path, so every parity
suite still pins the same code that produced the golden values.

Reference math: the residual set of /root/reference/src/optimizer.cpp:251-371
(per-critic citations in costs/critics.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nav2_social_mpc_controller_tpu.costs import critic_grads as cg
from nav2_social_mpc_controller_tpu.costs import critics
from nav2_social_mpc_controller_tpu.utils.angles import wrap_atan2


def can_fuse(cfg) -> bool:
    """The fused path covers exactly the benchmark critic set; the latent
    critics (AngleCost / CurvatureCost — compiled but never instantiated by
    the reference, SURVEY.md section 2.2) keep the reference linearize path.
    SOCIAL_MPC_DISABLE_FUSED=1 is the operational escape hatch back to the
    pure-XLA linearize pipeline."""
    import os

    if os.environ.get("SOCIAL_MPC_DISABLE_FUSED") == "1":
        return False
    w = cfg.optimizer.weights
    return w.pure_angle_weight == 0.0 and w.curvature_weight == 0.0


def agent_angle_precompute(pose0, agents_steps):
    """The u-INDEPENDENT head of the agent-angle critic
    (critics._agent_angle_impl): closest-moving-agent selection, branch
    resolution and steering target depend only on the projected agents and
    pose_0, so they are computed ONCE per solve instead of per iteration.

    pose0: (3,); agents_steps: (S, N, 6).
    Returns (steer (S,), active (S,) bool) such that the critic residual is
    active * w * wrap(new_yaw - steer)^2.
    """
    x0, y0, yaw0 = pose0[0], pose0[1], pose0[2]
    moving = agents_steps[..., 4] > critics.AGENT_ANGLE_MIN_SPEED
    dx = agents_steps[..., 0] - x0
    dy = agents_steps[..., 1] - y0
    dist_sq = dx * dx + dy * dy
    masked = jnp.where(moving, dist_sq, jnp.inf)
    ci = jnp.argmin(masked, axis=-1)
    closest_sq = jnp.min(masked, axis=-1)
    has_agent = jnp.isfinite(closest_sq) & (closest_sq <= critics.AGENT_ANGLE_SAFE_DIST_SQ)

    onehot = ci[:, None] == jnp.arange(agents_steps.shape[-2])
    ag = jnp.sum(jnp.where(onehot[..., None], agents_steps, 0.0), axis=-2)
    agent_angle_initial = jnp.arctan2(ag[:, 1] - y0, ag[:, 0] - x0)
    heading_diff = wrap_atan2(ag[:, 2] - yaw0)
    side = wrap_atan2(agent_angle_initial - yaw0)

    opposing = (heading_diff <= -critics.AGENT_ANGLE_UPPER_THRESHOLD) | (
        heading_diff >= critics.AGENT_ANGLE_THRESHOLD
    )
    active = has_agent & jnp.where(opposing, side >= 0.0, side <= 0.0)
    steer = jnp.where(
        opposing,
        yaw0 - critics.AGENT_ANGLE_THRESHOLD,
        yaw0 + critics.AGENT_ANGLE_THRESHOLD,
    )
    return steer, active


def rollout_with_sensitivities(u, pose0, dt, block_idx, n_blocks):
    """Unicycle prefix-sum rollout AND its analytic Jacobian wrt u.

    theta is linear in the controls and each position step reads theta from
    before its own update (models/motion.rollout_poses), so both the
    rollout and d(rollout)/du are prefix sums:

      theta_s        = theta0 + dt * cum(w)
      dtheta_s/dw_b  = dt * cum(E_b)
      x_s            = x0 + dt * cum(v * cos(theta_prev))
      dx_s/dv_b      = dt * cum(E_b * cos(theta_prev))
      dx_s/dw_b      = dt * cum(v * -sin(theta_prev) * dtheta_prev/dw_b)

    with E_b[s] = [block_idx[s] == b]. Two stacked cumsum ops produce all
    of it (the theta-round feeds the position-round).

    u: (B, 2); block_idx: (S,) int32. Returns
      poses   (S+1, 3),
      vw      (S, 2)            — expanded per-step controls,
      tx, ty  (S, D)            — d new_pos / du (D = 2B, u-major layout
                                  [v0, w0, v1, w1, ...]),
      tth     (S, D)            — d new_yaw / du,
      eb      (S, B) f32        — the block one-hot masks (v/w selector).
    """
    s = block_idx.shape[0]
    dtype = u.dtype
    eb = (block_idx[:, None] == jnp.arange(n_blocks)[None, :]).astype(dtype)  # (S, B)
    # where/sum one-hot expansion (exact copy — see models.motion.expand_blocks)
    v_seq = jnp.sum(jnp.where(eb > 0, u[None, :, 0], 0.0), axis=1)
    w_seq = jnp.sum(jnp.where(eb > 0, u[None, :, 1], 0.0), axis=1)

    # Round 1: theta and its w-sensitivities.
    r1 = jnp.concatenate([w_seq[:, None], eb], axis=1)  # (S, 1+B)
    c1 = dt * jnp.cumsum(r1, axis=0)
    th = pose0[2] + c1[:, 0]
    dth = c1[:, 1:]  # (S, B): d theta_s / d w_b
    th_prev = jnp.concatenate([jnp.broadcast_to(pose0[2], (1,)), th[:-1]])
    dth_prev = jnp.concatenate([jnp.zeros((1, n_blocks), dtype), dth[:-1]], axis=0)

    cosp = jnp.cos(th_prev)
    sinp = jnp.sin(th_prev)
    # Round 2: positions and their sensitivities.
    r2 = jnp.concatenate(
        [
            (v_seq * cosp)[:, None],                     # x integrand
            (v_seq * sinp)[:, None],                     # y integrand
            eb * cosp[:, None],                          # dx/dv_b
            eb * sinp[:, None],                          # dy/dv_b
            (-v_seq * sinp)[:, None] * dth_prev,         # dx/dw_b
            (v_seq * cosp)[:, None] * dth_prev,          # dy/dw_b
        ],
        axis=1,
    )  # (S, 2 + 4B)
    c2 = dt * jnp.cumsum(r2, axis=0)
    x = pose0[0] + c2[:, 0]
    y = pose0[1] + c2[:, 1]
    b = n_blocks
    dx_dv = c2[:, 2 : 2 + b]
    dy_dv = c2[:, 2 + b : 2 + 2 * b]
    dx_dw = c2[:, 2 + 2 * b : 2 + 3 * b]
    dy_dw = c2[:, 2 + 3 * b : 2 + 4 * b]

    poses = jnp.concatenate(
        [pose0[None, :], jnp.stack([x, y, th], axis=-1)], axis=0
    )  # (S+1, 3)
    vw = jnp.stack([v_seq, w_seq], axis=-1)

    # Interleave to u-major D = 2B columns [v0, w0, v1, w1, ...].
    tx = jnp.stack([dx_dv, dx_dw], axis=-1).reshape(s, 2 * b)
    ty = jnp.stack([dy_dv, dy_dw], axis=-1).reshape(s, 2 * b)
    zth = jnp.zeros_like(dth)
    tth = jnp.stack([zth, dth], axis=-1).reshape(s, 2 * b)
    return poses, vw, tx, ty, tth, eb


# ---------------------------------------------------------------------------
# The fused critic+contraction kernel.
#
# Layout: the rollout step axis on SUBLANES (S_pad = ceil8(S) rows), batch
# lanes on the LANE axis (BT = 128 per program) — (S, B)-major arrays pack
# ~91% of each VMEM tile (batch-major layout measured 4.4x lane-padding
# waste AND blew the 16 MB scoped-vmem limit). All critic math is
# elementwise VPU work; reductions run along the sublane axis. J is built
# column-by-column per critic and contracted into g / JtJ accumulators on
# the fly — the (R, D) Jacobian never exists.
# ---------------------------------------------------------------------------

_BT = 128  # batch lanes per program

# Perf-bisect knob (tools/fused_iter_bench.py --stages): which kernel stages
# to evaluate. Production always runs all; trimming the set is a measurement
# tool, not a correctness mode.
_STAGES = frozenset({
    "social", "agent_angle", "proxemics", "velocity", "goal_align",
    "dist_follow", "dist_align", "obstacle", "vf", "contract",
})

_TWO_PI = float(2.0 * np.pi)


def _wrap_poly(a):
    """Angle wrap to [-pi, pi] without atan2 (Mosaic has no atan lowering):
    a - 2pi*round(a/2pi). Agrees with the XLA path's atan2(sin a, cos a) to
    f32 rounding; the boundary convention at exactly +-pi differs on a
    measure-zero set."""
    return a - _TWO_PI * jnp.round(a * (1.0 / _TWO_PI))


def _atan01(t):
    """atan on [0, 1]: Cephes atanf range split + one tan-Newton refinement
    (sin/cos DO lower in Mosaic), landing within ~1 ulp of true atan."""
    mid = t > 0.4142135623730951
    x = jnp.where(mid, (t - 1.0) / (t + 1.0), t)
    z = x * x
    poly = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * x + x
    a = jnp.where(mid, np.float32(np.pi / 4) + poly, poly)
    s, c = jnp.sin(a), jnp.cos(a)
    return a - (s * c - t * c * c)


def _atan2_poly(y, x):
    """Quadrant-correct atan2 from _atan01. Matches jnp.arctan2 to ~1 ulp
    for finite inputs; signed-zero x<0 distinctions (atan2(-0, -1) = -pi)
    collapse to +pi — measure-zero, and the social critic only consumes
    theta through exp(-(c*theta)^2) and sign(theta)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    r = num / jnp.maximum(den, 1e-45)
    a = _atan01(r)
    a = jnp.where(swap, np.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0.0, np.float32(np.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _fused_kernel(
    statics,
    u_ref,        # (Dp, BT)       decision vars (for velocity-feasibility)
    px_ref,       # (Sp, BT)       new_pos x (poses[1:, 0])
    py_ref,       # (Sp, BT)
    pth_ref,      # (Sp, BT)       new_yaw
    v_ref,        # (Sp, BT)       expanded per-step linear velocity
    dxdv_ref,     # (NB, Sp, BT)   d new_pos_x / d v_b
    dydv_ref,     # (NB, Sp, BT)
    dxdw_ref,     # (NB, Sp, BT)   d new_pos_x / d w_b
    dydw_ref,     # (NB, Sp, BT)
    dth_ref,      # (NB, Sp, BT)   d new_yaw / d w_b
    eb_ref,       # (NB, Sp, BT)   block one-hot masks
    val_ref,      # (Sp, BT)       bicubic value at front points
    drow_ref,     # (Sp, BT)
    dcol_ref,     # (Sp, BT)
    agents_ref,   # (N*6, Sp, BT)  projected agents at step i+1
    m_step_ref,   # (Sp, BT)       step mask (0/1)
    m_vel_ref,    # (Sp, BT)       step & in_horizon
    m_social_ref, # (Sp, BT)       step & people_present
    active_ref,   # (Sp, BT)       agent-angle active & social mask
    steer_ref,    # (Sp, BT)
    refx_ref,     # (Sp, BT)       path-align target points
    refy_ref,     # (Sp, BT)
    scal_ref,     # (8, BT)        [final_x, final_y, goal_yaw, inv_res]
    vfm_ref,      # (8, BT)        velocity-feasibility pair mask
    out_ref,      # (Rp, BT)       [cost | g (D) | jtj (D*D)]
):
    d, n_blocks, n_vf, n_agents, w, desired_vel, front_offset = statics

    px, py, pth, v = px_ref[:], py_ref[:], pth_ref[:], v_ref[:]
    m_step = m_step_ref[:] > 0.0
    m_vel = m_vel_ref[:] > 0.0
    m_social = m_social_ref[:] > 0.0
    active = active_ref[:] > 0.0

    agents = [
        (
            agents_ref[k * 6 + 0],
            agents_ref[k * 6 + 1],
            agents_ref[k * 6 + 2],
            agents_ref[k * 6 + 4],
            agents_ref[k * 6 + 3] != -1.0,
        )
        for k in range(n_agents)
    ]

    # J column pieces per decision var: d = 2b -> (dxdv_b, dydv_b, None,
    # eb_b); d = 2b+1 -> (dxdw_b, dydw_b, dth_b, None).
    tx = []
    ty = []
    tth = []
    ev = []
    for b in range(n_blocks):
        tx += [dxdv_ref[b], dxdw_ref[b]]
        ty += [dydv_ref[b], dydw_ref[b]]
        tth += [None, dth_ref[b]]
        ev += [eb_ref[b], None]

    lanes = px.shape[1]
    zero_row = jnp.zeros((1, lanes), px.dtype)
    cost_acc = zero_row
    g_acc = [zero_row] * d
    jtj_acc = {}

    def red(x):
        return jnp.sum(x, axis=0, keepdims=True)

    def accumulate(r, grads, mask):
        nonlocal cost_acc
        gx, gy, gth, gv, _gw = grads
        if mask is not None:
            z = jnp.zeros_like(r)
            r = jnp.where(mask, r, z)
            gx = None if gx is None else jnp.where(mask, gx, z)
            gy = None if gy is None else jnp.where(mask, gy, z)
            gth = None if gth is None else jnp.where(mask, gth, z)
            gv = None if gv is None else jnp.where(mask, gv, z)
        cost_acc = cost_acc + 0.5 * red(r * r)
        if "contract" not in _STAGES:
            return
        cols = []
        for dd in range(d):
            jd = None
            for gc, t in ((gx, tx[dd]), (gy, ty[dd]), (gth, tth[dd]), (gv, ev[dd])):
                if gc is not None and t is not None:
                    jd = gc * t if jd is None else jd + gc * t
            cols.append(jd)
        for dd in range(d):
            if cols[dd] is not None:
                g_acc[dd] = g_acc[dd] + red(r * cols[dd])
        for d1 in range(d):
            if cols[d1] is None:
                continue
            for d2 in range(d1, d):
                if cols[d2] is None:
                    continue
                jtj_acc[(d1, d2)] = jtj_acc.get((d1, d2), zero_row) + red(
                    cols[d1] * cols[d2]
                )

    # Residual order mirrors controller.optimize.build_residual_fn. Mosaic
    # has no atan lowering, so the angle helpers use the polynomial forms.
    if "social" in _STAGES:
        r, g5 = cg.social_work_grad(
            w.social_weight, px, py, pth, v, agents,
            atan2_fn=_atan2_poly, wrap_fn=_wrap_poly,
        )
        accumulate(r, g5, m_social)
    if "agent_angle" in _STAGES:
        r, g5 = cg.agent_angle_grad(
            w.agent_angle_weight, pth, steer_ref[:], active, wrap_fn=_wrap_poly
        )
        accumulate(r, g5, None)  # active is prefolded with the social mask
    if "proxemics" in _STAGES:
        r, g5 = cg.proxemics_grad(w.proxemics_weight, px, py, agents)
        accumulate(r, g5, m_social)
    if "velocity" in _STAGES:
        r, g5 = cg.velocity_grad(w.velocity_weight, desired_vel, v, m_vel)
        accumulate(r, g5, None)  # m_vel is prefolded with the step mask
    fx = scal_ref[0:1, :]
    fy = scal_ref[1:2, :]
    goal_yaw = scal_ref[2:3, :]
    inv_res = scal_ref[3:4, :]
    if "goal_align" in _STAGES:
        r, g5 = cg.goal_align_grad(w.goal_align_weight, goal_yaw, pth, wrap_fn=_wrap_poly)
        accumulate(r, g5, m_step)
    if "dist_follow" in _STAGES:
        r, g5 = cg.distance_grad(w.distance_weight, px, py, fx, fy)
        accumulate(r, g5, m_step)
    if "dist_align" in _STAGES:
        r, g5 = cg.distance_grad(w.angle_weight, px, py, refx_ref[:], refy_ref[:])
        accumulate(r, g5, m_step)
    if "obstacle" in _STAGES:
        r, g5 = cg.obstacle_grad(
            w.obstacle_weight, val_ref[:], drow_ref[:], dcol_ref[:], pth, inv_res,
            front_offset,
        )
        accumulate(r, g5, m_step)

    # Velocity-feasibility rows between consecutive blocks: residuals and
    # Jacobian live directly in u-space (critics.velocity_feasibility_cost).
    wvf = w.velocity_feasibility_weight
    for q in range(n_vf if "vf" in _STAGES else 0):
        vq = u_ref[2 * q : 2 * q + 1, :]
        wq = u_ref[2 * q + 1 : 2 * q + 2, :]
        vq1 = u_ref[2 * q + 2 : 2 * q + 3, :]
        wq1 = u_ref[2 * q + 3 : 2 * q + 4, :]
        dv = vq1 - vq
        dw = wq1 - wq
        mask = vfm_ref[q : q + 1, :] > 0.0
        z = jnp.zeros_like(dv)
        r = jnp.where(mask, wvf * (dv * dv + dw * dw), z)
        cols = {
            2 * q: jnp.where(mask, -2.0 * wvf * dv, z),
            2 * q + 1: jnp.where(mask, -2.0 * wvf * dw, z),
            2 * q + 2: jnp.where(mask, 2.0 * wvf * dv, z),
            2 * q + 3: jnp.where(mask, 2.0 * wvf * dw, z),
        }
        cost_acc = cost_acc + 0.5 * r * r
        for dd, col in cols.items():
            g_acc[dd] = g_acc[dd] + r * col
        items = sorted(cols.items())
        for i1, (d1, c1) in enumerate(items):
            for d2, c2 in items[i1:]:
                jtj_acc[(d1, d2)] = jtj_acc.get((d1, d2), zero_row) + c1 * c2

    out_ref[0:1, :] = cost_acc
    for dd in range(d):
        out_ref[1 + dd : 2 + dd, :] = g_acc[dd]
    for d1 in range(d):
        for d2 in range(d):
            key = (min(d1, d2), max(d1, d2))
            val = jtj_acc.get(key, zero_row)
            col = 1 + d + d1 * d + d2
            out_ref[col : col + 1, :] = val


def _round_up(x, m):
    return -(-x // m) * m


def fused_cost_g_jtj(
    statics,
    u_t, px, py, pth, v, dxdv, dydv, dxdw, dydw, dth, eb,
    val, drow, dcol, agents,
    m_step, m_vel, m_social, active, steer, refx, refy, scal, vfm,
    interpret=False,
):
    """Invoke the fused kernel on (S, B)-major batched arrays.

    Returns (cost (B,), g (B, D), jtj (B, D, D))."""
    d = statics[0]
    nb = statics[1]
    sp, b = px.shape
    b_pad = _round_up(b, _BT)
    dp = u_t.shape[0]
    r_out = 1 + d + d * d
    rp = _round_up(r_out, 8)

    def pad_b(x):
        if b_pad == b:
            return x
        widths = [(0, 0)] * x.ndim
        widths[-1] = (0, b_pad - b)
        return jnp.pad(x, widths)

    (u_t, px, py, pth, v, dxdv, dydv, dxdw, dydw, dth, eb, val, drow, dcol,
     agents, m_step, m_vel, m_social, active, steer, refx, refy, scal, vfm) = (
        pad_b(x) for x in (
            u_t, px, py, pth, v, dxdv, dydv, dxdw, dydw, dth, eb, val, drow,
            dcol, agents, m_step, m_vel, m_social, active, steer, refx, refy,
            scal, vfm,
        )
    )

    grid = (b_pad // _BT,)

    def spec2(rows):
        return pl.BlockSpec((rows, _BT), lambda i: (0, i), memory_space=pltpu.VMEM)

    def spec3(lead, rows):
        return pl.BlockSpec(
            (lead, rows, _BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_fused_kernel, statics),
        out_shape=jax.ShapeDtypeStruct((rp, b_pad), px.dtype),
        grid=grid,
        in_specs=[
            spec2(dp),                                        # u_t
            spec2(sp), spec2(sp), spec2(sp), spec2(sp),       # px py pth v
            spec3(nb, sp), spec3(nb, sp), spec3(nb, sp),      # dxdv dydv dxdw
            spec3(nb, sp), spec3(nb, sp), spec3(nb, sp),      # dydw dth eb
            spec2(sp), spec2(sp), spec2(sp),                  # val drow dcol
            spec3(agents.shape[0], sp),                       # agents
            spec2(sp), spec2(sp), spec2(sp), spec2(sp), spec2(sp),
            spec2(sp), spec2(sp),                             # refx refy
            spec2(8), spec2(8),                               # scal vfm
        ],
        out_specs=spec2(rp),
        interpret=interpret,
    )(
        u_t, px, py, pth, v, dxdv, dydv, dxdw, dydw, dth, eb, val, drow, dcol,
        agents, m_step, m_vel, m_social, active, steer, refx, refy, scal, vfm,
    )
    out = out[:, :b]
    cost = out[0]
    g = out[1 : 1 + d].T
    jtj = out[1 + d : 1 + d + d * d].T.reshape(b, d, d)
    return cost, g, jtj


# ---------------------------------------------------------------------------
# Batched orchestration + custom_vmap dispatch.
# ---------------------------------------------------------------------------


def _ref_value_grad(cfg, dims, u, rows, n_rows, proj, present, cmd, cmo, cmr):
    """Reference implementation: jax.linearize over the production residual
    closure — EXACTLY the path every parity suite pins (single-lane, CPU,
    f64 all land here)."""
    from nav2_social_mpc_controller_tpu.controller.optimize import build_residual_fn
    from nav2_social_mpc_controller_tpu.core.types import Costmap
    from nav2_social_mpc_controller_tpu.solver.lm import make_value_grad

    rfn = build_residual_fn(
        cfg, dims, rows, n_rows, proj, present,
        Costmap(data=cmd, origin=cmo, resolution=cmr),
    )
    return make_value_grad(rfn, u.shape[0])(u)


def _fused_batched(cfg, dims, u, rows, n_rows, proj, present, cmd, cmo, cmr,
                   interpret=False):
    """Batched (B, ...) fused evaluation: prep in XLA (the u-independent
    pieces are loop-invariant and hoisted out of the LM while-loop by XLA),
    bicubic via the lane-packed kernel, critics+contraction via the fused
    kernel."""
    from nav2_social_mpc_controller_tpu.world.grid import (
        bicubic_linearize,
        crop_grid_window,
    )

    opt = cfg.optimizer
    w = opt.weights
    dt = cfg.trajectorizer.time_step
    b = u.shape[0]
    s = dims.s
    nb = dims.n_blocks
    d = 2 * nb
    n = proj.shape[2]
    dtype = u.dtype

    pose0 = rows[:, 0, 0:3]
    n_vel = (n_rows - 1).astype(jnp.int32)
    h_dyn = jnp.maximum(jnp.minimum(dims.horizon, n_vel), 1)
    bl_dyn = jnp.maximum(jnp.minimum(dims.block_length, h_dyn), 1)
    j = jnp.arange(s, dtype=jnp.int32)
    block_idx = jnp.minimum(j[None, :], h_dyn[:, None] - 1) // bl_dyn[:, None]
    step_mask = j[None, :] < n_vel[:, None]
    in_horizon = j[None, :] < h_dyn[:, None]
    social_mask = step_mask & present[:, None]
    m_vel = in_horizon & step_mask

    last = jnp.clip(n_rows - 1, 0, dims.maxsize - 1)
    last_row = jax.vmap(lambda r, l: r[l])(rows, last)  # (B, 6)
    final_x = last_row[:, 0]
    final_y = last_row[:, 1]
    goal_yaw = last_row[:, 2]
    refx = rows[:, 1:, 0]
    refy = rows[:, 1:, 1]

    agents_steps = proj[:, 1:]  # (B, S, N, 6)
    agents_t = jnp.transpose(agents_steps, (2, 3, 1, 0)).reshape(n * 6, s, b)
    steer, active = jax.vmap(agent_angle_precompute)(pose0, agents_steps)
    active_eff = (active & social_mask).astype(dtype)

    # Obstacle-window crop (same sizing/fallback contract as the reference
    # path — build_residual_fn). Resolutions are traced here, so the
    # opportunistic host check is a no-op; host boundaries run the hard one.
    from nav2_social_mpc_controller_tpu.core.validate import check_obstacle_window

    if check_obstacle_window(cfg, cmr):
        win, win_origin = jax.vmap(
            lambda dd, oo, rr, c: crop_grid_window(
                dd, oo, rr, c, opt.obstacle_window_cells
            )
        )(cmd, cmo, cmr, rows[:, 0, 0:2])
    else:
        win, win_origin = cmd, cmo

    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import resolve_dot_mode

    if (
        win.dtype == jnp.float32
        and resolve_dot_mode() == "split3"
        and jax.default_backend() == "tpu"
    ):
        # The window values are u8-valued and therefore bf16-EXACT (the same
        # precondition split3 already validates at the host boundary —
        # core/validate.check_costmap_bf16_exact). Storing the per-tick crop
        # as bf16 halves the packed bicubic kernel's HBM window read, the
        # single largest per-LM-iteration traffic item (16.8 -> 8.4 MB at
        # B=1024, window 64^2); split3 consumes bf16 windows with identical
        # f32-exact results (only the stencil side carries fractional bits).
        win = win.astype(jnp.bfloat16)

    # ---- (S, B)-major prep. Everything above is u-INDEPENDENT (XLA hoists
    # it out of the LM while-loop); from here the work runs per iteration.
    eb_t = jnp.transpose(
        (block_idx[:, :, None] == jnp.arange(nb)[None, None, :]), (2, 1, 0)
    ).astype(dtype)  # (NB, S, B) — u-independent, hoisted

    dp = _round_up(max(d, 1), 8)
    u_t8 = jnp.zeros((dp, b), dtype).at[:d].set(u.T)

    import os

    # MEASURED-NEUTRAL experiment, default OFF (docs/performance.md round-5
    # prep-kernel note): folding this prep into one Pallas kernel costs
    # 8.7 us/iter of kernel time but only displaces 5.7 us of XLA fusions —
    # XLA already fuses the cumsum/trig prep close to its floor, and the
    # kernel's sequential-MXU prefix sums shift the f32 summation
    # association (legitimate, but it perturbs captured parity artifacts
    # for zero wall-clock gain). SOCIAL_MPC_PREP_KERNEL=1 opts in.
    use_prep_kernel = bool(os.environ.get("SOCIAL_MPC_PREP_KERNEL")) and (
        interpret or jax.default_backend() == "tpu"
    )
    if use_prep_kernel:
        # One Pallas kernel for the whole u-dependent prep (rollout +
        # sensitivities + bicubic coords): replaces ~19 per-iteration XLA
        # micro-fusions with one dispatch (ops/rollout_pallas.py).
        from nav2_social_mpc_controller_tpu.ops.rollout_pallas import (
            rollout_prep_pallas,
        )

        sc8 = (
            jnp.zeros((8, b), dtype)
            .at[0].set(pose0[:, 0])
            .at[1].set(pose0[:, 1])
            .at[2].set(pose0[:, 2])
            .at[3].set(win_origin[:, 0])
            .at[4].set(win_origin[:, 1])
            .at[5].set(cmr)
        )  # u-independent, hoisted
        (px, py, pth, v_t, dxdv, dydv, dxdw, dydw, dth, row, col) = (
            rollout_prep_pallas(
                u_t8, eb_t, sc8, s, nb, dt, critics.FRONT_OFFSET,
                interpret=interpret,
            )
        )
    else:
        # XLA formulation: rollout + sensitivities in transposed layout;
        # the cumsums run along the middle axis of (K, S, B) stacks, so no
        # per-iteration transposes exist anywhere
        # (rollout_with_sensitivities documents the math).
        u_blocks = u.reshape(b, nb, 2)
        uv = jnp.transpose(u_blocks[:, :, 0])  # (NB, B)
        uw = jnp.transpose(u_blocks[:, :, 1])
        v_t = jnp.sum(jnp.where(eb_t > 0, uv[:, None, :], 0.0), axis=0)  # (S, B)
        w_t = jnp.sum(jnp.where(eb_t > 0, uw[:, None, :], 0.0), axis=0)

        th0 = pose0[:, 2][None, :]  # (1, B)
        r1 = jnp.concatenate([w_t[None], eb_t], axis=0)  # (1+NB, S, B)
        c1 = dt * jnp.cumsum(r1, axis=1)
        th = th0 + c1[0]  # (S, B)
        dth = c1[1:]  # (NB, S, B)
        th_prev = jnp.concatenate([jnp.broadcast_to(th0, (1, b)), th[:-1]], axis=0)
        dth_prev = jnp.concatenate(
            [jnp.zeros((nb, 1, b), dtype), dth[:, :-1]], axis=1
        )

        cosp = jnp.cos(th_prev)
        sinp = jnp.sin(th_prev)
        r2 = jnp.concatenate(
            [
                (v_t * cosp)[None],
                (v_t * sinp)[None],
                eb_t * cosp[None],
                eb_t * sinp[None],
                (-v_t * sinp)[None] * dth_prev,
                (v_t * cosp)[None] * dth_prev,
            ],
            axis=0,
        )  # (2 + 4NB, S, B)
        c2 = dt * jnp.cumsum(r2, axis=1)
        px = pose0[:, 0][None, :] + c2[0]
        py = pose0[:, 1][None, :] + c2[1]
        dxdv = c2[2 : 2 + nb]
        dydv = c2[2 + nb : 2 + 2 * nb]
        dxdw = c2[2 + 2 * nb : 2 + 3 * nb]
        dydw = c2[2 + 3 * nb : 2 + 4 * nb]
        pth = th

        fxp = px + critics.FRONT_OFFSET * jnp.cos(pth)
        fyp = py + critics.FRONT_OFFSET * jnp.sin(pth)
        col = (fxp - win_origin[:, 0][None, :]) / cmr[None, :]
        row = (fyp - win_origin[:, 1][None, :]) / cmr[None, :]

    # Bicubic value + derivatives at the rollout front points (the packed
    # kernel is (B, S)-major: two transposes in, three out, per iteration).
    val, drow, dcol = jax.vmap(bicubic_linearize)(win, row.T, col.T)
    val, drow, dcol = val.T, drow.T, dcol.T

    inv_res = 1.0 / cmr
    scal = jnp.zeros((8, b), dtype)
    scal = scal.at[0].set(final_x).at[1].set(final_y)
    scal = scal.at[2].set(goal_yaw).at[3].set(inv_res)

    vf_step = jnp.arange(dims.n_vf, dtype=jnp.int32) + 1
    vfm = (vf_step[:, None] < (h_dyn // bl_dyn)[None, :]) & (
        vf_step[:, None] < n_vel[None, :]
    )
    vfm8 = jnp.zeros((8, b), dtype).at[: dims.n_vf].set(vfm.astype(dtype))

    statics = (d, nb, dims.n_vf, n, w, opt.desired_linear_vel, critics.FRONT_OFFSET)
    return fused_cost_g_jtj(
        statics,
        u_t8, px, py, pth, v_t, dxdv, dydv, dxdw, dydw, dth, eb_t,
        val, drow, dcol, agents_t,
        step_mask.T.astype(dtype), m_vel.T.astype(dtype),
        social_mask.T.astype(dtype), active_eff.T, steer.T,
        refx.T, refy.T, scal, vfm8,
        interpret=interpret,
    )


def _fused_dispatch_ok(cfg, u, backend=None) -> bool:
    """Whether the batched fused-kernel path may serve this (cfg, u):
    batched f32 on TPU AND a critic set the kernel fully implements.
    can_fuse folds in the latent-critic weights (AngleCost/CurvatureCost are
    NOT in the kernel) and the SOCIAL_MPC_DISABLE_FUSED escape hatch — a
    config the kernel cannot represent must take the reference linearize
    path even under vmap (ADVICE r4: the weight check was previously only
    applied by solve_prepared, so make_step_batch_compacted could dispatch
    the kernel on a latent-weight config)."""
    if backend is None:
        backend = jax.default_backend()
    return (
        u.dtype == jnp.float32
        and backend == "tpu"
        and u.ndim == 2
        and can_fuse(cfg)
    )


def make_value_grad_op(cfg, dims):
    """The custom_vmap value-grad op: op(u, rows, n_rows, proj, present,
    cm_data, cm_origin, cm_res) -> (cost, g, jtj). Unbatched (and CPU /
    f64 batched) execution is EXACTLY the reference linearize path over
    build_residual_fn; batched f32 TPU execution takes the fused kernel
    pipeline. Exposed with explicit data operands so the compacted batched
    solver (solver/batched.py) can gather/scatter the data alongside the
    solver state."""

    @jax.custom_batching.custom_vmap
    def op(u, rows, n_rows, proj, present, cmd, cmo, cmr):
        return _ref_value_grad(cfg, dims, u, rows, n_rows, proj, present, cmd, cmo, cmr)

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):
        out_batched = (True, True, True)
        args = [
            a if bt else jnp.broadcast_to(jnp.asarray(a), (axis_size,) + jnp.shape(a))
            for a, bt in zip(args, in_batched)
        ]
        u = args[0]
        if _fused_dispatch_ok(cfg, u):
            return _fused_batched(cfg, dims, *args), out_batched
        return (
            jax.vmap(functools.partial(_ref_value_grad, cfg, dims))(*args),
            out_batched,
        )

    return op


def build_value_grad(cfg, dims, rows, n_rows, people_proj, present, costmap):
    """value_grad(u) -> (cost, g, jtj) for lm_solve (per-lane closure over
    the scenario data; see make_value_grad_op for the dispatch contract)."""
    op = make_value_grad_op(cfg, dims)
    data = value_grad_data(rows, n_rows, people_proj, present, costmap)

    def value_grad(u):
        return op(u, *data)

    return value_grad


def value_grad_data(rows, n_rows, people_proj, present, costmap):
    """The operand tuple make_value_grad_op consumes after u."""
    return (
        rows, n_rows, people_proj, present,
        jnp.asarray(costmap.data), jnp.asarray(costmap.origin),
        jnp.asarray(costmap.resolution),
    )
