"""Pallas TPU kernel: fused batched bicubic sample + analytic derivatives.

The obstacle critic linearization samples the (windowed) costmap at S rollout
front points per scenario per LM iteration, needing (value, d/drow, d/dcol)
(world/grid.py `_bicubic_flat_with_grads`). The XLA formulation materializes
four (B, S, n) Catmull-Rom stencil matrices in HBM and pays sublane->lane
broadcast relayouts building them — ~1.26 ms per LM iteration at B=4096 on
v5e, a third of the whole iteration.

This kernel keeps the whole chain in VMEM **in transposed layout**: the grid
axis lives on sublanes and the sample axis on lanes, so the one-hot stencil
construction only ever broadcasts along sublanes (free on the VPU) — the
lane-direction broadcast of per-sample indices/weights is what made both the
XLA path and a naive (S, n)-layout kernel ~10x slower than the VPU bound.
Per scenario it runs one (W, H) @ (H, 2S) MXU dot against the pre-transposed
window and reduces along sublanes to the three (B, S) outputs.

Semantics match the XLA stencil path (border clamping with accumulating
duplicate taps, floor() excluded from the derivative) — which itself matches
ceres::BiCubicInterpolator (obstacle_cost_function.hpp:137-167). With
use_bf16=True the dot truncates operands to bfloat16, the same behavior XLA
applies to f32 matmuls on TPU at DEFAULT precision.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_BLOCK = 8  # scenarios per grid step

def _tap_weights(x):
    """Catmull-Rom tap weights + x-derivatives for fraction x (any shape).

    Same polynomials as world.grid._stencil_weights; returns two lists of
    four arrays (avoiding a stacked tap axis, which would be a tiny
    trailing dim on TPU)."""
    x2 = x * x
    x3 = x2 * x
    wts = [
        0.5 * (-x3 + 2.0 * x2 - x),
        0.5 * (3.0 * x3 - 5.0 * x2 + 2.0),
        0.5 * (-3.0 * x3 + 4.0 * x2 + x),
        0.5 * (x3 - x2),
    ]
    dwts = [
        0.5 * (-3.0 * x2 + 4.0 * x - 1.0),
        0.5 * (9.0 * x2 - 10.0 * x),
        0.5 * (-9.0 * x2 + 8.0 * x + 1.0),
        0.5 * (3.0 * x2 - 2.0 * x),
    ]
    return wts, dwts

def _stencils_t(coord_lane, n):
    """(1, S) lane-oriented coords -> transposed stencil matrices (n, S):
    the four tap weights (and derivative weights) one-hot-accumulated at
    clip(floor(coord)+d-1, 0, n-1). Clamped duplicate taps accumulate.

    Layout rule: `iota` varies along sublanes (native), and every
    per-sample quantity (idx, weights) is lane-oriented and broadcasts
    along sublanes — both directions are free on the VPU."""
    s = coord_lane.shape[-1]
    i0 = jnp.floor(coord_lane)
    wts, dwts = _tap_weights(coord_lane - i0)
    i0 = i0.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, s), dimension=0)
    t = jnp.zeros((n, s), coord_lane.dtype)
    tp = jnp.zeros((n, s), coord_lane.dtype)
    for d in range(4):
        idx = jnp.clip(i0 + (d - 1), 0, n - 1)  # (1, S)
        onehot = (iota == idx).astype(coord_lane.dtype)  # (n, S)
        t = t + wts[d] * onehot
        tp = tp + dwts[d] * onehot
    return t, tp

def _linearize_kernel(use_bf16: bool, win_t_ref, rows_ref, cols_ref,
                      val_ref, drow_ref, dcol_ref):
    bb, w, h = win_t_ref.shape  # window block, pre-transposed to (W, H)
    s = rows_ref.shape[1]
    dot_dtype = jnp.bfloat16 if use_bf16 else win_t_ref.dtype

    for b in range(bb):
        r_t, rp_t = _stencils_t(rows_ref[b:b + 1, :], h)  # (H, S)
        c_t, cp_t = _stencils_t(cols_ref[b:b + 1, :], w)  # (W, S)
        both = jnp.concatenate([r_t, rp_t], axis=1)  # (H, 2S) — lane concat
        res = jnp.dot(
            win_t_ref[b].astype(dot_dtype),
            both.astype(dot_dtype),
            preferred_element_type=jnp.float32,
            # Mosaic's f32 dot truncates to bf16 unless told otherwise.
            precision=None if use_bf16 else jax.lax.Precision.HIGHEST,
        )  # (W, 2S)
        rg = res[:, :s]
        rpg = res[:, s:]
        val_ref[b, :] = jnp.sum(rg * c_t, axis=0)
        drow_ref[b, :] = jnp.sum(rpg * c_t, axis=0)
        dcol_ref[b, :] = jnp.sum(rg * cp_t, axis=0)

def _packed_kernel(dot_mode: str, g: int, s_pad: int, win_ref, rows_ref, cols_ref,
                   out1_ref, out2_ref):
    """Lane-packed variant: G scenarios share each stencil tile (lanes =
    2*s_pad*G).

    Layout per group (VERDICT r1 item 4 / docs/performance.md): scenario k of
    the group owns lanes [k*2*s_pad, (k+1)*2*s_pad) — first s_pad lanes carry
    its sample coords for the VALUE stencil, the next s_pad the SAME coords
    for the derivative stencil (rows_ref/cols_ref arrive pre-duplicated).
    The G windows stack on SUBLANES in their NATURAL (H, W) layout — the MXU
    dot contracts over W against the COLUMN stencil (value|deriv halves), so
    no window transpose exists anywhere (the former pre-transpose fusion
    cost ~3.5 ms/tick at B=4096). A constant block mask folds the
    (G*H, lanes) product to per-segment (H, lanes) partials; two sublane
    reductions against the ROW stencils then yield out1 = val|dcol and
    out2 = drow|(d2f/drdc, discarded).

    Round-3 tuning (ablation-driven, tools notes in docs/performance.md):
    iotas and fold masks are hoisted out of the group loop, the one-hot
    accumulate is a single select per tap (no separate bool->float convert +
    multiply), and G=2 halves the dot's cross-scenario MAC waste — together
    325 -> 291 us/call at B=4096 (168 -> 155 at B=1024) on v5e."""
    gb, h, w = win_ref.shape  # gb = G * groups_per_block scenarios
    lanes = 2 * s_pad * g
    dot_dtype = jnp.bfloat16 if dot_mode == "bf16" else win_ref.dtype
    groups_per_block = gb // g

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    seg = 2 * s_pad
    is_deriv = (lane_idx % seg) >= s_pad  # (1, lanes)
    lane_blk = lane_idx // seg  # (1, lanes) in [0, g)
    # Loop-invariant constants, built once per grid step:
    fold_masks = [(lane_blk == k).astype(jnp.float32) for k in range(g)]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (h, lanes), 0)

    for q in range(groups_per_block):
        rows = rows_ref[q:q + 1, :]  # (1, lanes) duplicated coords
        cols = cols_ref[q:q + 1, :]

        # Column stencil (W, lanes) for the DOT: value weights on the value
        # half-segment, derivative weights on the deriv half. One select per
        # tap: where(onehot, weight, 0) fuses the convert+multiply.
        i0c = jnp.floor(cols)
        wts_c, dwts_c = _tap_weights(cols - i0c)
        i0c = i0c.astype(jnp.int32)
        zc = jnp.zeros((w, lanes), cols.dtype)
        c_big = zc
        for d in range(4):
            idx = jnp.clip(i0c + (d - 1), 0, w - 1)
            wval = jnp.where(is_deriv, dwts_c[d], wts_c[d])  # (1, lanes)
            c_big = c_big + jnp.where(
                iota_c == idx, jnp.broadcast_to(wval, (w, lanes)), zc
            )

        # Row stencils (H, lanes) for the REDUCTIONS: value weights (both
        # halves) and derivative weights (both halves).
        i0r = jnp.floor(rows)
        wts_r, dwts_r = _tap_weights(rows - i0r)
        i0r = i0r.astype(jnp.int32)
        zr = jnp.zeros((h, lanes), rows.dtype)
        r_st = zr
        rp_st = zr
        for d in range(4):
            idx = jnp.clip(i0r + (d - 1), 0, h - 1)
            m = iota_r == idx
            r_st = r_st + jnp.where(m, jnp.broadcast_to(wts_r[d], (h, lanes)), zr)
            rp_st = rp_st + jnp.where(m, jnp.broadcast_to(dwts_r[d], (h, lanes)), zr)

        # (G*H, W) @ (W, lanes) — stacked natural-layout windows on sublanes.
        a_stack = win_ref[q * g:(q + 1) * g].reshape(g * h, w)
        if dot_mode == "split3":
            # Round-5 MXU halving: the costmap windows are u8-valued
            # (Grid2D<u_char> in the reference, obstacle_cost_function.cpp),
            # i.e. integers <= 255 — EXACTLY representable in bfloat16 (8
            # mantissa bits cover integers to 256). Splitting only the
            # stencil side into three bf16 terms (hi/mid/lo = its full 24
            # mantissa bits) makes the product f32-exact in THREE bf16 MXU
            # passes instead of HIGHEST's six; the three dots run as ONE
            # lane-concatenated (G*H, W) @ (W, 3*lanes) MXU call. The
            # bf16-exactness of the window is validated at the host
            # boundary (core/validate.check_costmap_bf16_exact); the
            # SOCIAL_MPC_BICUBIC_DOT=highest escape hatch restores the
            # 6-pass dot for non-integer grids.
            a_bf = a_stack.astype(jnp.bfloat16)
            c_hi32 = c_big.astype(jnp.bfloat16).astype(jnp.float32)
            r1 = c_big - c_hi32
            c_mid32 = r1.astype(jnp.bfloat16).astype(jnp.float32)
            cc = jnp.concatenate(
                [c_hi32, c_mid32, r1 - c_mid32], axis=1
            ).astype(jnp.bfloat16)  # (W, 3*lanes)
            r3 = jnp.dot(a_bf, cc, preferred_element_type=jnp.float32)
            res = (r3[:, :lanes] + r3[:, lanes:2 * lanes]) + r3[:, 2 * lanes:]
        else:
            res = jnp.dot(
                a_stack.astype(dot_dtype), c_big.astype(dot_dtype),
                preferred_element_type=jnp.float32,
                # Mosaic's f32 dot truncates to bf16 unless told otherwise.
                precision=None if dot_mode == "bf16" else jax.lax.Precision.HIGHEST,
            )  # (G*H, lanes): value half = data@c, deriv half = data@cp
        # Fold: lane segment k only consumes window k's rows.
        res_g = res.reshape(g, h, lanes)
        gc = res_g[0] * fold_masks[0]
        for k in range(1, g):
            gc = gc + res_g[k] * fold_masks[k]

        out1_ref[q, :] = jnp.sum(gc * r_st, axis=0)   # val | dcol
        out2_ref[q, :] = jnp.sum(gc * rp_st, axis=0)  # drow | (drdc)


def resolve_dot_mode(dot_mode=None):
    """Production dot mode for the packed kernel: 'split3' (default — 3
    exact bf16 passes, requires bf16-exact window values, validated at the
    host boundary), 'highest' (6-pass f32), or 'bf16' (truncating, study
    only). SOCIAL_MPC_BICUBIC_DOT overrides, e.g. =highest for float-valued
    costmaps."""
    import os

    if dot_mode is None:
        dot_mode = os.environ.get("SOCIAL_MPC_BICUBIC_DOT", "split3")
    if dot_mode not in ("split3", "highest", "bf16"):
        raise ValueError(f"bad bicubic dot mode {dot_mode!r}")
    return dot_mode


def bicubic_linearize_pallas_packed(win, rowf, colf, use_bf16=False, interpret=False,
                                    dot_mode=None):
    """Lane-packed batched bicubic sample with derivatives: G = 2 scenarios
    share each stencil tile (lanes = 4*ceil32(S): 128 for the benchmark
    configs' S=29, 256 for the H=36 stress config), so the stencil VPU work
    runs at full lane occupancy instead of S/128 and the stacked dot wastes
    only 1 in 2 cross-scenario MACs (G=4's full-occupancy 256-lane layout
    measured SLOWER: the dot discards 3 in 4 MACs). Same semantics as
    bicubic_linearize_pallas.

    win: (B, H, W) f32 — or bf16 when the window values are bf16-exact
    (u8-valued costmaps; the fused pipeline ships the per-tick crop as bf16
    to halve the per-iteration HBM window read). rowf/colf: (B, S) f32.
    Returns (val, d_row, d_col) in rowf.dtype.
    """
    dot_mode = "bf16" if use_bf16 else resolve_dot_mode(dot_mode)
    if win.dtype == jnp.bfloat16 and dot_mode != "split3":
        # Only split3 keeps full f32 stencil weights with a bf16 window
        # operand; 'highest'/'bf16' would truncate the WEIGHTS too.
        win = win.astype(jnp.float32)
    b, h, w = win.shape
    s = rowf.shape[1]
    s_pad = max(32, -(-s // 32) * 32)  # lane half-segment
    g = 2  # scenarios per group
    if 2 * s_pad * g > 256:
        return bicubic_linearize_pallas(win, rowf, colf, use_bf16, interpret)
    lanes = 2 * s_pad * g

    groups_per_block = 16
    gb = g * groups_per_block  # scenarios per grid step
    b_pad = -(-b // gb) * gb
    if s_pad != s:
        rowf = jnp.pad(rowf, ((0, 0), (0, s_pad - s)))
        colf = jnp.pad(colf, ((0, 0), (0, s_pad - s)))
    if b_pad != b:
        rowf = jnp.pad(rowf, ((0, b_pad - b), (0, 0)))
        colf = jnp.pad(colf, ((0, b_pad - b), (0, 0)))
        win = jnp.pad(win, ((0, b_pad - b), (0, 0), (0, 0)))

    # Duplicate each scenario's coords into (value, deriv) half-segments:
    # (B, s_pad) -> (B/G, G, 2, s_pad) -> (B/G, lanes). Tiny arrays; once per
    # call (the windows, which dominate traffic, are untouched).
    def pack(x):
        xg = x.reshape(b_pad // g, g, 1, s_pad)
        return jnp.broadcast_to(xg, (b_pad // g, g, 2, s_pad)).reshape(b_pad // g, lanes)

    rows_p = pack(rowf)
    cols_p = pack(colf)

    # Natural (B, H, W) layout straight into the kernel — no transpose.
    # use_bf16 is OFF by default since round 4: the f32 HIGHEST-precision dot
    # measured FASTER than the bf16 path (651 vs 823 us/call at B=1024 —
    # the cast/relayout outweighs the halved window traffic) and is exact to
    # 1.7e-7 vs the f64 stencil; bf16 rounded the Catmull-Rom weights to
    # ~3e-3 relative (caught by the round-4 on-chip parity study). Round 5
    # adds 'split3' (see _packed_kernel), which keeps that exactness at half
    # the MXU passes for the u8-valued reference costmaps.
    if dot_mode == "bf16":
        win = win.astype(jnp.bfloat16)

    n_groups = b_pad // g
    out_shape = jax.ShapeDtypeStruct((n_groups, lanes), rowf.dtype)
    out1, out2 = pl.pallas_call(
        functools.partial(_packed_kernel, dot_mode, g, s_pad),
        out_shape=(out_shape, out_shape),
        grid=(b_pad // gb,),
        in_specs=[
            pl.BlockSpec((gb, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups_per_block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups_per_block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((groups_per_block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups_per_block, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(win, rows_p, cols_p)

    # Unpack: out1 half-segments are (val, dcol); out2's value half is drow.
    o1 = out1.reshape(n_groups, g, 2, s_pad)
    o2 = out2.reshape(n_groups, g, 2, s_pad)
    val = o1[:, :, 0, :].reshape(b_pad, s_pad)[:b, :s]
    dcol = o1[:, :, 1, :].reshape(b_pad, s_pad)[:b, :s]
    drow = o2[:, :, 0, :].reshape(b_pad, s_pad)[:b, :s]
    return val, drow, dcol


def bicubic_linearize_pallas(win, rowf, colf, use_bf16=False, interpret=False):
    """Batched bicubic sample with derivatives.

    win: (B, H, W) f32; rowf/colf: (B, S) f32.
    Returns (val, d_row, d_col), each (B, S) f32.
    """
    if win.dtype == jnp.bfloat16 and not use_bf16:
        # This variant has no split3 dot: a bf16 window (exact by contract)
        # must be upcast so the f32 HIGHEST dot keeps full-precision weights.
        win = win.astype(jnp.float32)
    b, h, w = win.shape
    s = rowf.shape[1]
    s_pad = -(-s // 128) * 128  # samples live on lanes inside the kernel
    b_pad = -(-b // BATCH_BLOCK) * BATCH_BLOCK
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s))
        rowf = jnp.pad(rowf, pad)
        colf = jnp.pad(colf, pad)
    if b_pad != b:
        rowf = jnp.pad(rowf, ((0, b_pad - b), (0, 0)))
        colf = jnp.pad(colf, ((0, b_pad - b), (0, 0)))
        win = jnp.pad(win, ((0, b_pad - b), (0, 0), (0, 0)))

    # Transpose the windows once OUTSIDE the kernel — and, when the dot runs
    # in bf16 anyway, convert them to bf16 there too, halving the kernel's
    # HBM traffic (the windows dominate it). Inside the LM loop the windows
    # are loop-invariant, so XLA hoists both ops out of the while body and
    # the recurring cost is zero.
    win_t = jnp.swapaxes(win, -1, -2)  # (B, W, H)
    if use_bf16:
        win_t = win_t.astype(jnp.bfloat16)

    out_shape = jax.ShapeDtypeStruct((b_pad, s_pad), win.dtype)
    val, drow, dcol = pl.pallas_call(
        functools.partial(_linearize_kernel, use_bf16),
        out_shape=(out_shape, out_shape, out_shape),
        grid=(b_pad // BATCH_BLOCK,),
        in_specs=[
            pl.BlockSpec((BATCH_BLOCK, w, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BATCH_BLOCK, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(win_t, rowf, colf)
    return val[:b, :s], drow[:b, :s], dcol[:b, :s]
