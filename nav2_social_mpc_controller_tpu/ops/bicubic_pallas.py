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
        )  # (W, 2S)
        rg = res[:, :s]
        rpg = res[:, s:]
        val_ref[b, :] = jnp.sum(rg * c_t, axis=0)
        drow_ref[b, :] = jnp.sum(rpg * c_t, axis=0)
        dcol_ref[b, :] = jnp.sum(rg * cp_t, axis=0)

def bicubic_linearize_pallas(win, rowf, colf, use_bf16=True, interpret=False):
    """Batched bicubic sample with derivatives.

    win: (B, H, W) f32; rowf/colf: (B, S) f32.
    Returns (val, d_row, d_col), each (B, S) f32.
    """
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
