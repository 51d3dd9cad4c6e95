"""Fused rollout-prep Pallas kernel: the u-DEPENDENT per-LM-iteration prep
of the batched fused pipeline (ops/fused_iter._fused_batched) as ONE kernel.

Round-5 trace accounting (docs/performance.md): after the bicubic, critic
and propose/commit kernels, an LM iteration still ran ~19 XLA micro-fusions
and ~16 copies (~25-30 us/iter at B=1024, each sub-us — launch-floor bound,
not bandwidth): the block one-hot expansions, the two stacked rollout
cumsums, the trig, the sensitivity products and the bicubic coordinate
transforms. This kernel computes all of it in VMEM per batch tile:

  v_s, w_s     = sum_b E_b * u_{v,b} / u_{w,b}        (exact: E_b in {0,1})
  theta_s      = theta_0 + dt * cum(w)                 (prefix sums as
  x_s, y_s     = p_0 + dt * cum(v cos/sin(theta_prev))  0/1 lower-triangular
  d{x,y,th}/du = dt * cum(E_b-weighted integrands)      MXU dots)
  row/col_s    = (front-point - window_origin) / resolution

matching models/motion.rollout_poses semantics (reference
computeUpdatedStateRedux, optimizer.cpp:560-585) and the XLA formulation it
replaces bit-for-bit in the products (the cumsum SUMMATION association
differs: sequential MXU accumulation vs XLA's reduce-window tree — within
~1 ulp of each other; pinned by tests/test_rollout_pallas.py and the
fused-vs-linearize suite).

The cumsum matrices are 0/1 (bf16-exact), but the integrand operand is a
general f32, so the dots run at Precision.HIGHEST (Mosaic's default f32 dot
truncates to bf16 — docs/performance.md round-4 rules of thumb).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BT = 512  # batch lanes per grid step


def _round_up(x, m):
    return -(-x // m) * m


def _rollout_kernel(statics, u_ref, ebt_ref, sc_ref,
                    px_ref, py_ref, pth_ref, v_ref,
                    dxdv_ref, dydv_ref, dxdw_ref, dydw_ref, dth_ref,
                    row_ref, col_ref):
    nb, s, s_pad, dt, front = statics
    bt = u_ref.shape[-1]
    f32 = jnp.float32
    dt = f32(dt)
    front = f32(front)

    ii = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    t_inc = (jj <= ii).astype(f32)   # inclusive prefix sum
    t_exc = (jj < ii).astype(f32)    # exclusive (the "_prev" shift)

    hi = jax.lax.Precision.HIGHEST

    def cum_inc(x):
        return jnp.dot(t_inc, x, preferred_element_type=f32, precision=hi)

    def cum_exc(x):
        return jnp.dot(t_exc, x, preferred_element_type=f32, precision=hi)

    pad_rows = s_pad - s

    def padded(x):  # (s, bt) -> (s_pad, bt), zeros below
        if pad_rows:
            return jnp.concatenate([x, jnp.zeros((pad_rows, bt), f32)], axis=0)
        return x

    eb = [padded(ebt_ref[k]) for k in range(nb)]

    # Exact one-hot control expansion (E_b in {0,1}; same products and
    # k-order as the XLA where-sum).
    v_t = jnp.zeros((s_pad, bt), f32)
    w_t = jnp.zeros((s_pad, bt), f32)
    for k in range(nb):
        v_t = v_t + eb[k] * u_ref[2 * k : 2 * k + 1, :]
        w_t = w_t + eb[k] * u_ref[2 * k + 1 : 2 * k + 2, :]

    x0 = sc_ref[0:1, :]
    y0 = sc_ref[1:2, :]
    th0 = sc_ref[2:3, :]
    ox = sc_ref[3:4, :]
    oy = sc_ref[4:5, :]
    res = sc_ref[5:6, :]

    th = th0 + dt * cum_inc(w_t)
    th_prev = th0 + dt * cum_exc(w_t)
    cosp = jnp.cos(th_prev)
    sinp = jnp.sin(th_prev)

    vcos = v_t * cosp
    vsin = v_t * sinp
    nvsin = (-v_t) * sinp
    px = x0 + dt * cum_inc(vcos)
    py = y0 + dt * cum_inc(vsin)

    fx = px + front * jnp.cos(th)
    fy = py + front * jnp.sin(th)
    col = (fx - ox) / res
    row = (fy - oy) / res

    px_ref[...] = px[:s]
    py_ref[...] = py[:s]
    pth_ref[...] = th[:s]
    v_ref[...] = v_t[:s]
    row_ref[...] = row[:s]
    col_ref[...] = col[:s]

    for k in range(nb):
        dth_prev_k = dt * cum_exc(eb[k])
        dth_ref[k] = (dt * cum_inc(eb[k]))[:s]
        dxdv_ref[k] = (dt * cum_inc(eb[k] * cosp))[:s]
        dydv_ref[k] = (dt * cum_inc(eb[k] * sinp))[:s]
        dxdw_ref[k] = (dt * cum_inc(nvsin * dth_prev_k))[:s]
        dydw_ref[k] = (dt * cum_inc(vcos * dth_prev_k))[:s]


def rollout_prep_pallas(u_t, ebt, sc, s, nb, dt, front, interpret=False):
    """u_t: (Dp, B) controls transposed ([v0, w0, v1, w1, ...] rows, padded);
    ebt: (NB, S, B) f32 block one-hots; sc: (8, B) scalar rows
    [x0, y0, th0, origin_x, origin_y, resolution, -, -].

    Returns (px, py, pth, v_t, dxdv, dydv, dxdw, dydw, dth, row, col) —
    (S, B) planes / (NB, S, B) stacks, all f32.
    """
    dp, b = u_t.shape
    s_pad = _round_up(s, 8)
    b_pad = _round_up(b, _BT)

    def pad_b(x):
        if b_pad == b:
            return x
        widths = [(0, 0)] * x.ndim
        widths[-1] = (0, b_pad - b)
        return jnp.pad(x, widths)

    u_t, ebt, sc = pad_b(u_t), pad_b(ebt), pad_b(sc)
    # Padded lanes divide by resolution 0: keep the divisor nonzero there.
    if b_pad != b:
        sc = sc.at[5, b:].set(1.0)

    grid = (b_pad // _BT,)

    def spec2(rows):
        return pl.BlockSpec((rows, _BT), lambda i: (0, i), memory_space=pltpu.VMEM)

    def spec3(lead, rows):
        return pl.BlockSpec(
            (lead, rows, _BT), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    out2 = jax.ShapeDtypeStruct((s, b_pad), jnp.float32)
    out3 = jax.ShapeDtypeStruct((nb, s, b_pad), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_rollout_kernel, (nb, s, s_pad, float(dt), float(front))),
        out_shape=(out2, out2, out2, out2, out3, out3, out3, out3, out3,
                   out2, out2),
        grid=grid,
        in_specs=[spec2(dp), spec3(nb, s), spec2(8)],
        out_specs=(spec2(s), spec2(s), spec2(s), spec2(s),
                   spec3(nb, s), spec3(nb, s), spec3(nb, s), spec3(nb, s),
                   spec3(nb, s), spec2(s), spec2(s)),
        interpret=interpret,
    )(u_t, ebt, sc)
    if b_pad == b:
        return outs
    return tuple(o[..., :b] for o in outs)
