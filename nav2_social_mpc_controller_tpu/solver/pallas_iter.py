"""Pallas TPU kernels for the non-evaluation half of one LM iteration.

After round 4 the per-iteration cost at B=1024 was two Pallas kernels
(bicubic + fused critics) plus ~45 tiny XLA fusions (~27 us) of
trust-region bookkeeping: diagonal clamp, damped-system build, box clip,
model-cost dots, accept/reject selects, radius/convergence updates — each a
few-microsecond launch on (B,) / (B, D) operands. This module folds them
into TWO lane-batched kernels so one LM iteration is ~4 dispatches total:

  tr_propose   (u, g, jtj, radius, lower, upper) ->
               (u_new, delta, model_change)
               = diag clamp + damped Cholesky solve (the unrolled
               lane-vector factorization of solver/pallas_solve.py) + box
               projection + model-cost contractions, all in VMEM.

  tr_commit    (state..., trial results...) -> updated state
               = rho, accept/reject, radius & decrease-factor updates,
               frozen-lane guards, the three tolerance stops, termination
               codes — the exact tail of solver.lm.lm_iteration.

Both are custom_vmap ops: UNBATCHED (and CPU / f64 / non-default-solver)
execution runs the reference XLA formulation — the identical code the
parity suites pin — and only batched f32 TPU execution dispatches the
kernels. Reference semantics: the Ceres trust-region update rules
reproduced in solver/lm.py (levenberg_marquardt_strategy.cc /
trust_region_minimizer.cc); equivalence is pinned by
tests/test_pallas_iter.py (interpret mode) and the fused-vs-linearize
on-chip artifact.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nav2_social_mpc_controller_tpu.solver.pallas_solve import _xla_spd_solve

LANE_BLOCK = 512

TERM_NO_CONVERGENCE = 0
TERM_FUNCTION_TOL = 1
TERM_PARAMETER_TOL = 2
TERM_GRADIENT_TOL = 3
TERM_MIN_RADIUS = 4
TERM_NUMERIC_FAILURE = 5


# ---------------------------------------------------------------------------
# Reference (per-lane, XLA) formulations — EXACTLY the math lm_iteration ran
# before this module existed; the custom_vmap ops fall back to these.
# ---------------------------------------------------------------------------


def propose_ref(cfg, u, g, jtj, radius, lower, upper):
    hi = jax.lax.Precision.HIGHEST
    diag = jnp.clip(jnp.diagonal(jtj), cfg.min_diagonal, cfg.max_diagonal)
    a = jtj + jnp.diag(diag / radius)
    delta = _xla_spd_solve(a, -g)
    u_new = jnp.clip(u + delta, lower, upper)
    delta = u_new - u
    model_change = -jnp.vdot(delta, g, precision=hi) - 0.5 * jnp.vdot(
        delta, jnp.matmul(jtj, delta, precision=hi), precision=hi
    )
    return u_new, delta, model_change


def commit_ref(cfg, u, cost, g, jtj, radius, decrease_factor, iters, done, term,
               failed, u_new, delta, model_change, new_cost, g_new, jtj_new):
    """The accept/reject + convergence tail of solver.lm.lm_iteration,
    verbatim (see that function for the Ceres citations)."""
    grad_ok = jnp.max(jnp.abs(g)) <= cfg.gradient_tol
    actual_change = cost - new_cost
    rho = actual_change / model_change
    step_valid = (
        (model_change > 0.0) & jnp.isfinite(new_cost) & jnp.all(jnp.isfinite(delta))
    )
    active = ~done
    accept = active & step_valid & (rho > cfg.min_relative_decrease)

    shrink = 2.0 * rho - 1.0
    grow = jnp.maximum(1.0 / 3.0, 1.0 - shrink * shrink * shrink)
    radius_acc = jnp.minimum(radius / grow, cfg.max_radius)
    radius_rej = radius / decrease_factor
    radius_out = jnp.where(active, jnp.where(accept, radius_acc, radius_rej), radius)
    decrease_out = jnp.where(
        active, jnp.where(accept, 2.0, decrease_factor * 2.0), decrease_factor
    )

    u_out = jnp.where(accept, u_new, u)
    g_out = jnp.where(accept, g_new, g)
    jtj_out = jnp.where(accept, jtj_new, jtj)
    cost_out = jnp.where(accept, new_cost, cost)

    fn_conv = accept & (jnp.abs(actual_change) <= cfg.fn_tol * cost)
    step_norm = jnp.linalg.norm(delta)
    param_conv = accept & (
        step_norm <= cfg.param_tol * (jnp.linalg.norm(u) + cfg.param_tol)
    )
    radius_dead = active & (radius_out < cfg.min_radius)
    numeric_failed = active & (
        ~jnp.isfinite(cost_out) | jnp.any(~jnp.isfinite(u_out))
    )
    grad_ok = active & grad_ok

    term_new = jnp.where(
        numeric_failed,
        TERM_NUMERIC_FAILURE,
        jnp.where(
            grad_ok,
            TERM_GRADIENT_TOL,
            jnp.where(
                fn_conv,
                TERM_FUNCTION_TOL,
                jnp.where(
                    param_conv,
                    TERM_PARAMETER_TOL,
                    jnp.where(radius_dead, TERM_MIN_RADIUS, TERM_NO_CONVERGENCE),
                ),
            ),
        ),
    ).astype(jnp.int32)
    newly_done = numeric_failed | grad_ok | fn_conv | param_conv | radius_dead

    dtype = u.dtype
    return (
        u_out,
        cost_out,
        g_out,
        jtj_out,
        radius_out.astype(dtype),
        decrease_out.astype(dtype),
        iters + active.astype(jnp.int32),
        done | newly_done,
        jnp.where(done, term, term_new),
        failed | numeric_failed,
    )


# ---------------------------------------------------------------------------
# Kernels (lanes = batch; D unrolled).
# ---------------------------------------------------------------------------


def _propose_kernel(cfg, d, jtj_ref, g_ref, u_ref, radius_ref, lo_ref, hi_ref,
                    unew_ref, delta_ref, mc_ref):
    inv_radius = 1.0 / radius_ref[0, :]

    def a(i, j):
        base = jtj_ref[i * d + j, :]
        if i != j:
            return base
        diag = jnp.clip(base, cfg.min_diagonal, cfg.max_diagonal)
        return base + diag * inv_radius

    # Unrolled lane-vector Cholesky of the damped system (same scheme as
    # solver/pallas_solve.py) solving A x = -g.
    el = {}
    inv_diag = {}
    for j in range(d):
        s = a(j, j)
        for k in range(j):
            s = s - el[(j, k)] * el[(j, k)]
        ljj = jnp.sqrt(s)
        el[(j, j)] = ljj
        inv_diag[j] = 1.0 / ljj
        for i in range(j + 1, d):
            s = a(i, j)
            for k in range(j):
                s = s - el[(i, k)] * el[(j, k)]
            el[(i, j)] = s * inv_diag[j]
    y = {}
    for i in range(d):
        s = -g_ref[i, :]
        for k in range(i):
            s = s - el[(i, k)] * y[k]
        y[i] = s * inv_diag[i]
    x = {}
    for i in reversed(range(d)):
        s = y[i]
        for k in range(i + 1, d):
            s = s - el[(k, i)] * x[k]
        x[i] = s * inv_diag[i]

    u_new = {}
    delta = {}
    for i in range(d):
        un = jnp.minimum(jnp.maximum(u_ref[i, :] + x[i], lo_ref[i, :]), hi_ref[i, :])
        u_new[i] = un
        delta[i] = un - u_ref[i, :]
        unew_ref[i, :] = un
        delta_ref[i, :] = delta[i]

    # model_change = -<delta, g> - 0.5 <delta, JtJ delta> (undamped JtJ)
    dg = delta[0] * g_ref[0, :]
    for i in range(1, d):
        dg = dg + delta[i] * g_ref[i, :]
    dad = jnp.zeros_like(dg)
    for i in range(d):
        row = jtj_ref[i * d + 0, :] * delta[0]
        for j in range(1, d):
            row = row + jtj_ref[i * d + j, :] * delta[j]
        dad = dad + delta[i] * row
    mc_ref[0, :] = -dg - 0.5 * dad


def _commit_kernel(cfg, d, u_ref, g_ref, jtj_ref, sf_ref, si_ref,
                   unew_ref, delta_ref, mc_ref, newcost_ref, gnew_ref, jtjnew_ref,
                   uo_ref, go_ref, jtjo_ref, sfo_ref, sio_ref):
    cost = sf_ref[0, :]
    radius = sf_ref[1, :]
    decrease = sf_ref[2, :]
    iters = si_ref[0, :]
    done = si_ref[1, :] != 0
    term = si_ref[2, :]
    failed = si_ref[3, :] != 0

    g_max = jnp.abs(g_ref[0, :])
    for i in range(1, d):
        g_max = jnp.maximum(g_max, jnp.abs(g_ref[i, :]))
    grad_ok = g_max <= cfg.gradient_tol

    mc = mc_ref[0, :]
    new_cost = newcost_ref[0, :]
    actual_change = cost - new_cost
    rho = actual_change / mc

    delta_finite = jnp.isfinite(delta_ref[0, :])
    step_sq = delta_ref[0, :] * delta_ref[0, :]
    u_sq = u_ref[0, :] * u_ref[0, :]
    for i in range(1, d):
        delta_finite = delta_finite & jnp.isfinite(delta_ref[i, :])
        step_sq = step_sq + delta_ref[i, :] * delta_ref[i, :]
        u_sq = u_sq + u_ref[i, :] * u_ref[i, :]
    step_valid = (mc > 0.0) & jnp.isfinite(new_cost) & delta_finite
    active = ~done
    accept = active & step_valid & (rho > cfg.min_relative_decrease)

    shrink = 2.0 * rho - 1.0
    grow = jnp.maximum(1.0 / 3.0, 1.0 - shrink * shrink * shrink)
    radius_acc = jnp.minimum(radius / grow, cfg.max_radius)
    radius_rej = radius / decrease
    radius_out = jnp.where(active, jnp.where(accept, radius_acc, radius_rej), radius)
    decrease_out = jnp.where(active, jnp.where(accept, 2.0, decrease * 2.0), decrease)

    cost_out = jnp.where(accept, new_cost, cost)
    u_finite = jnp.full_like(grad_ok, True)
    for i in range(d):
        uo = jnp.where(accept, unew_ref[i, :], u_ref[i, :])
        uo_ref[i, :] = uo
        u_finite = u_finite & jnp.isfinite(uo)
        go_ref[i, :] = jnp.where(accept, gnew_ref[i, :], g_ref[i, :])
    for i in range(d * d):
        jtjo_ref[i, :] = jnp.where(accept, jtjnew_ref[i, :], jtj_ref[i, :])

    fn_conv = accept & (jnp.abs(actual_change) <= cfg.fn_tol * cost)
    # norm() via sqrt of the lane-local sums (matches jnp.linalg.norm in f32)
    step_norm = jnp.sqrt(step_sq)
    param_conv = accept & (step_norm <= cfg.param_tol * (jnp.sqrt(u_sq) + cfg.param_tol))
    radius_dead = active & (radius_out < cfg.min_radius)
    numeric_failed = active & (~jnp.isfinite(cost_out) | ~u_finite)
    grad_ok = active & grad_ok

    term_new = jnp.where(
        numeric_failed,
        TERM_NUMERIC_FAILURE,
        jnp.where(
            grad_ok,
            TERM_GRADIENT_TOL,
            jnp.where(
                fn_conv,
                TERM_FUNCTION_TOL,
                jnp.where(
                    param_conv,
                    TERM_PARAMETER_TOL,
                    jnp.where(radius_dead, TERM_MIN_RADIUS, TERM_NO_CONVERGENCE),
                ),
            ),
        ),
    ).astype(jnp.int32)
    newly_done = numeric_failed | grad_ok | fn_conv | param_conv | radius_dead

    sfo_ref[0, :] = cost_out
    sfo_ref[1, :] = radius_out
    sfo_ref[2, :] = decrease_out
    sfo_ref[3, :] = sf_ref[3, :]
    sio_ref[0, :] = iters + active.astype(jnp.int32)
    sio_ref[1, :] = (done | newly_done).astype(jnp.int32)
    sio_ref[2, :] = jnp.where(done, term, term_new)
    sio_ref[3, :] = (failed | numeric_failed).astype(jnp.int32)


def _pad_lanes(x, n_pad, fill=0.0):
    n = x.shape[-1]
    if n_pad == n:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)]
    return jnp.pad(x, widths, constant_values=fill)


def _lane_specs(rows_list):
    return [
        pl.BlockSpec((r, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
        for r in rows_list
    ]


def propose_batched_pallas(cfg, u, g, jtj, radius, lower, upper, interpret=False):
    """Batched propose: u/g/lower/upper (B, D), jtj (B, D, D), radius (B,)."""
    b, d = u.shape
    n_pad = -(-b // LANE_BLOCK) * LANE_BLOCK
    jtj_t = _pad_lanes(jnp.transpose(jtj, (1, 2, 0)).reshape(d * d, b), n_pad)
    # Padded lanes get identity damped systems (radius 1, jtj 0 diag clamps
    # to min_diagonal) — finite garbage, discarded on unpad.
    args = [
        jtj_t,
        _pad_lanes(u.T, n_pad), _pad_lanes(radius[None, :], n_pad, fill=1.0),
        _pad_lanes(lower.T, n_pad), _pad_lanes(upper.T, n_pad),
    ]
    g_t = _pad_lanes(g.T, n_pad)
    out = pl.pallas_call(
        functools.partial(_propose_kernel, cfg, d),
        out_shape=(
            jax.ShapeDtypeStruct((d, n_pad), u.dtype),
            jax.ShapeDtypeStruct((d, n_pad), u.dtype),
            jax.ShapeDtypeStruct((1, n_pad), u.dtype),
        ),
        grid=(n_pad // LANE_BLOCK,),
        in_specs=_lane_specs([d * d, d, d, 1, d, d]),
        out_specs=tuple(_lane_specs([d, d, 1])),
        interpret=interpret,
    )(jtj_t, g_t, args[1], args[2], args[3], args[4])
    u_new, delta, mc = out
    return u_new[:, :b].T, delta[:, :b].T, mc[0, :b]


def commit_batched_pallas(cfg, u, cost, g, jtj, radius, decrease_factor, iters,
                          done, term, failed, u_new, delta, model_change,
                          new_cost, g_new, jtj_new, interpret=False):
    b, d = u.shape
    n_pad = -(-b // LANE_BLOCK) * LANE_BLOCK
    dtype = u.dtype

    def t2(x):
        return _pad_lanes(x.T, n_pad)

    def t3(x):
        return _pad_lanes(jnp.transpose(x, (1, 2, 0)).reshape(d * d, b), n_pad)

    sf = _pad_lanes(
        jnp.stack([cost, radius, decrease_factor, jnp.zeros_like(cost)], axis=0),
        n_pad, fill=1.0,
    )
    si = _pad_lanes(
        jnp.stack(
            [iters, done.astype(jnp.int32), term, failed.astype(jnp.int32)], axis=0
        ),
        n_pad, fill=1,  # padded lanes read done=1 -> inert
    )
    row1 = lambda x: _pad_lanes(x[None, :], n_pad, fill=1.0)
    outs = pl.pallas_call(
        functools.partial(_commit_kernel, cfg, d),
        out_shape=(
            jax.ShapeDtypeStruct((d, n_pad), dtype),
            jax.ShapeDtypeStruct((d, n_pad), dtype),
            jax.ShapeDtypeStruct((d * d, n_pad), dtype),
            jax.ShapeDtypeStruct((4, n_pad), dtype),
            jax.ShapeDtypeStruct((4, n_pad), jnp.int32),
        ),
        grid=(n_pad // LANE_BLOCK,),
        in_specs=_lane_specs([d, d, d * d, 4]) + [
            pl.BlockSpec((4, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] + _lane_specs([d, d, 1, 1, d, d * d]),
        out_specs=tuple(_lane_specs([d, d, d * d, 4]) + [
            pl.BlockSpec((4, LANE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
        ]),
        interpret=interpret,
    )(
        t2(u), t2(g), t3(jtj), sf, si,
        t2(u_new), t2(delta), row1(model_change), row1(new_cost),
        t2(g_new), t3(jtj_new),
    )
    uo, go, jtjo, sfo, sio = outs
    return (
        uo[:, :b].T,
        sfo[0, :b],
        go[:, :b].T,
        jtjo[:, :b].T.reshape(b, d, d),
        sfo[1, :b],
        sfo[2, :b],
        sio[0, :b],
        sio[1, :b] != 0,
        sio[2, :b],
        sio[3, :b] != 0,
    )


# ---------------------------------------------------------------------------
# custom_vmap dispatch.
# ---------------------------------------------------------------------------


def _tpu_f32(x):
    return x.dtype == jnp.float32 and jax.default_backend() == "tpu"


def make_propose_op(cfg):
    @jax.custom_batching.custom_vmap
    def op(u, g, jtj, radius, lower, upper):
        return propose_ref(cfg, u, g, jtj, radius, lower, upper)

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [
            a if bt else jnp.broadcast_to(jnp.asarray(a), (axis_size,) + jnp.shape(a))
            for a, bt in zip(args, in_batched)
        ]
        u = args[0]
        if _tpu_f32(u) and u.ndim == 2:
            return propose_batched_pallas(cfg, *args), (True, True, True)
        return (
            jax.vmap(functools.partial(propose_ref, cfg))(*args),
            (True, True, True),
        )

    return op


def make_commit_op(cfg):
    @jax.custom_batching.custom_vmap
    def op(*args):
        return commit_ref(cfg, *args)

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [
            a if bt else jnp.broadcast_to(jnp.asarray(a), (axis_size,) + jnp.shape(a))
            for a, bt in zip(args, in_batched)
        ]
        u = args[0]
        out_batched = (True,) * 10
        if _tpu_f32(u) and u.ndim == 2:
            return commit_batched_pallas(cfg, *args), out_batched
        return (
            jax.vmap(functools.partial(commit_ref, cfg))(*args),
            out_batched,
        )

    return op
