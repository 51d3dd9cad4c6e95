"""Converged-lane compaction for the batched LM solve (VERDICT r3 item 4).

The plain batched solver is vmap(lm_solve): a batched while-loop that runs
every lane until the SLOWEST lane converges, so a warm-started batch whose
mean iteration count is ~13 still pays E[max] ~ 40 full-width iterations
(the measured reason `previous_solution` warm starts bought only +2.6%
end-to-end at B=1024 — docs/performance.md, warm-start economics).

Two-phase scheme, all in-graph:

  phase 1  run FULL-width batched iterations until the number of active
           (not-done) lanes fits a static capacity C — the while condition
           itself is the trigger, no fixed iteration count;
  compact  stable-argsort the done mask, gather the active lanes AND their
           problem data (value-grad operands, bounds) into a C-wide batch;
  phase 2  run the compacted batch to completion at ~C/B of the per-
           iteration cost;
  scatter  write the compacted lanes back by the same permutation.

Per-lane math is IDENTICAL to lm_solve: both run solver.lm.lm_iteration,
and a done lane is frozen bit-exactly, so gather/compact/scatter cannot
change any lane's trajectory (pinned by
tests/test_compaction.py::test_compacted_matches_plain_solver_exactly).

No reference counterpart — Ceres solves ONE problem; this is the
framework's own batching economics.

Capacity tuning: a lane heading for the iteration cap stays ACTIVE until
iters == max_iterations, so `capacity` must exceed the expected
cap-bound lane fraction of the workload — below it, phase 1 never
triggers and the scheme degenerates to the plain solver plus overhead
(measured: warm-start social B=1024 at capacity 0.25 -> 172.7k solves/s,
at 0.125 -> 64.9k; docs/performance.md).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nav2_social_mpc_controller_tpu.core.types import SolveStats
from nav2_social_mpc_controller_tpu.solver.lm import (
    LMConfig,
    TERM_NO_CONVERGENCE,
    _LMState,
    default_linear_solve,
    lm_iteration,
)


def lm_solve_batch_compacted(
    value_grad_op,
    data,
    u0,
    lower,
    upper,
    cfg: LMConfig,
    capacity: int,
    linear_solve=default_linear_solve,
):
    """Batched box-constrained LM with converged-lane compaction.

    value_grad_op: per-lane op (u, *data_lane) -> (cost, g, jtj) — e.g.
    ops.fused_iter.make_value_grad_op (whose custom_vmap rule dispatches
    the fused TPU kernel under this function's internal vmaps).
    data: tuple of arrays with leading batch axis B.
    u0/lower/upper: (B, D). capacity: static compacted width (< B).

    Returns (u (B, D), SolveStats with (B,) leaves).
    """
    b, d = u0.shape
    if not 0 < capacity < b:
        raise ValueError(f"capacity must be in (0, {b}), got {capacity}")
    if cfg.jacobi_scaling:
        # Measured an exact no-op at benchmark magnitudes
        # (tools/jacobi_scaling_study.py); keeping the compacted phases
        # scale-free avoids carrying the frozen per-lane scale across the
        # gather/scatter.
        raise NotImplementedError("compaction requires jacobi_scaling=False")
    dtype = u0.dtype

    def init_lane(u0_l, *d_l):
        cost, g, jtj = value_grad_op(u0_l, *d_l)
        return _LMState(
            u=u0_l,
            cost=cost,
            g=g,
            jtj=jtj,
            radius=jnp.asarray(cfg.initial_radius, dtype),
            decrease_factor=jnp.asarray(2.0, dtype),
            iters=jnp.zeros((), jnp.int32),
            done=~jnp.isfinite(cost),
            term=jnp.full((), TERM_NO_CONVERGENCE, jnp.int32),
            failed=~jnp.isfinite(cost),
            trace=None,
        )

    st = jax.vmap(init_lane)(u0, *data)
    initial_cost = st.cost

    # Same fused propose/commit ops as lm_solve's default path (the
    # compacted solver already rejects jacobi_scaling and has no trace).
    ops = None
    if linear_solve is default_linear_solve:
        from nav2_social_mpc_controller_tpu.solver.pallas_iter import (
            make_commit_op,
            make_propose_op,
        )

        ops = (make_propose_op(cfg), make_commit_op(cfg))

    def body_lane(st_l, lo_l, hi_l, *d_l):
        st2, _aux = lm_iteration(
            lambda u: value_grad_op(u, *d_l), lo_l, hi_l, cfg, linear_solve,
            None, st_l, ops=ops,
        )
        return st2

    vbody = jax.vmap(body_lane)

    def active_mask(s):
        return (~s.done) & (s.iters < cfg.max_iterations)

    # Phase 1: full width while the active set exceeds the compacted
    # capacity. Terminates: every iteration increments iters on active
    # lanes, and active implies iters < max_iterations.
    def cond1(s):
        a = active_mask(s)
        return jnp.any(a) & (jnp.sum(a) > capacity)

    st = jax.lax.while_loop(cond1, lambda s: vbody(s, lower, upper, *data), st)

    # Compact: stable sort puts the (<= capacity) active lanes first in
    # original order; the tail beyond `capacity` is all done/capped.
    perm = jnp.argsort(~active_mask(st), stable=True)  # False (active) sorts first
    take = perm[:capacity]
    st_c = jax.tree.map(lambda x: x[take], st)
    lo_c = lower[take]
    hi_c = upper[take]
    data_c = tuple(x[take] for x in data)

    def cond2(s):
        return jnp.any(active_mask(s))

    st_c = jax.lax.while_loop(cond2, lambda s: vbody(s, lo_c, hi_c, *data_c), st_c)

    # Scatter the compacted lanes back (indices are unique by construction).
    st = jax.tree.map(lambda full, comp: full.at[take].set(comp), st, st_c)

    stats = SolveStats(
        iterations=st.iters,
        initial_cost=initial_cost,
        final_cost=st.cost,
        termination=st.term,
        usable=~st.failed,
    )
    return st.u, stats
