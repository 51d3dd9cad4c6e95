"""The fused propose/commit LM-iteration ops (solver/pallas_iter.py):
kernel-vs-reference equivalence in interpret mode, dispatch behavior, and
end-to-end solver equality with the ops plumbed through lm_solve."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.solver.lm import LMConfig, lm_solve
from nav2_social_mpc_controller_tpu.solver import pallas_iter as pi


def _random_state(rng, b, d, with_done=True):
    # SPD jtj via A A^T + eps I, magnitudes like the benchmark problems.
    a = rng.standard_normal((b, d, d)).astype(np.float32)
    jtj = np.einsum("bij,bkj->bik", a, a) * 10.0 + 1e-3 * np.eye(d, dtype=np.float32)
    g = rng.standard_normal((b, d)).astype(np.float32) * 5.0
    u = rng.uniform(-0.5, 0.5, (b, d)).astype(np.float32)
    radius = 10.0 ** rng.uniform(-2, 4, b).astype(np.float32)
    lower = np.full((b, d), -0.7, np.float32)
    upper = np.full((b, d), 0.7, np.float32)
    done = (rng.uniform(0, 1, b) < 0.3) if with_done else np.zeros(b, bool)
    return u, g, jtj.astype(np.float32), radius.astype(np.float32), lower, upper, done


def test_propose_kernel_matches_reference():
    cfg = LMConfig()
    rng = np.random.default_rng(0)
    for b, d in [(5, 6), (130, 6), (7, 12), (64, 2)]:
        u, g, jtj, radius, lower, upper, _ = _random_state(rng, b, d)
        got = pi.propose_batched_pallas(
            cfg, *map(jnp.asarray, (u, g, jtj, radius, lower, upper)), interpret=True
        )
        ref = jax.vmap(lambda *a: pi.propose_ref(cfg, *a))(
            *map(jnp.asarray, (u, g, jtj, radius, lower, upper))
        )
        # f32 tolerance is linear-solver-grade: the kernel's unrolled
        # Cholesky and LAPACK's cho_solve accumulate differently (the
        # production batched path already ran the same unrolled kernel via
        # solver/pallas_solve.py, so this is not a new divergence).
        for gk, rk, name in zip(got, ref, ("u_new", "delta", "mc")):
            np.testing.assert_allclose(
                np.asarray(gk), np.asarray(rk), rtol=2e-3, atol=5e-5, err_msg=name
            )


def test_commit_kernel_matches_reference():
    cfg = LMConfig(max_iterations=40, fn_tol=1e-5, gradient_tol=1e-8, param_tol=1e-9)
    rng = np.random.default_rng(1)
    for b, d in [(9, 6), (130, 6), (6, 12)]:
        u, g, jtj, radius, lower, upper, done = _random_state(rng, b, d)
        u_new, delta, mc = pi.propose_batched_pallas(
            cfg, *map(jnp.asarray, (u, g, jtj, radius, lower, upper)), interpret=True
        )
        # Trial results spanning accept, reject, and invalid-step lanes:
        cost = rng.uniform(1.0, 100.0, b).astype(np.float32)
        new_cost = cost * rng.uniform(0.2, 1.5, b).astype(np.float32)
        new_cost[0] = np.inf if b > 0 else new_cost[0]  # numeric-failure lane
        g_new = g * 0.5
        jtj_new = jtj * 0.9
        decrease = np.full(b, 2.0, np.float32)
        iters = rng.integers(0, 40, b).astype(np.int32)
        term = np.zeros(b, np.int32)
        failed = np.zeros(b, bool)
        args = (
            u, cost, g, jtj, radius, decrease, iters, done, term, failed,
            np.asarray(u_new), np.asarray(delta), np.asarray(mc), new_cost,
            g_new, jtj_new,
        )
        got = pi.commit_batched_pallas(cfg, *map(jnp.asarray, args), interpret=True)
        ref = jax.vmap(lambda *a: pi.commit_ref(cfg, *a))(*map(jnp.asarray, args))
        names = ("u", "cost", "g", "jtj", "radius", "decrease", "iters", "done",
                 "term", "failed")
        for gk, rk, name in zip(got, ref, names):
            if np.asarray(rk).dtype == bool or np.asarray(rk).dtype == np.int32:
                np.testing.assert_array_equal(np.asarray(gk), np.asarray(rk), err_msg=name)
            else:
                np.testing.assert_allclose(
                    np.asarray(gk), np.asarray(rk), rtol=2e-6, atol=1e-6, err_msg=name
                )


def test_lm_solve_with_ops_matches_without():
    """On CPU the ops fall back to the reference formulations, so lm_solve
    results must be identical whether the gate engages (trace_len=0,
    default solver) or not (debug trace path)."""
    cfg = LMConfig(max_iterations=30, fn_tol=1e-6, gradient_tol=1e-9, param_tol=1e-10)

    def residual_fn(u):
        return jnp.stack([
            10.0 * (u[1] - u[0] ** 2),
            1.0 - u[0],
            0.5 * (u[2] + u[3] - 1.0),
            u[2] * u[3] - 0.2,
            jnp.sum(u**2) - 1.0,
        ])

    u0 = jnp.asarray([0.3, -0.2, 0.4, 0.1], jnp.float32)
    lo = jnp.full((4,), -2.0, jnp.float32)
    hi = jnp.full((4,), 2.0, jnp.float32)
    u_ops, stats_ops = lm_solve(residual_fn, u0, lo, hi, cfg)
    u_leg, stats_leg, _tr = lm_solve(residual_fn, u0, lo, hi, cfg, trace_len=30)
    np.testing.assert_allclose(np.asarray(u_ops), np.asarray(u_leg), rtol=0, atol=0)
    assert int(stats_ops.iterations) == int(stats_leg.iterations)
    assert int(stats_ops.termination) == int(stats_leg.termination)


def test_batched_lm_solve_with_ops_matches_per_lane():
    """vmapped lm_solve (ops path under the CPU fallback rule) equals
    per-lane solves — frozen-lane semantics preserved."""
    cfg = LMConfig(max_iterations=25)

    def make_rfn(c):
        def rfn(u):
            return jnp.stack([u[0] * u[0] - c, u[1] - u[0] * 0.5, u[1] * u[0] - 0.1])

        return rfn

    cs = jnp.asarray([0.3, 0.6, 1.2, 0.05], jnp.float32)
    u0 = jnp.tile(jnp.asarray([0.5, 0.5], jnp.float32), (4, 1))
    lo = jnp.full((4, 2), -3.0, jnp.float32)
    hi = jnp.full((4, 2), 3.0, jnp.float32)

    def solve_one(c, u0_l, lo_l, hi_l):
        def rfn(u):
            return jnp.stack([u[0] * u[0] - c, u[1] - u[0] * 0.5, u[1] * u[0] - 0.1])

        return lm_solve(rfn, u0_l, lo_l, hi_l, cfg)

    u_b, stats_b = jax.vmap(solve_one)(cs, u0, lo, hi)
    for i in range(4):
        u_i, stats_i = solve_one(cs[i], u0[i], lo[i], hi[i])
        np.testing.assert_allclose(np.asarray(u_b[i]), np.asarray(u_i), atol=1e-7)
        assert int(stats_b.iterations[i]) == int(stats_i.iterations)
