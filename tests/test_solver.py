"""Unit tests for the batched LM solver against closed-form solutions."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.solver.lm import (
    LMConfig,
    TERM_FUNCTION_TOL,
    TERM_GRADIENT_TOL,
    TERM_NO_CONVERGENCE,
    TERM_PARAMETER_TOL,
    lm_solve,
)

INF = jnp.inf
CFG = LMConfig(max_iterations=100, fn_tol=1e-12, gradient_tol=1e-12, param_tol=1e-14)


def test_linear_least_squares_unconstrained():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(10, 4)))
    b = jnp.asarray(rng.normal(size=(10,)))

    u, stats = lm_solve(
        lambda x: a @ x - b,
        jnp.zeros(4),
        -INF * jnp.ones(4),
        INF * jnp.ones(4),
        CFG,
    )
    expected = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(u), expected, atol=1e-8)
    assert bool(stats.usable)
    assert int(stats.termination) in (TERM_FUNCTION_TOL, TERM_GRADIENT_TOL, TERM_PARAMETER_TOL)


def test_box_constrained_projection():
    # minimize (x - 2)^2 with x <= 1 -> x* = 1
    u, stats = lm_solve(
        lambda x: x - 2.0,
        jnp.zeros(1),
        jnp.asarray([-1.0]),
        jnp.asarray([1.0]),
        CFG,
    )
    np.testing.assert_allclose(float(u[0]), 1.0, atol=1e-8)
    assert bool(stats.usable)


def test_rosenbrock():
    def resid(x):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    u, stats = lm_solve(
        resid, jnp.asarray([-1.2, 1.0]), -INF * jnp.ones(2), INF * jnp.ones(2), CFG
    )
    np.testing.assert_allclose(np.asarray(u), [1.0, 1.0], atol=1e-6)
    assert float(stats.final_cost) < 1e-12


def test_jacobi_scaling_is_a_noop_when_clamp_does_not_bind():
    """Ceres' default column scaling (jacobi_scaling=True) with Marquardt
    damping D = diag(J^T J) maps the scaled damped system back to the exact
    unscaled system whenever the [min_diagonal, max_diagonal] clamp does not
    bind (S^{-1} clamp(S^2 diag) S^{-1} = diag). Pin the invariance on a
    badly column-scaled nonlinear problem (column norms 1 vs 1e3) — full
    measurement across the benchmark corpus in tools/jacobi_scaling_study.py
    (JACOBI_SCALING_r04.json: zero iteration mismatches, deltas <= 1.4e-10)."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(12, 4)) * np.array([1.0, 1e3, 1.0, 1e3]))
    b = jnp.asarray(rng.normal(size=(12,)))

    def resid(x):
        return a @ x - b + 0.05 * jnp.sin(x).sum()

    out = {}
    for js in (False, True):
        cfg = CFG._replace(jacobi_scaling=js)
        u, stats = lm_solve(
            resid, jnp.zeros(4), -INF * jnp.ones(4), INF * jnp.ones(4), cfg
        )
        out[js] = (np.asarray(u), int(stats.iterations))
    assert out[False][1] == out[True][1]
    np.testing.assert_allclose(out[True][0], out[False][0], rtol=0, atol=1e-9)


def test_max_iterations_respected():
    cfg = LMConfig(max_iterations=3, fn_tol=0.0, gradient_tol=0.0, param_tol=0.0)

    def resid(x):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    u, stats = lm_solve(
        resid, jnp.asarray([-1.2, 1.0]), -INF * jnp.ones(2), INF * jnp.ones(2), cfg
    )
    assert int(stats.iterations) == 3
    assert int(stats.termination) == TERM_NO_CONVERGENCE
    assert bool(stats.usable)  # max-iter is usable, like Ceres NO_CONVERGENCE


def test_vmapped_batch_solves_independently():
    rng = np.random.default_rng(1)
    targets = jnp.asarray(rng.uniform(-3, 3, size=(16, 2)))

    def solve_one(t):
        return lm_solve(
            lambda x: x - t, jnp.zeros(2), -INF * jnp.ones(2), INF * jnp.ones(2), CFG
        )

    u, stats = jax.vmap(solve_one)(targets)
    np.testing.assert_allclose(np.asarray(u), np.asarray(targets), atol=1e-8)
    assert bool(jnp.all(stats.usable))


def test_nan_residuals_marked_unusable():
    u, stats = lm_solve(
        lambda x: jnp.full((2,), jnp.nan) * x[0],
        jnp.ones(1),
        -INF * jnp.ones(1),
        INF * jnp.ones(1),
        CFG,
    )
    assert not bool(stats.usable)


def test_debug_trace_records_iterations():
    """trace_len > 0 (the debug_optimizer path) records one row per executed
    iteration: cost[0] == initial cost, accepted steps strictly decrease the
    cost, rows beyond the executed count stay zero."""

    def resid(x):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    cfg = LMConfig(max_iterations=50, fn_tol=1e-12, gradient_tol=1e-12, param_tol=1e-14)
    u, stats, trace = lm_solve(
        resid, jnp.asarray([-1.2, 1.0]), -INF * jnp.ones(2), INF * jnp.ones(2),
        cfg, trace_len=50,
    )
    n = int(stats.iterations)
    assert 0 < n <= 50
    np.testing.assert_allclose(float(trace.cost[0]), float(stats.initial_cost), rtol=1e-12)
    acc = np.asarray(trace.accepted[:n])
    assert acc.any()
    cost = np.asarray(trace.cost[:n])
    change = np.asarray(trace.cost_change[:n])
    # On accepted rows the recorded change is positive (cost decreased) and
    # the tr_ratio cleared min_relative_decrease.
    assert (change[acc] > 0).all()
    assert (np.asarray(trace.tr_ratio[:n])[acc] > 1e-3).all()
    # Cost at the next row equals cost - change for accepted rows.
    for i in range(n - 1):
        if acc[i]:
            np.testing.assert_allclose(cost[i + 1], cost[i] - change[i], rtol=1e-9)
        else:
            np.testing.assert_allclose(cost[i + 1], cost[i], rtol=1e-12)
    # Rows beyond the executed count are untouched.
    assert (np.asarray(trace.cost[n:]) == 0).all()
    assert not np.asarray(trace.accepted[n:]).any()


def test_debug_trace_through_controller_step():
    """OptimizerConfig.debug_optimizer=True surfaces the LMTrace in StepAux
    with fixed (max_iterations,) shape, and does not change the solution."""
    import dataclasses

    from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
    from nav2_social_mpc_controller_tpu.controller.controller import make_carry, make_step
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario

    cfg0 = benchmark_social_config()
    cfg1 = dataclasses.replace(
        cfg0, optimizer=dataclasses.replace(cfg0.optimizer, debug_optimizer=True)
    )
    sc = make_scenario(cfg0, seed=0, n_valid_people=3)
    cmd0, aux0, _ = make_step(cfg0)(sc, make_carry(cfg0))
    cmd1, aux1, _ = make_step(cfg1)(sc, make_carry(cfg1))
    assert aux0.lm_trace is None
    assert aux1.lm_trace is not None
    assert aux1.lm_trace.cost.shape == (cfg1.optimizer.max_iterations,)
    np.testing.assert_allclose(float(cmd0.linear_x), float(cmd1.linear_x), rtol=0, atol=0)
    np.testing.assert_allclose(float(cmd0.angular_z), float(cmd1.angular_z), rtol=0, atol=0)
    n = int(aux1.solve.iterations)
    assert np.asarray(aux1.lm_trace.accepted[:n]).any()
