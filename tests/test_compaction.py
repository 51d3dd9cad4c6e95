"""Converged-lane compaction (solver/batched.py + make_step_batch_compacted):
per-lane results must be IDENTICAL to the plain vmapped solver — compaction
may only change when full-width iterations stop, never any lane's
trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.controller.controller import (
    make_carry,
    make_step_batch,
    make_step_batch_compacted,
)
from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch


def _run_pair(dtype, batch=12, capacity_frac=0.34):
    cfg = benchmark_social_config()
    scb = make_scenario_batch(cfg, batch, n_valid_people=3, grid_hw=(64, 64), dtype=dtype)
    jdt = jnp.float64 if dtype == np.float64 else jnp.float32
    carry = jax.vmap(lambda _: make_carry(cfg, dtype=jdt))(jnp.arange(batch))
    cmd_p, aux_p, carry_p = make_step_batch(cfg)(scb, carry)
    cmd_c, aux_c, carry_c = make_step_batch_compacted(cfg, capacity_frac)(scb, carry)
    return (cmd_p, aux_p, carry_p), (cmd_c, aux_c, carry_c)


def test_compacted_matches_plain_solver_exactly():
    """float64: both paths run lm_iteration per lane with frozen done lanes,
    so gather/compact/scatter must reproduce every lane bit-for-bit."""
    (cmd_p, aux_p, carry_p), (cmd_c, aux_c, carry_c) = _run_pair(np.float64)
    np.testing.assert_array_equal(np.asarray(cmd_c.linear_x), np.asarray(cmd_p.linear_x))
    np.testing.assert_array_equal(np.asarray(cmd_c.angular_z), np.asarray(cmd_p.angular_z))
    np.testing.assert_array_equal(np.asarray(aux_c.status), np.asarray(aux_p.status))
    np.testing.assert_array_equal(
        np.asarray(aux_c.solve.iterations), np.asarray(aux_p.solve.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(aux_c.solve.termination), np.asarray(aux_p.solve.termination)
    )
    np.testing.assert_array_equal(
        np.asarray(aux_c.solve.final_cost), np.asarray(aux_p.solve.final_cost)
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        carry_c,
        carry_p,
    )


def test_compacted_matches_plain_solver_f32():
    """float32 (production dtype): same per-lane kernels; tolerate only
    compiler-level reassociation between the two program shapes."""
    (cmd_p, aux_p, _), (cmd_c, aux_c, _) = _run_pair(np.float32)
    np.testing.assert_allclose(
        np.asarray(cmd_c.linear_x), np.asarray(cmd_p.linear_x), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cmd_c.angular_z), np.asarray(cmd_p.angular_z), rtol=1e-5, atol=1e-6
    )
    assert np.array_equal(np.asarray(aux_c.status), np.asarray(aux_p.status))
    assert float(np.mean(np.asarray(aux_c.solve.usable))) == 1.0


def test_capacity_validation():
    import pytest

    from nav2_social_mpc_controller_tpu.solver.batched import lm_solve_batch_compacted
    from nav2_social_mpc_controller_tpu.solver.lm import LMConfig

    def op(u):
        return 0.5 * jnp.sum(u * u), u, jnp.eye(u.shape[0], dtype=u.dtype)

    u0 = jnp.zeros((4, 2))
    with pytest.raises(ValueError, match="capacity"):
        lm_solve_batch_compacted(op, (), u0, u0 - 1, u0 + 1, LMConfig(), capacity=4)


def test_multilevel_low_capacity_still_exact():
    """The round-5 width ladder (VERDICT r4 item 5): a capacity BELOW the
    cap-bound lane fraction — the configuration that previously degenerated
    (single trigger never fired; measured 2.7x WORSE than plain) — must now
    still produce per-lane results identical to the plain solver, with the
    intermediate levels doing the compaction work."""
    (cmd_p, aux_p, _cp), (cmd_c, aux_c, _cc) = _run_pair(
        np.float64, batch=16, capacity_frac=0.0625
    )
    np.testing.assert_array_equal(np.asarray(cmd_p.linear_x), np.asarray(cmd_c.linear_x))
    np.testing.assert_array_equal(np.asarray(cmd_p.angular_z), np.asarray(cmd_c.angular_z))
    np.testing.assert_array_equal(np.asarray(aux_p.status), np.asarray(aux_c.status))
    np.testing.assert_array_equal(
        np.asarray(aux_p.solve.iterations), np.asarray(aux_c.solve.iterations)
    )
