"""End-to-end smoke tests: the full controller step compiles and runs on all
benchmark configurations, producing finite, in-bounds commands."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nav2_social_mpc_controller_tpu.core.config import (
    benchmark_obstacle_only_config,
    benchmark_social_config,
)
from nav2_social_mpc_controller_tpu.core.types import STATUS_OK
from nav2_social_mpc_controller_tpu.controller.controller import make_carry, make_step, make_step_batch
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario, make_scenario_batch


@pytest.mark.parametrize(
    "cfg_fn,n_people",
    [
        (benchmark_obstacle_only_config, 0),
        (benchmark_social_config, 3),
    ],
)
def test_step_end_to_end(cfg_fn, n_people):
    cfg = cfg_fn()
    sc = make_scenario(cfg, seed=0, n_valid_people=n_people)
    step = make_step(cfg)
    cmd, aux, carry = step(sc, make_carry(cfg))

    assert np.isfinite(float(cmd.linear_x))
    assert np.isfinite(float(cmd.angular_z))
    assert float(cmd.linear_y) == 0.0
    assert int(aux.status) == STATUS_OK
    # Box bounds (optimizer.cpp:373-379)
    assert 0.0 - 1e-6 <= float(cmd.linear_x) <= 0.6 + 1e-6
    assert -1.4 - 1e-6 <= float(cmd.angular_z) <= 1.4 + 1e-6
    assert bool(aux.solve.usable)
    assert float(aux.solve.final_cost) <= float(aux.solve.initial_cost) + 1e-6


def test_step_carry_warm_start_advances():
    cfg = benchmark_social_config()
    sc = make_scenario(cfg, seed=1, n_valid_people=2)
    step = make_step(cfg)
    carry = make_carry(cfg)
    cmd1, aux1, carry = step(sc, carry)
    assert int(carry.prev_n) >= 2
    cmd2, aux2, carry = step(sc, carry)
    assert np.isfinite(float(cmd2.linear_x))
    # Warm-started second solve should start no worse than cold cost
    assert float(aux2.solve.final_cost) <= float(aux1.solve.initial_cost) * 10 + 1.0


def test_step_batch_vmap():
    cfg = benchmark_social_config()
    batch = 4
    scs = make_scenario_batch(cfg, batch, n_valid_people=3)
    carries = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(batch))
    step_b = make_step_batch(cfg)
    cmd, aux, carry = step_b(scs, carries)
    assert cmd.linear_x.shape == (batch,)
    assert np.all(np.isfinite(np.asarray(cmd.linear_x)))
    assert np.all(np.asarray(aux.solve.usable))


def test_fallback_crawl_on_degenerate_path():
    cfg = benchmark_social_config()
    sc = make_scenario(cfg, seed=0, n_valid_people=0)
    # Degenerate 1-point plan -> trajectorize fails -> crawl command
    path = sc.path._replace(n=np.int32(1))
    sc = sc._replace(path=path)
    cmd, aux, _ = make_step(cfg)(sc, make_carry(cfg))
    assert float(cmd.linear_x) == pytest.approx(0.1)
    assert float(cmd.angular_z) == 0.0
