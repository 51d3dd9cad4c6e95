"""Multi-device tests on the virtual 8-device CPU mesh: sharded batched step,
psum'd fleet metrics, and parity between sharded and unsharded execution."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.controller.controller import make_carry, make_step_batch
from nav2_social_mpc_controller_tpu.parallel.mesh import (
    make_distributed_step,
    make_mesh,
    shard_batch,
)
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_distributed_step_runs_and_reduces_metrics():
    cfg = benchmark_social_config()
    mesh = make_mesh(8)
    batch = 16  # 2 scenarios per device
    scb = make_scenario_batch(cfg, batch, n_valid_people=2, grid_hw=(64, 64))
    carry = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(batch))
    step = make_distributed_step(cfg, mesh)
    cmd, aux, new_carry, metrics = step(shard_batch(mesh, scb), shard_batch(mesh, carry))
    assert cmd.linear_x.shape == (batch,)
    assert int(metrics.n_scenarios) == batch
    assert int(metrics.n_usable) == batch
    assert np.all(np.isfinite(np.asarray(cmd.linear_x)))


def test_sharded_matches_unsharded():
    """Per-scenario results must not depend on how the batch is split across
    devices. float64: in f32 the compiled programs' different reduction
    orders (batch 8 vs 2-per-device layouts) produce ~1e-7 rounding deltas
    that the LM accept/reject branching amplifies chaotically."""
    cfg = benchmark_social_config()
    mesh = make_mesh(4)
    batch = 8
    scb = make_scenario_batch(cfg, batch, n_valid_people=3, grid_hw=(64, 64), dtype=np.float64)
    carry = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(batch))

    dist_step = make_distributed_step(cfg, mesh)
    cmd_d, aux_d, _, _ = dist_step(shard_batch(mesh, scb), shard_batch(mesh, carry))

    cmd_u, aux_u, _ = make_step_batch(cfg)(scb, carry)

    np.testing.assert_allclose(
        np.asarray(cmd_d.linear_x), np.asarray(cmd_u.linear_x), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cmd_d.angular_z), np.asarray(cmd_u.angular_z), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(aux_d.status), np.asarray(aux_u.status))


def test_weak_scaling_artifact_efficiency():
    """The committed sharding-overhead artifact (tools/weak_scaling.py,
    fixed-global-batch protocol) must show near-perfect efficiency: the
    framework's only collective is the psum'd FleetMetrics, so sharding
    overhead beyond tolerance means a regression leaked real per-scenario
    traffic into the mesh. Regenerate with `python tools/weak_scaling.py`."""
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    path = next(
        (
            p
            for p in (
                os.path.join(root, "WEAK_SCALING_r05.json"),
                os.path.join(root, "WEAK_SCALING_r04.json"),
            )
            if os.path.exists(p)
        ),
        None,
    )
    if path is None:
        import pytest

        pytest.skip("weak-scaling artifact not generated")
    with open(path) as f:
        data = json.load(f)
    assert len(data["points"]) >= 3
    for p in data["points"]:
        # Tolerant floor: CPU-host noise measured ~±10%; a real collective
        # regression would cost far more than 25%.
        assert p["efficiency_vs_1dev"] >= 0.75, p
        assert p["usable_frac"] == 1.0, p
        # The r05 protocol divides each meshed tick by a shape-identical
        # sequential control (same per-device program, N x the ticks). The
        # control pays N x the per-tick host overhead that one meshed
        # dispatch amortizes, so the ratio lands ABOVE 1 (measured
        # 1.6-2.1); together with the raw shape-confounded efficiency
        # (floor 0.95) it BRACKETS the true mesh overhead at below host
        # noise. A real collective regression would push the meshed tick
        # up against BOTH controls.
        if "efficiency_shape_controlled" in p:
            assert p["efficiency_shape_controlled"] >= 0.85, p
