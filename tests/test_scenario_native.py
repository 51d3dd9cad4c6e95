"""Native multithreaded scenario generator (runtime/scenario_gen.cpp).

The generator is the fleet-scale data-loading layer standing in for the
reference's Gazebo + ROS-topic world sources; it must (a) be deterministic
per seed, (b) produce structurally valid Scenario batches the jitted step
accepts, and (c) carry exact-EDT ESDFs consistent with the general-grid
native builder.
"""

import numpy as np
import pytest

from nav2_social_mpc_controller_tpu.core.config import SocialMPCConfig
from nav2_social_mpc_controller_tpu.runtime import scenario_native
from nav2_social_mpc_controller_tpu.runtime import esdf as esdf_rt


@pytest.fixture(scope="module")
def cfg():
    return SocialMPCConfig()


@pytest.fixture(scope="module")
def native(cfg):
    if not scenario_native.native_available():
        pytest.skip("g++ unavailable; native scenario generator not built")
    return True


def test_deterministic_per_seed(native, cfg):
    a = scenario_native.generate_scenario_batch(cfg, 16, base_seed=3)
    b = scenario_native.generate_scenario_batch(cfg, 16, base_seed=3, n_threads=1)
    np.testing.assert_array_equal(a.path.points, b.path.points)
    np.testing.assert_array_equal(a.people.state, b.people.state)
    np.testing.assert_array_equal(a.esdf.distances, b.esdf.distances)
    c = scenario_native.generate_scenario_batch(cfg, 16, base_seed=4)
    assert not np.array_equal(a.people.state, c.people.state)


def test_seed_offset_is_per_scenario(native, cfg):
    """Scenario i of seed s equals scenario 0 of seed s+i (streamable batches)."""
    a = scenario_native.generate_scenario_batch(cfg, 8, base_seed=10)
    b = scenario_native.generate_scenario_batch(cfg, 4, base_seed=14)
    np.testing.assert_array_equal(a.path.points[4:], b.path.points)
    np.testing.assert_array_equal(a.people.state[4:], b.people.state)


def test_structural_validity(native, cfg):
    s = scenario_native.generate_scenario_batch(cfg, 32, base_seed=0, grid_hw=(64, 72))
    B, P = 32, cfg.max_path_points
    assert s.path.points.shape == (B, P, 2)
    assert s.path.yaw.shape == (B, P)
    assert s.robot.pose.shape == (B, 3)
    assert s.people.state.shape == (B, cfg.n_agents, 6)
    assert s.costmap.data.shape == (B, 64, 72)
    assert s.esdf.distances.shape == (B, 64, 72)
    assert s.esdf.indexes.dtype == np.int32
    for leaf in (s.path.points, s.robot.pose, s.people.state, s.costmap.data, s.esdf.distances):
        assert np.isfinite(leaf).all()
    # padding: beyond path_n, points hold the last pose
    n = int(s.path.n[0])
    np.testing.assert_array_equal(s.path.points[0, n:], np.tile(s.path.points[0, n - 1], (P - n, 1)))
    # robot starts on the path, heading along it
    np.testing.assert_allclose(s.robot.pose[:, :2], s.path.points[:, 0], atol=1e-6)
    # people: exactly n_valid live agents (t == 0), rest padded t == -1
    t = s.people.state[..., 3]
    assert ((t == 0).sum(axis=1) == 3).all()
    assert ((t == -1).sum(axis=1) == cfg.n_agents - 3).all()
    assert 0.0 <= s.costmap.data.max() <= 254.0


def test_esdf_matches_general_builder(native, cfg):
    """The inlined small-obstacle EDT must agree with the general
    Felzenszwalb builder on distances (indexes may differ only at ties)."""
    s = scenario_native.generate_scenario_batch(cfg, 2, base_seed=5, grid_hw=(60, 60))
    h, w = 60, 60
    for i in range(2):
        # reconstruct the occupancy the generator implies from its indexes
        occ = np.zeros((h, w), np.uint8)
        idx = np.unique(s.esdf.indexes[i])
        occ[idx // w, idx % w] = 1
        dist_ref, _ = esdf_rt.build_esdf(occ, float(s.esdf.resolution[i]))
        np.testing.assert_allclose(s.esdf.distances[i], dist_ref, atol=1e-4)


def test_no_obstacle_grid(native, cfg):
    s = scenario_native.generate_scenario_batch(cfg, 2, base_seed=0, with_obstacles=False, grid_hw=(48, 48))
    assert (s.costmap.data == 0).all()
    assert (s.esdf.distances == 1e3).all()
    assert (s.esdf.indexes == 0).all()


def test_feeds_jitted_step(native, cfg):
    """End-to-end: native batch drives the jitted batched controller step."""
    import jax
    import jax.numpy as jnp
    from nav2_social_mpc_controller_tpu.controller.controller import make_carry, make_step_batch

    s = scenario_native.generate_scenario_batch(cfg, 4, base_seed=1)
    carries = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(4))
    cmd, aux, _ = make_step_batch(cfg)(s, carries)
    vx = np.asarray(cmd.linear_x)
    wz = np.asarray(cmd.angular_z)
    assert vx.shape == (4,)
    assert np.isfinite(vx).all() and np.isfinite(wz).all()
    assert (vx >= -1e-6).all() and (vx <= cfg.optimizer.v_max + 1e-6).all()
