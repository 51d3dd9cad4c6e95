"""Unit tests for the Social Force Model kernels vs the oracle and closed
properties."""

import math

import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.models import sfm
from parity import oracle


def test_desired_force_pursue_and_stop():
    pos = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
    vel = jnp.asarray([[0.1, 0.0], [0.1, 0.0]])
    goal = jnp.asarray([[2.0, 0.0], [0.1, 0.0]])  # second within goal radius
    has_goal = jnp.asarray([True, True])
    f, d = sfm.desired_force(pos, vel, goal, has_goal, 0.25, jnp.asarray([0.5, 0.5]), sfm.DEFAULT_PARAMS)
    # pursuing: 2.0 * (dir*0.5 - vel) / 0.5
    np.testing.assert_allclose(np.asarray(f[0]), [2.0 * (0.5 - 0.1) / 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[0]), [1.0, 0.0], atol=1e-12)
    # within radius: -vel / relaxation
    np.testing.assert_allclose(np.asarray(f[1]), [-0.1 / 0.5, 0.0], atol=1e-6)


def test_obstacle_force_replicates_reference_arithmetic():
    # stored entry is apos - obstacle; the SFM uses minDiff = pos - entry
    pos = jnp.asarray([[1.0, 1.0]])
    entry = jnp.asarray([[0.4, 0.9]])  # -> minDiff = (0.6, 0.1)
    f = sfm.obstacle_force(pos, entry, jnp.asarray([True]), 0.5, sfm.DEFAULT_PARAMS)
    min_diff = np.array([0.6, 0.1])
    dist = np.linalg.norm(min_diff) - 0.5
    expected = 20.0 * math.exp(-dist / 0.2) * min_diff / np.linalg.norm(min_diff)
    np.testing.assert_allclose(np.asarray(f[0]), expected, rtol=1e-6)


def test_pairwise_social_force_matches_oracle():
    rng = np.random.default_rng(0)
    m = 4
    positions = rng.uniform(-3, 3, size=(m, 2))
    velocities = rng.uniform(-0.6, 0.6, size=(m, 2))
    valid = np.array([True, True, True, False])
    f = np.asarray(
        sfm.pairwise_social_force(
            jnp.asarray(positions), jnp.asarray(velocities), jnp.asarray(valid), sfm.DEFAULT_PARAMS
        )
    )
    for j in range(3):
        expected = oracle._social_force_on(
            j, [positions[k] for k in range(3)], [velocities[k] for k in range(3)], oracle.SFM_PARAMS
        )
        np.testing.assert_allclose(f[j], expected, atol=1e-9, err_msg=f"agent {j}")
    np.testing.assert_allclose(f[3], 0.0, atol=0)  # invalid feels nothing


def test_sfm_update_speed_clamp_and_yaw():
    pos = jnp.asarray([[0.0, 0.0]])
    vel = jnp.asarray([[0.4, 0.0]])
    force = jnp.asarray([[10.0, 10.0]])
    dt = 0.1
    p, v, yaw, lv, av, hg = sfm.sfm_update(
        pos, vel, jnp.asarray([0.0]), force, jnp.asarray([0.5]), jnp.asarray([[5.0, 5.0]]),
        jnp.asarray([True]), 0.25, dt,
    )
    raw = np.array([0.4 + 1.0, 0.0 + 1.0])
    expected_v = raw / np.linalg.norm(raw) * 0.5
    np.testing.assert_allclose(np.asarray(v[0]), expected_v, rtol=1e-6)
    np.testing.assert_allclose(float(lv[0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(yaw[0]), math.atan2(expected_v[1], expected_v[0]), rtol=1e-6)
    np.testing.assert_allclose(float(av[0]), float(yaw[0]) / dt, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p[0]), expected_v * dt, rtol=1e-6)


def test_group_forces_zero_without_groups():
    m = 3
    pos = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (m, 2)))
    f = sfm.group_forces(
        pos,
        jnp.ones((m,), bool),
        jnp.full((m,), -1, jnp.int32),
        jnp.ones((m, 2)),
        jnp.full((m,), 0.35),
        sfm.DEFAULT_PARAMS,
    )
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=0)


def test_group_repulsion_activates_when_close():
    pos = jnp.asarray([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0]])
    gid = jnp.asarray([1, 1, -1], jnp.int32)
    f = np.asarray(
        sfm.group_forces(
            pos,
            jnp.ones((3,), bool),
            gid,
            jnp.zeros((3, 2)),
            jnp.full((3,), 0.35),
            sfm.DEFAULT_PARAMS,
        )
    )
    # agents 0 and 1 overlap (dist 0.1 < 0.7): repulsion pushes 0 in -x
    assert f[0][0] < 0.0
    assert f[1][0] > 0.0
    np.testing.assert_allclose(f[2], 0.0, atol=1e-12)


def test_project_people_windowed_lookup_exact():
    """esdf_window > 0 must be bit-identical to the gather path: the u8
    window tables are an exact re-encoding whenever agents stay within the
    sizing rule of world.grid.crop_esdf_obstacle_window."""
    rng = np.random.RandomState(3)
    h = w = 120
    res = 0.05  # weak python float: no dtype promotion
    origin = jnp.asarray([0.0, 0.0], jnp.float32)
    indexes = jnp.asarray(rng.randint(0, h * w, size=(h, w)), dtype=jnp.int32)
    distances = jnp.asarray(rng.rand(h, w), dtype=jnp.float32)

    n, s1 = 6, 30
    people = np.zeros((n, 6), np.float32)
    people[:, 0:2] = 1.0 + rng.rand(n, 2) * 4.0  # inside the 6 m grid
    people[:, 2] = rng.uniform(-np.pi, np.pi, n)
    people[:, 3] = np.where(rng.rand(n) < 0.3, -1.0, 0.0)
    people[:, 4] = rng.rand(n) * 0.6
    traj = np.zeros((s1, 6), np.float32)
    traj[:, 0] = np.linspace(1.0, 2.2, s1)
    traj[:, 1] = 3.0
    traj[:, 4] = 0.5

    kw = dict(maxtime=1.5, dt=0.05, people_desired_vel=0.5, people_radius=0.5,
              robot_desired_vel=0.6, robot_radius=0.5, goal_radius=0.25)
    out_gather = sfm.project_people(
        jnp.asarray(people), jnp.asarray(traj), jnp.asarray(s1, jnp.int32),
        distances, indexes, origin, res, jnp.asarray(True), esdf_window=0, **kw)
    out_window = sfm.project_people(
        jnp.asarray(people), jnp.asarray(traj), jnp.asarray(s1, jnp.int32),
        distances, indexes, origin, res, jnp.asarray(True), esdf_window=32, **kw)
    np.testing.assert_array_equal(np.asarray(out_gather), np.asarray(out_window))
