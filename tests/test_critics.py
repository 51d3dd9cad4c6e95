"""Unit tests for the critic kernels against closed forms and the oracle's
independent per-term implementations."""

import math

import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.costs import critics
from parity import oracle


def test_distance_cost_fourth_power():
    pos = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
    target = jnp.asarray([0.0, 0.0])
    r = np.asarray(critics.distance_cost(3.0, pos, target))
    np.testing.assert_allclose(r, [3.0 * 25.0, 0.0], rtol=1e-12)


def test_velocity_cost_horizon_gating():
    v = jnp.asarray([0.1, 0.2, 0.6])
    in_h = np.array([True, True, False])
    r = np.asarray(critics.velocity_cost(10.0, 0.6, v, in_h))
    np.testing.assert_allclose(r, [10.0 * 0.25, 10.0 * 0.16, 0.0], rtol=1e-6)


def test_goal_align_wraps():
    r = np.asarray(critics.goal_align_cost(2.0, jnp.asarray(math.pi - 0.1), jnp.asarray([-math.pi + 0.1])))
    np.testing.assert_allclose(r, [2.0 * 0.04], rtol=1e-5)


def test_velocity_feasibility_pairs():
    u = jnp.asarray([[0.1, 0.2], [0.3, -0.2], [0.35, 0.0]])
    r = np.asarray(critics.velocity_feasibility_cost(5.0, u, 2))
    np.testing.assert_allclose(r, [5.0 * (0.04 + 0.16), 5.0 * (0.0025 + 0.04)], rtol=1e-5)
    assert critics.velocity_feasibility_cost(5.0, u, 0).shape == (0,)


def test_proxemics_matches_formula():
    agents = np.zeros((2, 3, 6))
    agents[:, :, 3] = -1.0
    agents[0, 0] = [1.0, 1.0, 0.0, 0.0, 0.0, 0.0]
    agents[0, 1] = [0.5, 0.0, 0.0, 0.0, 0.0, 0.0]
    robot = np.array([[0.0, 0.0], [5.0, 5.0]])
    r = np.asarray(critics.proxemics_cost(90.0, jnp.asarray(robot), jnp.asarray(agents)))
    np.testing.assert_allclose(r[0], 90.0 * 3.0 * math.exp(-0.25 / 0.25), rtol=1e-6)
    np.testing.assert_allclose(r[1], 0.0, atol=1e-12)  # no valid agents -> 0


def test_social_work_matches_oracle_pair_force():
    rng = np.random.default_rng(3)
    s, n = 4, 3
    agents = rng.uniform(-2, 2, size=(s, n, 6))
    agents[:, :, 3] = 0.0
    agents[0, 2, 3] = -1.0  # one invalid slot
    robot_pos = rng.uniform(-2, 2, size=(s, 2))
    robot_yaw = rng.uniform(-3, 3, size=(s,))
    robot_vw = rng.uniform([-0.1, -1], [0.6, 1], size=(s, 2))

    r = np.asarray(
        critics.social_work_cost(
            120.0,
            jnp.asarray(robot_pos),
            jnp.asarray(robot_yaw),
            jnp.asarray(robot_vw),
            jnp.asarray(agents),
        )
    )
    for i in range(s):
        r_vel = np.array(
            [robot_vw[i, 0] * math.cos(robot_yaw[i]), robot_vw[i, 0] * math.sin(robot_yaw[i])]
        )
        wr_f = np.zeros(2)
        for a in agents[i]:
            if a[3] == -1:
                continue
            wr_f += oracle._pair_social_force(robot_pos[i], r_vel, a)
        wp = 0.0
        robot_row = np.array(
            [robot_pos[i, 0], robot_pos[i, 1], robot_yaw[i], 0.0, robot_vw[i, 0], robot_vw[i, 1]]
        )
        for a in agents[i]:
            me_pos = a[0:2]
            me_vel = np.array([a[4] * math.cos(a[2]), a[4] * math.sin(a[2])])
            f = oracle._pair_social_force(me_pos, me_vel, robot_row)
            wp += float(f @ f)
        expected = 120.0 * (float(wr_f @ wr_f) + wp + 1e-6)
        np.testing.assert_allclose(r[i], expected, rtol=1e-6, err_msg=f"step {i}")


def test_agent_angle_matches_oracle_branches():
    rng = np.random.default_rng(5)
    pose0 = np.array([0.1, -0.2, 0.4])
    for trial in range(20):
        agents = rng.uniform(-2, 2, size=(1, 3, 6))
        agents[:, :, 3] = 0.0
        agents[:, :, 4] = rng.uniform(0.0, 0.8, size=(1, 3))
        new_yaw = rng.uniform(-3, 3)
        r = float(
            critics.agent_angle_cost(
                40.0, jnp.asarray([new_yaw]), jnp.asarray(pose0), jnp.asarray(agents)
            )[0]
        )
        expected = oracle._oracle_agent_angle(40.0, new_yaw, pose0, agents[0])
        np.testing.assert_allclose(r, expected, rtol=1e-5, atol=1e-10, err_msg=f"trial {trial}")


def test_obstacle_cost_front_offset():
    g = np.zeros((20, 20))
    g[10, 14] = 200.0
    origin = jnp.asarray([0.0, 0.0])
    res = 0.5
    # pose whose FRONT point (0.25 m ahead) lands exactly on cell (x=14,y=10)
    pose = jnp.asarray([[7.0 - 0.25, 5.0, 0.0]])
    r = np.asarray(critics.obstacle_cost(0.13, pose, jnp.asarray(g), origin, res))
    np.testing.assert_allclose(r, [0.13 * 200.0], rtol=1e-6)


def test_curvature_cost_straight_is_zero():
    p1 = jnp.asarray([[0.0, 0.0]])
    p2 = jnp.asarray([[1.0, 0.0]])
    p3 = jnp.asarray([[2.0, 0.0]])
    r = np.asarray(critics.curvature_cost(1.0, 0.4, p1, p2, p3))
    np.testing.assert_allclose(r, [0.0], atol=1e-12)
    # sharp 90-degree bend -> penalized
    p3b = jnp.asarray([[1.0, 1.0]])
    r2 = float(critics.curvature_cost(1.0, 0.4, p1, p2, p3b)[0])
    assert r2 > 0.0


def test_stepwise_jvp_jacobians_match_autodiff():
    """The one-reverse-pass custom JVP on the social critics must produce the
    SAME Jacobian as plain autodiff of the raw impls (the diagonality
    assumption of critics._stepwise_custom_jvp, checked end-to-end)."""
    import jax

    rng = np.random.RandomState(7)
    s, n = 12, 4
    for trial in range(3):
        agents = np.asarray(rng.randn(s, n, 6))
        agents[..., 3] = np.where(rng.rand(s, n) < 0.3, -1.0, 0.5)
        agents[..., 4] = rng.rand(s, n)
        agents = jnp.asarray(agents)
        pose0 = jnp.asarray(rng.randn(3))
        u = jnp.asarray(rng.randn(s * 5) * 0.5)

        def make(fn_sw, fn_px, fn_aa):
            def f(uu):
                z = uu.reshape(s, 5)
                rp, ry, rvw = z[:, 0:2], z[:, 2], z[:, 3:5]
                return jnp.concatenate(
                    [
                        fn_sw(120.0, rp, ry, rvw, agents),
                        fn_px(100.0, rp, agents),
                        fn_aa(40.0, ry, pose0, agents),
                    ]
                )

            return f

        f_new = make(critics.social_work_cost, critics.proxemics_cost, critics.agent_angle_cost)
        f_old = make(critics._social_work_impl, critics._proxemics_impl, critics._agent_angle_impl)
        np.testing.assert_allclose(f_new(u), f_old(u), rtol=0, atol=0, err_msg=f"trial {trial}")
        j_new = jax.jacfwd(f_new)(u)
        j_old = jax.jacfwd(f_old)(u)
        np.testing.assert_allclose(j_new, j_old, rtol=1e-5, atol=1e-6, err_msg=f"trial {trial}")

    # Shared-arg perturbation falls back to plain jvp (weight gradient).
    g_new = jax.grad(
        lambda w: jnp.sum(critics.social_work_cost(w, jnp.ones((s, 2)), jnp.zeros(s), jnp.ones((s, 2)), agents))
    )(120.0)
    g_old = jax.grad(
        lambda w: jnp.sum(critics._social_work_impl(w, jnp.ones((s, 2)), jnp.zeros(s), jnp.ones((s, 2)), agents))
    )(120.0)
    np.testing.assert_allclose(g_new, g_old, rtol=1e-6)
