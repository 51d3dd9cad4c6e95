"""Analytic per-step critic gradients (costs/critic_grads.py) pinned against
the autodiff of the production critics (costs/critics.py): identical residual
values and matching (x, y, yaw, v, w) partials. This is the correctness
foundation of the fused LM iteration path (ops/fused_iter.py) — the fused
kernel consumes THESE forms instead of replaying jax.linearize tangents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nav2_social_mpc_controller_tpu.costs import critic_grads as cg
from nav2_social_mpc_controller_tpu.costs import critics


def _rand_inputs(seed, s=7, n=3):
    rng = np.random.default_rng(seed)
    px = jnp.asarray(rng.uniform(-2, 2, s))
    py = jnp.asarray(rng.uniform(-2, 2, s))
    yaw = jnp.asarray(rng.uniform(-3, 3, s))
    v = jnp.asarray(rng.uniform(0, 0.6, s))
    w = jnp.asarray(rng.uniform(-1.4, 1.4, s))
    agents = jnp.asarray(rng.uniform(-2, 2, (s, n, 6)))
    agents = agents.at[:, :, 4].set(jnp.abs(agents[:, :, 4]) * 0.3)
    # Mix of valid (t >= 0) and invalid (t = -1) slots
    t = jnp.where(jnp.asarray(rng.uniform(size=(s, n))) < 0.7, 0.5, -1.0)
    agents = agents.at[:, :, 3].set(t)
    return px, py, yaw, v, w, agents


def _agent_list(agents):
    n = agents.shape[1]
    return [
        (
            agents[:, k, 0],
            agents[:, k, 1],
            agents[:, k, 2],
            agents[:, k, 4],
            agents[:, k, 3] != -1.0,
        )
        for k in range(n)
    ]


def _dense(grads, like):
    return [jnp.zeros_like(like) if g is None else g for g in grads]


def _check(r_ref, r_an, grads_ref, grads_an, atol=1e-9):
    np.testing.assert_allclose(np.asarray(r_an), np.asarray(r_ref), atol=atol, rtol=1e-9)
    for ga, gr in zip(grads_an, grads_ref):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), atol=atol, rtol=1e-7)


def _jacdiag(fn, *args):
    """Per-step diagonal of the Jacobian of a step-diagonal fn: one reverse
    pass with a ones cotangent (valid because output s depends only on input
    row s)."""
    y, pull = jax.vjp(fn, *args)
    return y, pull(jnp.ones_like(y))


def test_distance_grad_matches_autodiff():
    px, py, *_ = _rand_inputs(0)
    tx, ty = jnp.asarray(0.3), jnp.asarray(-0.7)
    w = 20.0

    def f(px_, py_):
        return critics.distance_cost(w, jnp.stack([px_, py_], -1), jnp.stack([tx, ty]))

    r_ref, (gx, gy) = _jacdiag(f, px, py)
    r, g = cg.distance_grad(w, px, py, tx, ty)
    _check(r_ref, r, (gx, gy), _dense(g, px)[:2])


def test_velocity_grad_matches_autodiff():
    *_, v, _w, _ = _rand_inputs(1)
    mask = jnp.asarray([True, True, False, True, False, True, True])
    r_ref, (gv,) = _jacdiag(lambda v_: critics.velocity_cost(10.0, 0.6, v_, mask), v)
    r, g = cg.velocity_grad(10.0, 0.6, v, mask)
    _check(r_ref, r, (gv,), [_dense(g, v)[3]])


def test_goal_align_grad_matches_autodiff():
    _, _, yaw, *_ = _rand_inputs(2)
    gy_ = jnp.asarray(1.1)
    r_ref, (gth,) = _jacdiag(lambda y_: critics.goal_align_cost(10.0, gy_, y_), yaw)
    r, g = cg.goal_align_grad(10.0, gy_, yaw)
    _check(r_ref, r, (gth,), [_dense(g, yaw)[2]])


def test_agent_angle_grad_matches_autodiff():
    px, py, yaw, *_rest, agents = _rand_inputs(3)
    pose0 = jnp.asarray([0.1, -0.2, 0.4])
    w = 40.0
    r_ref, (gth,) = _jacdiag(
        lambda y_: critics.agent_angle_cost(w, y_, pose0, agents), yaw
    )
    # Precompute steer/active exactly as the fused path does (u-independent).
    steer, active = _steer_active(w, pose0, agents)
    r, g = cg.agent_angle_grad(w, yaw, steer, active)
    _check(r_ref, r, (gth,), [_dense(g, yaw)[2]])


def _steer_active(weight, pose0, agents):
    """Reference agent-selection logic (critics._agent_angle_impl) minus the
    yaw-dependent tail; duplicated here to pin the fused path's precompute."""
    from nav2_social_mpc_controller_tpu.ops.fused_iter import agent_angle_precompute

    return agent_angle_precompute(pose0, agents)


def test_proxemics_grad_matches_autodiff():
    px, py, *_rest, agents = _rand_inputs(4)
    w = 100.0

    def f(px_, py_):
        return critics.proxemics_cost(w, jnp.stack([px_, py_], -1), agents)

    r_ref, (gx, gy) = _jacdiag(f, px, py)
    r, g = cg.proxemics_grad(w, px, py, _agent_list(agents))
    _check(r_ref, r, (gx, gy), _dense(g, px)[:2])


def test_proxemics_grad_no_valid_agents():
    px, py, *_rest, agents = _rand_inputs(5)
    agents = agents.at[:, :, 3].set(-1.0)
    r, g = cg.proxemics_grad(100.0, px, py, _agent_list(agents))
    assert np.all(np.asarray(r) == 0.0)
    assert np.all(np.asarray(_dense(g, px)[0]) == 0.0)


@pytest.mark.parametrize("n_agents", [1, 3, 6])
def test_social_work_grad_matches_autodiff(n_agents):
    px, py, yaw, v, w_, agents = _rand_inputs(6, n=n_agents)
    weight = 120.0

    def f(px_, py_, yaw_, v_):
        pos = jnp.stack([px_, py_], -1)
        vw = jnp.stack([v_, jnp.zeros_like(v_)], -1)
        return critics.social_work_cost(weight, pos, yaw_, vw, agents)

    r_ref, (gx, gy, gth, gv) = _jacdiag(f, px, py, yaw, v)
    r, g = cg.social_work_grad(weight, px, py, yaw, v, _agent_list(agents))
    gd = _dense(g, px)
    _check(r_ref, r, (gx, gy, gth, gv), gd[:4], atol=1e-8)


def test_obstacle_grad_chain():
    """obstacle_grad chains (val, drow, dcol) to (x, y, yaw) like autodiff
    through sample_costmap at the front point."""
    rng = np.random.default_rng(7)
    grid = jnp.asarray(rng.uniform(0, 254, (40, 40)))
    origin = jnp.asarray([-1.0, -1.0])
    res = 0.05
    px = jnp.asarray(rng.uniform(-0.5, 0.5, 5))
    py = jnp.asarray(rng.uniform(-0.5, 0.5, 5))
    yaw = jnp.asarray(rng.uniform(-3, 3, 5))
    w = 0.2

    def f(px_, py_, yaw_):
        poses = jnp.stack([px_, py_, yaw_], -1)
        return critics.obstacle_cost(w, poses, grid, origin, res)

    r_ref, (gx, gy, gth) = _jacdiag(f, px, py, yaw)

    from nav2_social_mpc_controller_tpu.world.grid import bicubic_linearize

    front_x = px + critics.FRONT_OFFSET * jnp.cos(yaw)
    front_y = py + critics.FRONT_OFFSET * jnp.sin(yaw)
    col = (front_x - origin[0]) / res
    row = (front_y - origin[1]) / res
    val, drow, dcol = bicubic_linearize(grid, row, col)
    r, g = cg.obstacle_grad(w, val, drow, dcol, yaw, 1.0 / res, critics.FRONT_OFFSET)
    _check(r_ref, r, (gx, gy, gth), _dense(g, px)[:3])
