"""Unit tests for models.motion: block indexing and the shared rollout vs a
manual re-integration replicating computeUpdatedStateRedux."""

import math

import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.models.motion import (
    block_index_sequence,
    integrate_step,
    rollout_poses,
)


def test_block_index_sequence_reference_semantics():
    # H=18, block=6 -> blocks 0,1,2; beyond horizon the last block holds
    idx = block_index_sequence(29, 18, 6)
    assert list(idx[:6]) == [0] * 6
    assert list(idx[6:12]) == [1] * 6
    assert list(idx[12:18]) == [2] * 6
    assert list(idx[18:]) == [2] * 11
    # Non-divisible horizon
    idx2 = block_index_sequence(10, 5, 2)
    assert list(idx2) == [0, 0, 1, 1, 2, 2, 2, 2, 2, 2]


def _manual_state(pose0, u, dt, i, h, bl):
    """computeUpdatedStateRedux re-integration (update_state.hpp:46-61)."""
    x, y, th = pose0
    for j in range(i + 1):
        b = j // bl if j < h else (h - 1) // bl
        x += u[b][0] * math.cos(th) * dt
        y += u[b][0] * math.sin(th) * dt
        th += u[b][1] * dt
    return x, y, th


def test_rollout_matches_per_step_reintegration():
    rng = np.random.default_rng(0)
    h, bl, s = 18, 6, 29
    u = rng.uniform([-0.1, -1.0], [0.6, 1.0], size=(3, 2))
    pose0 = np.array([0.3, -0.2, 0.7])
    idx = block_index_sequence(s, h, bl)
    poses = np.asarray(rollout_poses(jnp.asarray(pose0), jnp.asarray(u), 0.05, idx))
    assert poses.shape == (s + 1, 3)
    np.testing.assert_allclose(poses[0], pose0, atol=0)
    for i in range(s):
        expected = _manual_state(pose0, u, 0.05, i, h, bl)
        np.testing.assert_allclose(poses[i + 1], expected, atol=1e-9, err_msg=f"step {i}")


def test_integrate_step_omni_axes():
    # vy strafes along +pi/2 body axis: at theta=0, vy moves +y only
    x, y, th = integrate_step(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.1)
    np.testing.assert_allclose([float(x), float(y), float(th)], [0.0, 0.1, 0.0], atol=1e-12)
    # at theta=pi/2, vx moves +y, vy moves -x
    x, y, th = integrate_step(0.0, 0.0, math.pi / 2, 1.0, 1.0, 0.5, 0.1)
    np.testing.assert_allclose([float(x), float(y)], [-0.1, 0.1], atol=1e-9)
    np.testing.assert_allclose(float(th), math.pi / 2 + 0.05, atol=1e-12)


def test_expand_blocks_matches_take():
    from nav2_social_mpc_controller_tpu.models.motion import expand_blocks

    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(4, 2)))
    idx = jnp.asarray(rng.integers(0, 4, size=(29,)), dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(expand_blocks(u, idx)), np.asarray(u)[np.asarray(idx)]
    )
