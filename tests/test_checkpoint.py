"""Checkpoint/restore round-trip for batched controller carries."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.controller.controller import make_carry
from nav2_social_mpc_controller_tpu.utils import checkpoint


def test_carry_roundtrip(tmp_path):
    cfg = benchmark_social_config()
    carry = jax.vmap(lambda i: make_carry(cfg))(jnp.arange(4))
    carry = carry._replace(
        prev_path=carry.prev_path + 1.5,
        prev_n=carry.prev_n + 7,
    )
    path = checkpoint.save_carry(str(tmp_path / "carry"), carry)
    like = jax.vmap(lambda i: make_carry(cfg))(jnp.arange(4))
    restored = checkpoint.restore_carry(path, like)
    np.testing.assert_allclose(np.asarray(restored.prev_path), np.asarray(carry.prev_path))
    np.testing.assert_array_equal(np.asarray(restored.prev_n), np.asarray(carry.prev_n))
    assert restored.prev_cmds.dtype == carry.prev_cmds.dtype
