"""Tests for the Pallas batched SPD solve kernel (interpret mode on CPU)
and its custom_vmap dispatch."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.solver.pallas_solve import (
    batched_spd_solve_pallas,
    spd_solve,
)


def _random_spd(rng, n, d, dtype=np.float32):
    m = rng.normal(size=(n, d, d)).astype(dtype)
    a = np.einsum("nij,nkj->nik", m, m) + 0.5 * np.eye(d, dtype=dtype)
    b = rng.normal(size=(n, d)).astype(dtype)
    return a, b


def test_pallas_kernel_matches_numpy_d6():
    rng = np.random.default_rng(0)
    a, b = _random_spd(rng, 37, 6)  # non-multiple of the lane block
    x = np.asarray(batched_spd_solve_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True))
    expected = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, expected, rtol=2e-4, atol=2e-5)


def test_pallas_kernel_matches_numpy_d12():
    rng = np.random.default_rng(1)
    a, b = _random_spd(rng, 1024, 12)
    x = np.asarray(batched_spd_solve_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True))
    expected = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, expected, rtol=2e-3, atol=2e-4)


def test_spd_solve_unbatched_and_vmapped_agree():
    rng = np.random.default_rng(2)
    a, b = _random_spd(rng, 16, 6)
    single = np.stack(
        [np.asarray(spd_solve(jnp.asarray(a[i]), jnp.asarray(b[i]))) for i in range(16)]
    )
    batched = np.asarray(jax.vmap(spd_solve)(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(batched, single, rtol=1e-4, atol=1e-5)


def test_spd_solve_f64_path():
    rng = np.random.default_rng(3)
    a, b = _random_spd(rng, 8, 6, dtype=np.float64)
    x = np.asarray(jax.vmap(spd_solve)(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b[..., None])[..., 0], rtol=1e-10)
