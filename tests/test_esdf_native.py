"""Native C++ ESDF builder vs the NumPy brute-force oracle.

Distances must match exactly (both are exact EDTs); the nearest-obstacle
INDEX may differ only between equidistant obstacles, so indexes are checked
by the distance they imply."""

import numpy as np
import pytest

from nav2_social_mpc_controller_tpu.runtime import esdf


@pytest.fixture(scope="module")
def native():
    if not esdf.native_available():
        pytest.skip("g++ unavailable; native ESDF builder not built")
    return True


def _check(occ, resolution=0.05):
    dist_n, idx_n = esdf.build_esdf(occ, resolution)
    dist_b, idx_b = esdf.brute_force_esdf(occ, resolution)
    np.testing.assert_allclose(dist_n, dist_b, atol=1e-5)
    h, w = occ.shape
    if occ.any():
        # index validity: points at an actual obstacle cell at the claimed distance
        yy, xx = np.mgrid[0:h, 0:w]
        ox = idx_n % w
        oy = idx_n // w
        assert occ[oy, ox].all(), "index must point at an obstacle cell"
        implied = np.sqrt((xx - ox) ** 2 + (yy - oy) ** 2) * resolution
        np.testing.assert_allclose(implied, dist_b, atol=1e-5)


def test_random_maps(native):
    rng = np.random.default_rng(0)
    for density in (0.002, 0.05, 0.4):
        occ = rng.random((48, 64)) < density
        _check(occ)


def test_single_obstacle(native):
    occ = np.zeros((32, 32), bool)
    occ[10, 20] = True
    dist, idx = esdf.build_esdf(occ, 0.1)
    assert idx[0, 0] == 20 + 10 * 32
    np.testing.assert_allclose(dist[10, 20], 0.0, atol=1e-7)
    np.testing.assert_allclose(dist[10, 25], 0.5, atol=1e-6)


def test_empty_map(native):
    occ = np.zeros((16, 16), bool)
    dist, idx = esdf.build_esdf(occ, 0.05, empty_value=1e3)
    assert (dist == 1e3).all()
    assert (idx == 0).all()


def test_full_map(native):
    occ = np.ones((8, 8), bool)
    dist, idx = esdf.build_esdf(occ, 0.05)
    assert (dist == 0).all()
    yy, xx = np.mgrid[0:8, 0:8]
    np.testing.assert_array_equal(idx, xx + yy * 8)


def test_large_map_performance(native):
    rng = np.random.default_rng(1)
    occ = rng.random((512, 512)) < 0.01
    import time

    t0 = time.perf_counter()
    dist, idx = esdf.build_esdf(occ, 0.05)
    elapsed = time.perf_counter() - t0
    assert elapsed < 1.0, f"native EDT too slow: {elapsed:.3f}s for 512x512"
    assert np.isfinite(dist).all()
