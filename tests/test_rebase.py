"""Grid frame-rebase tests (transformObstacleDistance equivalent,
obstacle_distance_interface.cpp:116-154): translation-only rebases shift the
origin exactly like the reference; rotated rebases resample correctly."""

import math

import numpy as np

from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.utils.scenarios import make_costmap, make_esdf
from nav2_social_mpc_controller_tpu.world.grid import (
    esdf_nearest_obstacle_diff,
    sample_costmap,
)
from nav2_social_mpc_controller_tpu.world.transforms import rebase_costmap, rebase_esdf


def _world():
    cm = make_costmap(80, 80, obstacles=[(1.0, 0.5, 0.3)], dtype=np.float64)
    esdf = make_esdf(
        80, 80, obstacle_cells=[(40, 70), (10, 15)], dtype=np.float64
    )
    return cm, esdf


def test_translation_rebase_is_exact_origin_shift():
    cm, esdf = _world()
    frame = np.array([2.0, -1.5, 0.0])
    cm2 = rebase_costmap(frame, cm)
    esdf2 = rebase_esdf(frame, esdf)
    # Data untouched — the reference transforms ONLY the origin pose.
    np.testing.assert_array_equal(np.asarray(cm2.data), np.asarray(cm.data))
    np.testing.assert_array_equal(np.asarray(esdf2.indexes), np.asarray(esdf.indexes))
    np.testing.assert_allclose(np.asarray(cm2.origin), np.asarray(cm.origin) + frame[:2])
    np.testing.assert_allclose(np.asarray(esdf2.origin), np.asarray(esdf.origin) + frame[:2])
    # Sampling any world point through the rebased grid == sampling the
    # original grid at the un-transformed point.
    p_new = np.array([2.5, -1.2])
    p_old = p_new - frame[:2]
    v_new = float(sample_costmap(cm2.data, cm2.origin, cm2.resolution, p_new))
    v_old = float(sample_costmap(cm.data, cm.origin, cm.resolution, p_old))
    assert abs(v_new - v_old) < 1e-9


def test_rotated_rebase_costmap_samples_match():
    cm, _ = _world()
    yaw = math.pi / 5.0
    frame = np.array([0.7, -0.3, yaw])
    cm2 = rebase_costmap(frame, cm)
    c, s = math.cos(yaw), math.sin(yaw)
    rng = np.random.default_rng(0)
    for _ in range(20):
        # Random source-frame point well inside the grid.
        p_src = np.array([rng.uniform(0.0, 2.0), rng.uniform(-2.0, 0.0)])
        p_tgt = np.array(
            [frame[0] + c * p_src[0] - s * p_src[1], frame[1] + s * p_src[0] + c * p_src[1]]
        )
        v_src = float(sample_costmap(cm.data, cm.origin, cm.resolution, p_src))
        v_tgt = float(sample_costmap(cm2.data, cm2.origin, cm2.resolution, p_tgt))
        # Bilinear resample + bicubic sampling: tolerance is interpolation
        # error, scaled to the 0..254 cost range.
        assert abs(v_src - v_tgt) < 8.0, (p_src, v_src, v_tgt)


def test_rotated_rebase_esdf_nearest_obstacle_consistent():
    _, esdf = _world()
    yaw = math.pi / 2.0  # exact quarter turn: nearest-neighbor is lossless
    frame = np.array([0.0, 0.0, yaw])
    esdf2 = rebase_esdf(frame, esdf)
    c, s = math.cos(yaw), math.sin(yaw)
    rng = np.random.default_rng(1)
    res = float(esdf.resolution)
    for _ in range(20):
        p_src = np.array([rng.uniform(-0.5, 2.5), rng.uniform(-2.5, 0.5)])
        p_tgt = np.array([c * p_src[0] - s * p_src[1], s * p_src[0] + c * p_src[1]])
        d_src, ok_src = esdf_nearest_obstacle_diff(
            esdf.distances, esdf.indexes, esdf.origin, esdf.resolution, p_src
        )
        d_tgt, ok_tgt = esdf_nearest_obstacle_diff(
            esdf2.distances, esdf2.indexes, esdf2.origin, esdf2.resolution, p_tgt
        )
        assert bool(ok_src) and bool(ok_tgt)
        # The obstacle VECTOR rotates with the frame; its length is preserved
        # up to one cell of index-remap quantization.
        n_src = float(np.linalg.norm(np.asarray(d_src)))
        n_tgt = float(np.linalg.norm(np.asarray(d_tgt)))
        assert abs(n_src - n_tgt) <= 2.0 * res + 1e-9, (p_src, n_src, n_tgt)


def test_rotated_rebase_distance_field_preserved():
    _, esdf = _world()
    frame = np.array([1.0, 2.0, math.pi / 3.0])
    esdf2 = rebase_esdf(frame, esdf)
    # Footprint grows to cover the rotated rect.
    assert esdf2.distances.shape[0] >= esdf.distances.shape[0]
    d = np.asarray(esdf2.distances)
    assert np.isfinite(d).all()
    assert d.min() >= 0.0
    # The minimum distance (at the obstacles) survives the resample.
    assert abs(float(d.min()) - float(np.asarray(esdf.distances).min())) < 1e-9
