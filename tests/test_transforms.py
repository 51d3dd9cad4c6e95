"""SE(2) transform tests: algebraic identities and trajectorizer-local-frame
consistency."""

import math

import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.world import transforms as tf


def _rand_poses(rng, n):
    p = rng.uniform(-3, 3, size=(n, 3))
    p[:, 2] = rng.uniform(-math.pi, math.pi, size=n)
    return jnp.asarray(p)


def test_compose_inverse_identity():
    rng = np.random.default_rng(0)
    a = _rand_poses(rng, 16)
    ident = tf.compose(a, tf.inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-12)


def test_point_roundtrip():
    rng = np.random.default_rng(1)
    f = _rand_poses(rng, 8)
    pts = jnp.asarray(rng.uniform(-5, 5, size=(8, 2)))
    back = tf.point_to_frame(f, tf.transform_point(f, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-12)


def test_pose_roundtrip():
    rng = np.random.default_rng(2)
    f = _rand_poses(rng, 8)
    p = _rand_poses(rng, 8)
    back = tf.pose_to_frame(f, tf.transform_pose(f, p))
    np.testing.assert_allclose(np.asarray(back[:, :2]), np.asarray(p[:, :2]), atol=1e-12)
    np.testing.assert_allclose(
        np.sin(np.asarray(back[:, 2]) - np.asarray(p[:, 2])), 0.0, atol=1e-12
    )


def test_matches_trajectorizer_local_transform():
    # path_trajectorizer.cpp:182-185: dx = (wp-r).R(theta) etc.
    rx, ry, rtheta = 0.5, -0.2, 0.7
    wpx, wpy = 2.0, 1.0
    dx = (wpx - rx) * math.cos(rtheta) + (wpy - ry) * math.sin(rtheta)
    dy = -(wpx - rx) * math.sin(rtheta) + (wpy - ry) * math.cos(rtheta)
    local = tf.point_to_frame(jnp.asarray([rx, ry, rtheta]), jnp.asarray([wpx, wpy]))
    np.testing.assert_allclose(np.asarray(local), [dx, dy], atol=1e-12)
