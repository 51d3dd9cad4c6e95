"""SE(2) frame transforms — the framework's replacement for the reference's
TF2 tree lookups (social_mpc_controller.cpp:285-320 transformPose/
transformPoint, path_handler.cpp:51, obstacle_distance_interface.cpp:116-154
transformObstacleDistance).

A frame is a pose (x, y, yaw) of the child frame expressed in the parent.
All ops are jittable and batched over leading axes.
"""

import jax.numpy as jnp

from nav2_social_mpc_controller_tpu.utils.angles import wrap_to_pi


def compose(a, b):
    """Pose composition a ⊕ b: b expressed in a's parent frame.
    a, b: (..., 3) [x, y, yaw]."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    yaw = wrap_to_pi(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, yaw], axis=-1)


def inverse(a):
    """Pose inverse: the parent frame expressed in a."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    return jnp.stack([x, y, wrap_to_pi(-a[..., 2])], axis=-1)


def transform_point(frame, point):
    """Point in `frame` coords -> parent coords. frame: (..., 3);
    point: (..., 2)."""
    c, s = jnp.cos(frame[..., 2]), jnp.sin(frame[..., 2])
    x = frame[..., 0] + c * point[..., 0] - s * point[..., 1]
    y = frame[..., 1] + s * point[..., 0] + c * point[..., 1]
    return jnp.stack([x, y], axis=-1)


def point_to_frame(frame, point):
    """Point in parent coords -> `frame` coords (the trajectorizer's local
    waypoint transform, path_trajectorizer.cpp:182-185)."""
    c, s = jnp.cos(frame[..., 2]), jnp.sin(frame[..., 2])
    dx = point[..., 0] - frame[..., 0]
    dy = point[..., 1] - frame[..., 1]
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy], axis=-1)


def transform_pose(frame, pose):
    """Pose in `frame` coords -> parent coords (== compose)."""
    return compose(frame, pose)


def pose_to_frame(frame, pose):
    """Pose in parent coords -> `frame` coords."""
    return compose(inverse(frame), pose)


def transform_grid_origin(frame, origin_xy):
    """Re-express a grid origin in another frame — the core of
    transformObstacleDistance (obstacle_distance_interface.cpp:116-132),
    which shifts the ESDF origin into the costmap's global frame."""
    return transform_point(frame, origin_xy)
