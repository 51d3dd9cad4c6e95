"""Angle utilities (reference: angles/angles.h usage + wrapToPi in
social_work_cost_function.hpp:39-46).

All functions are jittable and operate elementwise on arrays.
"""

import jax.numpy as jnp


def wrap_to_pi(angle):
    """Wrap angle(s) to (-pi, pi].

    Matches the reference loop semantics ``while (a <= -pi) a += 2pi; while
    (a > pi) a -= 2pi`` (sfm.hpp:252-260) for finite inputs, implemented
    branch-free for XLA.
    """
    # mod maps to [0, 2pi); shift so output is (-pi, pi]
    a = jnp.mod(-angle + jnp.pi, 2.0 * jnp.pi)
    return -(a - jnp.pi)


def wrap_atan2(angle):
    """atan2(sin(a), cos(a)) wrap — the critics' wrapAngle helper
    (agent_angle_cost_function.hpp:154). Output in [-pi, pi]."""
    return jnp.arctan2(jnp.sin(angle), jnp.cos(angle))


def shortest_angular_distance(a_from, a_to):
    """Shortest signed angular distance from a_from to a_to
    (angles::shortest_angular_distance, used by the FOV filter,
    social_mpc_controller.cpp:205)."""
    return wrap_to_pi(a_to - a_from)
