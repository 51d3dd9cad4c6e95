"""Tests for the fused rollout-prep Pallas kernel (ops/rollout_pallas.py):
interpret-mode equivalence against the XLA (S, B)-major prep formulation it
replaces inside ops/fused_iter._fused_batched."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.ops.rollout_pallas import rollout_prep_pallas


def _xla_prep(u, pose0, eb_t, win_origin, cmr, dt, front):
    """The exact XLA formulation from _fused_batched's fallback branch."""
    nb, s, b = eb_t.shape
    dtype = u.dtype
    u_blocks = u.reshape(b, nb, 2)
    uv = jnp.transpose(u_blocks[:, :, 0])
    uw = jnp.transpose(u_blocks[:, :, 1])
    v_t = jnp.sum(jnp.where(eb_t > 0, uv[:, None, :], 0.0), axis=0)
    w_t = jnp.sum(jnp.where(eb_t > 0, uw[:, None, :], 0.0), axis=0)

    th0 = pose0[:, 2][None, :]
    r1 = jnp.concatenate([w_t[None], eb_t], axis=0)
    c1 = dt * jnp.cumsum(r1, axis=1)
    th = th0 + c1[0]
    dth = c1[1:]
    th_prev = jnp.concatenate([jnp.broadcast_to(th0, (1, b)), th[:-1]], axis=0)
    dth_prev = jnp.concatenate([jnp.zeros((nb, 1, b), dtype), dth[:, :-1]], axis=1)

    cosp = jnp.cos(th_prev)
    sinp = jnp.sin(th_prev)
    r2 = jnp.concatenate(
        [
            (v_t * cosp)[None],
            (v_t * sinp)[None],
            eb_t * cosp[None],
            eb_t * sinp[None],
            (-v_t * sinp)[None] * dth_prev,
            (v_t * cosp)[None] * dth_prev,
        ],
        axis=0,
    )
    c2 = dt * jnp.cumsum(r2, axis=1)
    px = pose0[:, 0][None, :] + c2[0]
    py = pose0[:, 1][None, :] + c2[1]
    dxdv = c2[2 : 2 + nb]
    dydv = c2[2 + nb : 2 + 2 * nb]
    dxdw = c2[2 + 2 * nb : 2 + 3 * nb]
    dydw = c2[2 + 3 * nb : 2 + 4 * nb]

    fxp = px + front * jnp.cos(th)
    fyp = py + front * jnp.sin(th)
    col = (fxp - win_origin[:, 0][None, :]) / cmr[None, :]
    row = (fyp - win_origin[:, 1][None, :]) / cmr[None, :]
    return px, py, th, v_t, dxdv, dydv, dxdw, dydw, dth, row, col


def _random_inputs(rng, b, nb, s):
    d = 2 * nb
    u = rng.uniform(-0.8, 0.8, (b, d)).astype(np.float32)
    pose0 = np.stack(
        [
            rng.uniform(-5, 5, b),
            rng.uniform(-5, 5, b),
            rng.uniform(-np.pi, np.pi, b),
        ],
        axis=-1,
    ).astype(np.float32)
    # Contiguous block one-hots, like block_index_sequence produces.
    bl = -(-s // nb)
    block_idx = np.minimum(np.arange(s) // bl, nb - 1)
    eb = (block_idx[None, :, None] == np.arange(nb)[:, None, None]).astype(np.float32)
    eb_t = np.broadcast_to(eb, (nb, s, 1)).repeat(b, axis=2).astype(np.float32)
    win_origin = rng.uniform(-10, 0, (b, 2)).astype(np.float32)
    cmr = np.full((b,), 0.05, np.float32)
    return (
        jnp.asarray(u),
        jnp.asarray(pose0),
        jnp.asarray(eb_t),
        jnp.asarray(win_origin),
        jnp.asarray(cmr),
    )


def _kernel_outputs(u, pose0, eb_t, win_origin, cmr, dt, front):
    nb, s, b = eb_t.shape
    d = 2 * nb
    dp = -(-max(d, 1) // 8) * 8
    u_t8 = jnp.zeros((dp, b), jnp.float32).at[:d].set(u.T)
    sc8 = (
        jnp.zeros((8, b), jnp.float32)
        .at[0].set(pose0[:, 0])
        .at[1].set(pose0[:, 1])
        .at[2].set(pose0[:, 2])
        .at[3].set(win_origin[:, 0])
        .at[4].set(win_origin[:, 1])
        .at[5].set(cmr)
    )
    return rollout_prep_pallas(u_t8, eb_t, sc8, s, nb, dt, front, interpret=True)


def test_rollout_prep_kernel_matches_xla_prep():
    rng = np.random.default_rng(0)
    dt, front = 0.25, 0.25
    for b, nb, s in [(7, 3, 29), (4, 6, 36), (3, 1, 8)]:
        args = _random_inputs(rng, b, nb, s)
        ref = _xla_prep(*args, dt, front)
        got = _kernel_outputs(*args, dt, front)
        names = "px py pth v_t dxdv dydv dxdw dydw dth row col".split()
        for name, r, g in zip(names, ref, got):
            assert g.shape == r.shape, (name, g.shape, r.shape)
            # Products are replicated exactly; only the prefix-sum
            # association differs (sequential MXU vs XLA tree) -> ~1 ulp
            # of the partial sums. row/col divide by resolution 0.05, so
            # their absolute scale is 20x looser.
            atol = 2e-4 if name in ("row", "col") else 1e-5
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-5, atol=atol,
                err_msg=name,
            )


def test_rollout_prep_kernel_exact_integer_sensitivity_sums():
    """dth (dt * cumsum of 0/1 one-hots) must be EXACT: the products and
    integer partial sums are exactly representable regardless of summation
    association."""
    rng = np.random.default_rng(1)
    args = _random_inputs(rng, 5, 3, 29)
    dt, front = 0.25, 0.25
    ref = _xla_prep(*args, dt, front)
    got = _kernel_outputs(*args, dt, front)
    np.testing.assert_array_equal(np.asarray(got[8]), np.asarray(ref[8]))  # dth
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))  # v_t


def test_rollout_prep_kernel_batch_padding():
    """A batch that is not a multiple of the kernel's lane tile pads and
    slices back without contaminating real lanes."""
    rng = np.random.default_rng(2)
    dt, front = 0.2, 0.25
    args = _random_inputs(rng, 600, 3, 29)  # 600 = not a multiple of 512
    ref = _xla_prep(*args, dt, front)
    got = _kernel_outputs(*args, dt, front)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got[10]), np.asarray(ref[10]), rtol=2e-5, atol=2e-4
    )
