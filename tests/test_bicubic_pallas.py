"""Tests for the fused Pallas bicubic-linearize kernel (interpret mode on
CPU) and its custom_vmap dispatch through world.grid.bicubic_linearize."""

import jax
import jax.numpy as jnp
import numpy as np

from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import bicubic_linearize_pallas
from nav2_social_mpc_controller_tpu.world.grid import (
    _bicubic_flat_with_grads,
    bicubic_linearize,
)


def _random_case(rng, b, s, h, w, margin=2.0, integer_grid=True):
    # Integer-valued grids are the production domain (nav2 Costmap2D is
    # unsigned char; the reference interpolates Grid2D<u_char>) and the
    # precondition of the packed kernel's default 'split3' dot mode.
    grid = rng.uniform(0.0, 254.0, size=(b, h, w)).astype(np.float32)
    if integer_grid:
        grid = np.rint(grid)
    # Include out-of-range coords to exercise border clamping.
    rowf = rng.uniform(-margin, h - 1 + margin, size=(b, s)).astype(np.float32)
    colf = rng.uniform(-margin, w - 1 + margin, size=(b, s)).astype(np.float32)
    return jnp.asarray(grid), jnp.asarray(rowf), jnp.asarray(colf)


def _xla_reference(grid, rowf, colf):
    val, dr, dc = jax.vmap(_bicubic_flat_with_grads)(grid, rowf, colf)
    return np.asarray(val), np.asarray(dr), np.asarray(dc)


def test_pallas_kernel_matches_xla_stencil_path():
    rng = np.random.default_rng(0)
    grid, rowf, colf = _random_case(rng, b=5, s=30, h=40, w=40)  # odd B, odd S
    val, dr, dc = bicubic_linearize_pallas(grid, rowf, colf, use_bf16=False, interpret=True)
    ev, edr, edc = _xla_reference(grid, rowf, colf)
    np.testing.assert_allclose(np.asarray(val), ev, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dr), edr, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dc), edc, rtol=1e-5, atol=1e-4)


def test_pallas_kernel_bf16_dot_close():
    # bf16 operand truncation in the MXU dot mirrors XLA's DEFAULT-precision
    # TPU matmul; on a 0..254 costmap the error budget is ~1 cost unit.
    rng = np.random.default_rng(1)
    grid, rowf, colf = _random_case(rng, b=8, s=32, h=32, w=48)
    val, dr, dc = bicubic_linearize_pallas(grid, rowf, colf, use_bf16=True, interpret=True)
    ev, edr, edc = _xla_reference(grid, rowf, colf)
    np.testing.assert_allclose(np.asarray(val), ev, rtol=2e-2, atol=1.5)
    np.testing.assert_allclose(np.asarray(dr), edr, rtol=2e-2, atol=1.5)
    np.testing.assert_allclose(np.asarray(dc), edc, rtol=2e-2, atol=1.5)


def test_pallas_kernel_border_clamp_flat():
    # Far outside the grid every tap clamps to the border row/col: the value
    # is the corner value and both derivatives vanish.
    grid = jnp.broadcast_to(jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5), (3, 5, 5))
    rowf = jnp.full((3, 9), -7.0, jnp.float32)
    colf = jnp.full((3, 9), -7.0, jnp.float32)
    val, dr, dc = bicubic_linearize_pallas(grid, rowf, colf, use_bf16=False, interpret=True)
    np.testing.assert_allclose(np.asarray(val), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dc), 0.0, atol=1e-5)


def test_packed_kernel_matches_xla_stencil_path():
    """Lane-packed variant (4 scenarios per 128-lane tile): same clamping
    semantics as the per-scenario kernel, checked over odd batch sizes,
    non-square windows, and S spanning the 32-lane half-segment boundary."""
    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import (
        bicubic_linearize_pallas_packed,
    )

    rng = np.random.default_rng(10)
    for b, s, h, w in [(9, 29, 64, 64), (4, 32, 48, 80), (8, 39, 64, 64), (2, 5, 16, 16)]:
        grid, rowf, colf = _random_case(rng, b=b, s=s, h=h, w=w, margin=6.0)
        val, dr, dc = bicubic_linearize_pallas_packed(
            grid, rowf, colf, use_bf16=False, interpret=True
        )
        ev, edr, edc = _xla_reference(grid, rowf, colf)
        np.testing.assert_allclose(np.asarray(val), ev, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dr), edr, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dc), edc, rtol=1e-5, atol=1e-4)


def test_packed_kernel_long_sample_axis_falls_back():
    """S too long to pack (2*ceil32(S) > 128) must take the per-scenario
    kernel path and stay correct."""
    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import (
        bicubic_linearize_pallas_packed,
    )

    rng = np.random.default_rng(11)
    grid, rowf, colf = _random_case(rng, b=3, s=70, h=40, w=40)
    val, dr, dc = bicubic_linearize_pallas_packed(
        grid, rowf, colf, use_bf16=False, interpret=True
    )
    ev, edr, edc = _xla_reference(grid, rowf, colf)
    np.testing.assert_allclose(np.asarray(val), ev, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dr), edr, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dc), edc, rtol=1e-5, atol=1e-4)


def test_packed_kernel_border_clamp_flat():
    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import (
        bicubic_linearize_pallas_packed,
    )

    grid = jnp.broadcast_to(jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5), (5, 5, 5))
    rowf = jnp.full((5, 9), 11.0, jnp.float32)
    colf = jnp.full((5, 9), 11.0, jnp.float32)
    val, dr, dc = bicubic_linearize_pallas_packed(grid, rowf, colf, use_bf16=False, interpret=True)
    np.testing.assert_allclose(np.asarray(val), 24.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dc), 0.0, atol=1e-5)


def test_custom_vmap_dispatch_unbatched_and_cpu_fallback():
    # On CPU the vmap rule must take the XLA fallback and match per-scenario
    # unbatched calls exactly.
    rng = np.random.default_rng(2)
    grid, rowf, colf = _random_case(rng, b=4, s=12, h=20, w=20)
    batched = jax.vmap(bicubic_linearize)(grid, rowf, colf)
    for i in range(4):
        single = bicubic_linearize(grid[i], rowf[i], colf[i])
        for got, exp in zip(batched, single):
            np.testing.assert_allclose(np.asarray(got[i]), np.asarray(exp), rtol=1e-6)


def test_custom_vmap_shared_grid_fallback():
    # One grid shared across the batch (grid unbatched under vmap): the rule
    # must broadcast and stay correct.
    rng = np.random.default_rng(3)
    _, rowf, colf = _random_case(rng, b=6, s=10, h=16, w=16)
    grid = jnp.asarray(rng.uniform(0.0, 254.0, size=(16, 16)).astype(np.float32))
    batched = jax.vmap(bicubic_linearize, in_axes=(None, 0, 0))(grid, rowf, colf)
    for i in range(6):
        single = bicubic_linearize(grid, rowf[i], colf[i])
        for got, exp in zip(batched, single):
            np.testing.assert_allclose(np.asarray(got[i]), np.asarray(exp), rtol=1e-6)


def test_linearize_inside_lm_transform_stack():
    # The kernel's dispatch point in production: vmap over scenarios of a
    # jax.linearize through the custom-JVP bicubic sample. Verify tangents
    # still match jacfwd of the gather-stencil formulation.
    from nav2_social_mpc_controller_tpu.world.grid import (
        bicubic_interpolate,
        bicubic_interpolate_gather,
    )

    rng = np.random.default_rng(4)
    grid, rowf, colf = _random_case(rng, b=3, s=7, h=24, w=24, margin=0.0)

    def f(g, r, c):
        y, f_lin = jax.linearize(lambda rc: bicubic_interpolate(g, rc[0], rc[1]), jnp.stack([r, c]))
        tr = f_lin(jnp.stack([jnp.ones_like(r), jnp.zeros_like(c)]))
        tc = f_lin(jnp.stack([jnp.zeros_like(r), jnp.ones_like(c)]))
        return y, tr, tc

    y, tr, tc = jax.vmap(f)(grid, rowf, colf)

    def g_ref(g, r, c):
        val = jax.vmap(lambda rr, cc: bicubic_interpolate_gather(g, rr, cc))(r, c)
        jr = jax.vmap(jax.grad(bicubic_interpolate_gather, argnums=1), in_axes=(None, 0, 0))(g, r, c)
        jc = jax.vmap(jax.grad(bicubic_interpolate_gather, argnums=2), in_axes=(None, 0, 0))(g, r, c)
        return val, jr, jc

    ev, er, ec = jax.vmap(g_ref, in_axes=(0, 0, 0))(grid, rowf, colf)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ev), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tr), np.asarray(er), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tc), np.asarray(ec), rtol=1e-4, atol=1e-3)


def test_packed_kernel_split3_exact_on_integer_grids():
    """The default 'split3' dot (3 bf16 MXU passes) is f32-exact on
    bf16-representable (integer u8) grids — matching the 6-pass HIGHEST dot
    to f32 accumulation noise."""
    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import (
        bicubic_linearize_pallas_packed,
    )

    rng = np.random.default_rng(20)
    for b, s, h, w in [(9, 29, 64, 64), (4, 32, 48, 80)]:
        grid, rowf, colf = _random_case(rng, b=b, s=s, h=h, w=w, margin=6.0)
        v3, dr3, dc3 = bicubic_linearize_pallas_packed(
            grid, rowf, colf, dot_mode="split3", interpret=True
        )
        vh, drh, dch = bicubic_linearize_pallas_packed(
            grid, rowf, colf, dot_mode="highest", interpret=True
        )
        np.testing.assert_allclose(np.asarray(v3), np.asarray(vh), rtol=1e-6, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dr3), np.asarray(drh), rtol=1e-6, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dc3), np.asarray(dch), rtol=1e-6, atol=2e-4)


def test_packed_kernel_bf16_window_bitwise_matches_f32_split3():
    """A bf16-stored window (exact by the split3 u8 contract; shipped by the
    fused pipeline to halve per-iteration HBM reads) must produce BITWISE
    the same split3 results as the f32-stored window — the kernel's first
    act on an f32 window is the same bf16 cast. Non-split3 modes must
    upcast and match the f32 HIGHEST path."""
    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import (
        bicubic_linearize_pallas,
        bicubic_linearize_pallas_packed,
    )

    rng = np.random.default_rng(21)
    grid, rowf, colf = _random_case(rng, b=6, s=29, h=48, w=48, margin=4.0)
    grid_bf = grid.astype(jnp.bfloat16)
    assert np.array_equal(np.asarray(grid_bf, np.float32), np.asarray(grid))

    vf, drf, dcf = bicubic_linearize_pallas_packed(
        grid, rowf, colf, dot_mode="split3", interpret=True
    )
    vb, drb, dcb = bicubic_linearize_pallas_packed(
        grid_bf, rowf, colf, dot_mode="split3", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(vf))
    np.testing.assert_array_equal(np.asarray(drb), np.asarray(drf))
    np.testing.assert_array_equal(np.asarray(dcb), np.asarray(dcf))

    # Non-split3 packed mode upcasts rather than truncating the weights.
    vh, _, _ = bicubic_linearize_pallas_packed(
        grid, rowf, colf, dot_mode="highest", interpret=True
    )
    vbh, _, _ = bicubic_linearize_pallas_packed(
        grid_bf, rowf, colf, dot_mode="highest", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(vbh), np.asarray(vh))

    # Per-scenario (long-S fallback) variant: bf16 input upcasts too.
    vp, _, _ = bicubic_linearize_pallas(grid, rowf, colf, use_bf16=False, interpret=True)
    vpb, _, _ = bicubic_linearize_pallas(grid_bf, rowf, colf, use_bf16=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(vpb), np.asarray(vp))


def test_custom_vmap_bf16_grid_cpu_fallback_exact():
    """On CPU the custom_vmap rule upcasts a bf16-exact grid and takes the
    XLA stencil path — identical results to the f32 grid."""
    rng = np.random.default_rng(22)
    grid, rowf, colf = _random_case(rng, b=3, s=12, h=32, w=32)
    out_f = jax.vmap(bicubic_linearize)(grid, rowf, colf)
    out_b = jax.vmap(bicubic_linearize)(grid.astype(jnp.bfloat16), rowf, colf)
    for a, b_ in zip(out_f, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_split3_precondition_validated_at_host_boundary():
    """A float-valued costmap must fail loudly before it can silently lose
    ~1.5e-5 relative in the split3 dot (core/validate.check_costmap_bf16_exact);
    integer grids pass; the escape hatch disables the check."""
    import os

    import pytest

    from nav2_social_mpc_controller_tpu.core.validate import check_costmap_bf16_exact

    check_costmap_bf16_exact(np.arange(255, dtype=np.float32).reshape(1, 255))
    bad = np.array([[1.0003]], np.float32)
    with pytest.raises(ValueError, match="bfloat16"):
        check_costmap_bf16_exact(bad)
    os.environ["SOCIAL_MPC_BICUBIC_DOT"] = "highest"
    try:
        check_costmap_bf16_exact(bad)  # no split3 -> no precondition
    finally:
        del os.environ["SOCIAL_MPC_BICUBIC_DOT"]


def test_scenario_costmaps_are_integer_valued():
    from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
    from nav2_social_mpc_controller_tpu.core.validate import check_costmap_bf16_exact
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario

    sc = make_scenario(benchmark_social_config(), seed=0, n_valid_people=3)
    data = np.asarray(sc.costmap.data)
    assert np.array_equal(data, np.rint(data))
    check_costmap_bf16_exact(data)
