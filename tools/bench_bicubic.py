#!/usr/bin/env python
"""Standalone bicubic-kernel microbenchmark: XLA stencil path vs the
per-scenario Pallas kernel vs the lane-packed Pallas kernel, timed in-graph
(fori_loop with iteration-dependent coords so nothing hoists)."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, win, rowf, colf, iters=200, repeats=3):
    @jax.jit
    def loop(win, rowf, colf):
        def body(i, acc):
            v, dr, dc = fn(win, rowf + 1e-4 * i, colf)
            return acc + jnp.sum(v) + jnp.sum(dr) + jnp.sum(dc)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    out = loop(win, rowf, colf)
    np.asarray(out)  # warm-up + fence
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(loop(win, rowf, colf))
        t = time.perf_counter() - t0
        best = t if best is None or t < best else best
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=29)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    from nav2_social_mpc_controller_tpu.ops.bicubic_pallas import (
        bicubic_linearize_pallas,
        bicubic_linearize_pallas_packed,
    )
    from nav2_social_mpc_controller_tpu.world.grid import _bicubic_flat_with_grads

    rng = np.random.default_rng(0)
    b, n, s = args.batch, args.window, args.samples
    win = jnp.asarray(rng.uniform(0, 254, (b, n, n)).astype(np.float32))
    rowf = jnp.asarray(rng.uniform(0, n - 1, (b, s)).astype(np.float32))
    colf = jnp.asarray(rng.uniform(0, n - 1, (b, s)).astype(np.float32))

    xla = jax.vmap(_bicubic_flat_with_grads)
    for name, fn in [
        ("xla_stencil", xla),
        ("pallas_per_scenario", bicubic_linearize_pallas),
        ("pallas_lane_packed", bicubic_linearize_pallas_packed),
    ]:
        t = bench(fn, win, rowf, colf, iters=args.iters)
        print(f"{name:22s} {t * 1e6:9.1f} us/call  ({b} scenarios x {s} samples, {n}x{n} window)")


if __name__ == "__main__":
    main()
