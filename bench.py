#!/usr/bin/env python
"""Benchmark harness: social-MPC solves/s/chip on the benchmark config.

Measures the FULL controller step (plan windowing -> trajectorize -> FOV
filter -> SFM people projection -> 40-iteration LM solve -> extraction) on a
batch of independent scenarios — the reference solves ONE such problem per
50 ms control tick on CPU (BASELINE.md).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N}
vs_baseline is measured against the north-star target of 1e4 solves/s/chip
(BASELINE.json; the reference publishes no throughput numbers, its envelope
is 20 solves/s budget on CPU).

Runs on whatever platform the ambient JAX environment provides (real TPU
under axon; CPU elsewhere). Use --batch/--iters to adjust.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--people", type=int, default=3)
    ap.add_argument("--config", choices=["social", "obstacle"], default="social")
    args = ap.parse_args()

    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_obstacle_only_config,
        benchmark_social_config,
    )
    from nav2_social_mpc_controller_tpu.controller.controller import make_carry, make_step_batch
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch

    cfg = benchmark_social_config() if args.config == "social" else benchmark_obstacle_only_config()

    # Build a diverse scenario base host-side (data-loading layer), transfer
    # ONCE, and tile to the requested batch size on device — minimizing
    # host->device traffic (HBM-bandwidth rule: the grids dominate bytes).
    base = min(64, args.batch)
    log(f"generating {base} base scenarios...")
    scb_host = make_scenario_batch(cfg, base, n_valid_people=args.people)
    reps = max(1, args.batch // base)
    batch = base * reps
    log(f"device transfer + tile x{reps} -> batch {batch}...")
    scb_base = jax.tree.map(jnp.asarray, scb_host)
    tile = jax.jit(
        lambda t: jax.tree.map(lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), t)
    )
    scb = jax.block_until_ready(tile(scb_base))

    step_b = make_step_batch(cfg)
    carry0 = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(batch))

    # Warm-up / compile
    log("compiling + warm-up step...")
    t0 = time.perf_counter()
    cmd, aux, carry = step_b(scb, carry0)
    jax.block_until_ready(cmd)
    compile_time = time.perf_counter() - t0
    log(f"compiled in {compile_time:.1f}s; timing {args.iters} iters...")

    # Timed: iterate the controller tick (carry feeds back = warm starts)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        cmd, aux, carry = step_b(scb, carry)
    jax.block_until_ready(cmd)
    elapsed = time.perf_counter() - t0

    solves = batch * args.iters
    solves_per_s = solves / elapsed
    latency_ms = elapsed / args.iters * 1000.0

    result = {
        "metric": f"social_mpc_solves_per_s_per_chip_H{cfg.optimizer.control_horizon}_"
        f"{args.people}agents_{args.config}",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 1e4, 3),
        "batch": batch,
        "iters": args.iters,
        "batch_latency_ms": round(latency_ms, 2),
        "per_solve_latency_us": round(elapsed / solves * 1e6, 2),
        "compile_s": round(compile_time, 1),
        "platform": jax.devices()[0].platform,
        "usable_frac": float(np.mean(np.asarray(aux.solve.usable))),
        "mean_lm_iters": float(np.mean(np.asarray(aux.solve.iterations))),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
