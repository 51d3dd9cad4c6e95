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
    ap.add_argument(
        "--config", choices=["social", "obstacle", "omni6", "stress36"], default="social"
    )
    ap.add_argument(
        "--profile", metavar="DIR", default=None, help="capture a jax.profiler trace of the timed loop"
    )
    ap.add_argument("--repeats", type=int, default=3, help="min-of-k executions per program")
    args = ap.parse_args()

    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_obstacle_only_config,
        benchmark_omni_6agents_config,
        benchmark_social_config,
        benchmark_stress_h36_config,
    )
    from nav2_social_mpc_controller_tpu.controller.controller import make_carry
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch

    cfg = {
        "social": benchmark_social_config,
        "obstacle": benchmark_obstacle_only_config,
        "omni6": benchmark_omni_6agents_config,
        "stress36": benchmark_stress_h36_config,
    }[args.config]()
    if args.config == "omni6":
        args.people = max(args.people, 6)

    # Build a diverse scenario base host-side (data-loading layer), transfer
    # ONCE, and tile to the requested batch size on device — minimizing
    # host->device traffic (HBM-bandwidth rule: the grids dominate bytes).
    # Native multithreaded generator when a compiler is present (512 unique
    # scenarios); NumPy oracle fallback (64).
    from nav2_social_mpc_controller_tpu.runtime.scenario_native import (
        generate_scenario_batch,
        native_available,
    )

    if native_available():
        base = min(512, args.batch)
        log(f"generating {base} base scenarios (native)...")
        scb_host = generate_scenario_batch(cfg, base, n_valid_people=args.people)
    else:
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

    import functools

    from nav2_social_mpc_controller_tpu.controller.controller import step as step_fn

    carry0 = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(batch))

    # The whole timed campaign is ONE device program: lax.scan over control
    # ticks of the vmapped step (carry feeds back = warm starts). A single
    # dispatch avoids per-tick tunnel round-trips — and queuing many separate
    # executions has been observed to wedge the single-chip relay.
    vstep = jax.vmap(functools.partial(step_fn, cfg))

    @functools.partial(jax.jit, static_argnames="n_iters")
    def run_ticks(scb, carry, n_iters):
        def tick(c, i):
            # Perturb the robot pose per tick so NO stage is loop-invariant
            # (otherwise XLA hoists the carry-independent trajectorizer out
            # of the scan and flatters the per-tick number).
            eps = (1e-6 * i).astype(scb.robot.pose.dtype)
            scb_i = scb._replace(robot=scb.robot._replace(pose=scb.robot.pose + eps))
            cmd, aux, c = vstep(scb_i, c)
            return c, (cmd.linear_x[0], aux.solve.usable, aux.solve.iterations)

        carry, (v0, usable, iters) = jax.lax.scan(
            tick, carry, jnp.arange(n_iters), length=n_iters
        )
        return carry, v0, usable[-1], iters[-1]

    # AOT-compile both a 1-tick and an N-tick program, then execute each
    # EXACTLY ONCE and time to scalar fetch. Rationale (measured on the axon
    # tunnel): (a) block_until_ready can return before remote execution
    # completes, so only a fetch is a trustworthy fence; (b) re-executing an
    # executable can stall in the tunnel's claim path, so the timed run is a
    # first execution. Per-tick cost = (N-tick time - 1-tick time) / (N - 1),
    # which also cancels the fixed dispatch/fetch overhead.
    assert args.iters >= 2, "--iters must be >= 2"
    log("AOT compiling 1-tick and N-tick programs...")
    t0 = time.perf_counter()
    exe1 = run_ticks.lower(scb, carry0, 1).compile()
    exe_n = run_ticks.lower(scb, carry0, args.iters).compile()
    compile_time = time.perf_counter() - t0
    log(f"compiled in {compile_time:.1f}s; executing 1-tick program...")

    def timed_exec(exe):
        t0 = time.perf_counter()
        carry, v0, usable, lm_iters = exe(scb, carry0)
        np.asarray(v0)  # fetch -> hard completion fence
        return time.perf_counter() - t0, usable, lm_iters

    # min-of-k: individual executions over the axon tunnel can stall for
    # minutes in the claim path; the minimum is the honest device+dispatch
    # time.
    def best_of(exe, k):
        best = None
        for j in range(k):
            t, usable, lm_iters = timed_exec(exe)
            log(f"  attempt {j}: {t:.3f}s")
            if best is None or t < best[0]:
                best = (t, usable, lm_iters)
        return best

    t_1, _, _ = best_of(exe1, args.repeats)
    log(f"1 tick in {t_1:.3f}s; executing {args.iters}-tick program...")
    if args.profile:
        import contextlib

        prof_ctx = jax.profiler.trace(args.profile)
    else:
        import contextlib

        prof_ctx = contextlib.nullcontext()
    with prof_ctx:
        t_n, usable, lm_iters = best_of(exe_n, args.repeats)
    log(f"{args.iters} ticks in {t_n:.3f}s")

    noisy = t_n <= t_1
    if noisy:
        # Tunnel stall contaminated the 1-tick time; fall back to the N-tick
        # total as a conservative LOWER bound on throughput.
        per_tick = t_n / args.iters
    else:
        per_tick = (t_n - t_1) / (args.iters - 1)
    solves_per_s = batch / per_tick
    latency_ms = per_tick * 1000.0

    result = {
        "metric": f"social_mpc_solves_per_s_per_chip_H{cfg.optimizer.control_horizon}_"
        f"{args.people}agents_{args.config}",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 1e4, 3),
        "batch": batch,
        "iters": args.iters,
        "batch_latency_ms": round(latency_ms, 3),
        "per_solve_latency_us": round(per_tick / batch * 1e6, 3),
        "t_1_tick_s": round(t_1, 3),
        "t_n_ticks_s": round(t_n, 3),
        "noisy_timing_lower_bound": bool(noisy),
        "compile_s": round(compile_time, 1),
        "platform": jax.devices()[0].platform,
        "usable_frac": float(np.mean(np.asarray(usable))),
        "mean_lm_iters": float(np.mean(np.asarray(lm_iters))),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
