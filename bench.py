#!/usr/bin/env python
"""Benchmark harness: social-MPC solves/s/chip across the BASELINE configs.

Measures the FULL controller step (plan windowing -> trajectorize -> FOV
filter -> SFM people projection -> 40-iteration LM solve -> extraction) on a
batch of independent scenarios — the reference solves ONE such problem per
50 ms control tick on CPU (BASELINE.md).

Default run (what the driver executes) covers all four single-chip BASELINE
configurations — obstacle-only H18/0 agents, social H18/3, omnidirectional
H18/6 (the north-star metric config), stress H36 — plus a latency-vs-batch
curve on the social config, and prints ONE JSON line whose headline value is
the omni-6-agent throughput:

  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N,
   "configs": {...}, "latency_curve": [...], "max_batch_within_50ms": N}

vs_baseline is against the north-star target of 1e4 solves/s/chip
(BASELINE.json; the reference publishes no throughput numbers, its envelope
is 20 solves/s budget on CPU).

Single-config mode: `python bench.py --config social --batch 4096`.
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


CONFIG_PEOPLE = {"social": 3, "obstacle": 0, "omni6": 6, "stress36": 3}


def get_config(name, warm_start_mode=None):
    import dataclasses

    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_obstacle_only_config,
        benchmark_omni_6agents_config,
        benchmark_social_config,
        benchmark_stress_h36_config,
    )

    cfg = {
        "social": benchmark_social_config,
        "obstacle": benchmark_obstacle_only_config,
        "omni6": benchmark_omni_6agents_config,
        "stress36": benchmark_stress_h36_config,
    }[name]()
    if warm_start_mode:
        cfg = dataclasses.replace(
            cfg, optimizer=dataclasses.replace(cfg.optimizer, warm_start_mode=warm_start_mode)
        )
    return cfg


def make_batch(cfg, batch, n_people):
    """Build a diverse scenario base host-side (data-loading layer), transfer
    ONCE, and tile to the requested batch size on device — minimizing
    host->device traffic (HBM-bandwidth rule: the grids dominate bytes).
    Native multithreaded generator when a compiler is present (512 unique
    scenarios); NumPy oracle fallback (64)."""
    from nav2_social_mpc_controller_tpu.runtime.scenario_native import (
        generate_scenario_batch,
        native_available,
    )
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch

    if native_available():
        base = min(512, batch)
        scb_host = generate_scenario_batch(cfg, base, n_valid_people=n_people)
    else:
        base = min(64, batch)
        scb_host = make_scenario_batch(cfg, base, n_valid_people=n_people)
    reps = max(1, batch // base)
    scb_base = jax.tree.map(jnp.asarray, scb_host)
    tile = jax.jit(
        lambda t: jax.tree.map(lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), t)
    )
    return jax.block_until_ready(tile(scb_base)), base * reps


def compile_program(cfg, scb, carry0, compaction=0.0):
    """ONE AOT program with a DYNAMIC tick count (fori_loop over the vmapped
    step with the warm-start carry feeding back): the same executable times
    both the 1-tick and the N-tick campaign, halving compile time vs the
    former two-lowering scheme (VERDICT r1 item 10). A single dispatch per
    measurement avoids per-tick tunnel round-trips.

    compaction > 0 swaps in the converged-lane-compaction pipeline
    (make_step_batch_compacted) with that capacity fraction."""
    import functools

    from nav2_social_mpc_controller_tpu.controller.controller import (
        make_step_batch_compacted,
        step as step_fn,
    )

    if compaction > 0.0:
        vstep = make_step_batch_compacted(cfg, compaction, validate=False)
    else:
        vstep = jax.vmap(functools.partial(step_fn, cfg))
    batch = scb.robot.pose.shape[0]

    @jax.jit
    def run_ticks(scb, carry, n):
        def tick(t, state):
            carry, _ = state
            # Perturb the robot pose per tick so NO stage is loop-invariant
            # (otherwise XLA hoists the carry-independent trajectorizer out
            # of the loop and flatters the per-tick number).
            eps = (1e-6 * t).astype(scb.robot.pose.dtype)
            scb_t = scb._replace(robot=scb.robot._replace(pose=scb.robot.pose + eps))
            cmd, aux, carry = vstep(scb_t, carry)
            return (carry, (cmd.linear_x[0], aux.solve.usable, aux.solve.iterations,
                            aux.solve.termination))

        out0 = (
            jnp.zeros((), scb.robot.pose.dtype),
            jnp.zeros((batch,), bool),
            jnp.zeros((batch,), jnp.int32),
            jnp.zeros((batch,), jnp.int32),
        )
        carry, (v0, usable, iters, term) = jax.lax.fori_loop(0, n, tick, (carry, out0))
        return carry, v0, usable, iters, term

    t0 = time.perf_counter()
    exe = run_ticks.lower(scb, carry0, jnp.int32(1)).compile()
    return exe, time.perf_counter() - t0


def measure(exe, scb, carry0, iters, repeats):
    """Execute the dynamic-tick program at n=1 and n=iters; per-tick cost =
    (t_n - t_1)/(iters - 1), cancelling fixed dispatch/fetch overhead. Only a
    scalar FETCH is a trustworthy completion fence over the axon tunnel
    (block_until_ready can return early), and min-of-k filters tunnel stalls."""

    def timed(n):
        best = None
        times = []
        for j in range(repeats):
            t0 = time.perf_counter()
            carry, v0, usable, lm_iters, term = exe(scb, carry0, np.int32(n))
            np.asarray(v0)  # fetch -> hard completion fence
            t = time.perf_counter() - t0
            times.append(t)
            log(f"  n={n} attempt {j}: {t:.3f}s")
            if best is None or t < best[0]:
                best = (t, usable, lm_iters, term)
        return best, times

    (t_1, _, _, _), t1s = timed(1)
    (t_n, usable, lm_iters, term), tns = timed(iters)
    noisy = t_n <= t_1
    per_tick = t_n / iters if noisy else (t_n - t_1) / (iters - 1)
    # Per-attempt per-tick estimates (against the best t_1): the attempt
    # spread IS the tunnel jitter, reported as tick p50/p90 (VERDICT r4
    # item 10).
    per_tick_attempts = [
        (t / iters if t <= t_1 else (t - t_1) / (iters - 1)) for t in tns
    ]
    return per_tick, t_1, t_n, noisy, usable, lm_iters, term, per_tick_attempts


def run_config(name, batch, iters, repeats, profile_dir=None, warm_start_mode=None,
               compaction=0.0):
    from nav2_social_mpc_controller_tpu.controller.controller import make_carry

    cfg = get_config(name, warm_start_mode)
    n_people = CONFIG_PEOPLE[name]
    log(f"[{name}] generating scenarios (batch {batch}, {n_people} people)...")
    scb, batch = make_batch(cfg, batch, n_people)
    carry0 = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(batch))
    log(f"[{name}] AOT compiling (dynamic tick count)...")
    exe, compile_s = compile_program(cfg, scb, carry0, compaction=compaction)
    log(f"[{name}] compiled in {compile_s:.1f}s; executing...")

    import contextlib

    prof = jax.profiler.trace(profile_dir) if profile_dir else contextlib.nullcontext()
    with prof:
        per_tick, t_1, t_n, noisy, usable, lm_iters, term, pt_attempts = measure(
            exe, scb, carry0, iters, repeats
        )
    result = {
        "metric": f"social_mpc_solves_per_s_per_chip_H{cfg.optimizer.control_horizon}_"
        f"{n_people}agents_{name}",
        "value": round(batch / per_tick, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(batch / per_tick / 1e4, 3),
        "batch": batch,
        "iters": iters,
        "batch_latency_ms": round(per_tick * 1000.0, 3),
        "per_solve_latency_us": round(per_tick / batch * 1e6, 3),
        "t_1_tick_s": round(t_1, 3),
        "t_n_ticks_s": round(t_n, 3),
        "noisy_timing_lower_bound": bool(noisy),
        "compile_s": round(compile_s, 1),
        "usable_frac": float(np.mean(np.asarray(usable))),
        "mean_lm_iters": float(np.mean(np.asarray(lm_iters))),
        # Tick-latency spread across attempts + lane split by termination
        # class (VERDICT r4 item 10): cap-bound lanes (termination 0 =
        # TERM_NO_CONVERGENCE) run to the iteration cap and set the batched
        # while-loop's E[max]; warm-start/compaction work should be judged
        # per population.
        "tick_ms_p50": round(float(np.percentile(pt_attempts, 50)) * 1e3, 3),
        "tick_ms_p90": round(float(np.percentile(pt_attempts, 90)) * 1e3, 3),
        "termination_split": _termination_split(term, lm_iters),
    }
    return result, (cfg, exe)


def _termination_split(term, lm_iters):
    term = np.asarray(term)
    it = np.asarray(lm_iters)
    capped = term == 0  # solver.lm.TERM_NO_CONVERGENCE
    out = {}
    for name, mask in (("converged", ~capped), ("cap_bound", capped)):
        if mask.any():
            out[name] = {
                "frac": round(float(np.mean(mask)), 4),
                "mean_iters": round(float(np.mean(it[mask])), 2),
            }
        else:
            out[name] = {"frac": 0.0, "mean_iters": None}
    return out


def run_latency_curve(name, batches, iters, repeats):
    """Per-tick latency at several batch sizes (VERDICT r1 item 5): the
    largest batch whose tick fits the reference's 50 ms / 20 Hz budget is the
    real-time capacity per chip; beyond it is throughput territory."""
    from nav2_social_mpc_controller_tpu.controller.controller import make_carry

    cfg = get_config(name)
    n_people = CONFIG_PEOPLE[name]
    curve = []
    for b in batches:
        scb, b_eff = make_batch(cfg, b, n_people)
        carry0 = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(b_eff))
        log(f"[curve] batch {b_eff}: compiling...")
        exe, compile_s = compile_program(cfg, scb, carry0)
        # Small batches: scale the tick count up so the measured t_n - t_1
        # difference clears the tunnel's ~+-3 ms run-to-run jitter (at
        # batch 256 a sub-ms tick x 4 ticks is pure noise otherwise).
        it = min(60, max(iters, iters * max(1, 1024 // max(b_eff, 1))))
        per_tick, t_1, t_n, noisy, usable, _i, _t, _p = measure(exe, scb, carry0, it, repeats)
        curve.append(
            {
                "batch": b_eff,
                "latency_ms": round(per_tick * 1000.0, 3),
                "solves_per_s": round(b_eff / per_tick, 1),
                "noisy": bool(noisy),
                "compile_s": round(compile_s, 1),
            }
        )
        log(f"[curve] batch {b_eff}: {per_tick * 1e3:.2f} ms/tick")
    return curve


def main():
    ap = argparse.ArgumentParser()
    # 1024 is the measured throughput sweet spot: per-solve cost grows with
    # batch once the iteration working set leaves VMEM, and every config's
    # tick fits the 50 ms / 20 Hz budget with >5x headroom. 4096 is the
    # largest curve point still inside the budget (BENCH_r04/r05
    # max_batch_within_50ms_20hz; see the latency curve).
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--config",
        choices=["social", "obstacle", "omni6", "stress36", "all"],
        default="all",
    )
    ap.add_argument(
        "--profile", metavar="DIR", default=None, help="capture a jax.profiler trace"
    )
    ap.add_argument("--repeats", type=int, default=3, help="min-of-k executions per program")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (pipeline debugging; numbers meaningless)")
    ap.add_argument(
        "--warm-start-mode",
        choices=["reference", "previous_solution"],
        default=None,
        help="override OptimizerConfig.warm_start_mode (the headline/default "
        "run keeps exact reference semantics; 'previous_solution' is the "
        "opt-in fast mode — see docs/performance.md warm-start economics)",
    )
    ap.add_argument(
        "--compaction", type=float, default=0.0, metavar="FRAC",
        help="converged-lane compaction capacity fraction for the solve "
        "(0 disables; see solver/batched.py)",
    )
    ap.add_argument(
        "--latency-batches",
        default="256,2048,4096",
        help="comma-separated batch sizes for the latency curve ('' disables; "
        "the --batch point is appended from the social config's own run)",
    )
    args = ap.parse_args()
    assert args.iters >= 2, "--iters must be >= 2"
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.config != "all":
        result, _ = run_config(
            args.config, args.batch, args.iters, args.repeats, args.profile,
            warm_start_mode=args.warm_start_mode, compaction=args.compaction,
        )
        result["platform"] = jax.devices()[0].platform
        print(json.dumps(result))
        return

    configs = {}
    for name in ["obstacle", "social", "omni6", "stress36"]:
        res, _ = run_config(name, args.batch, args.iters, args.repeats)
        configs[name] = res
        log(f"[{name}] {res['value']} solves/s/chip ({res['batch_latency_ms']} ms/tick)")

    # Opt-in fast mode, measured under the same protocol and reported as a
    # clearly-labeled EXTRA entry (never the headline: the headline keeps
    # exact reference warm-start semantics — docs/performance.md, warm-start
    # economics). previous_solution warm starts cut the batched LM loop's
    # E[max iters] ceiling from the 40-cap to ~15 on warm ticks.
    res_fast, _ = run_config(
        "social", args.batch, args.iters, args.repeats,
        warm_start_mode="previous_solution",
        compaction=args.compaction if args.compaction > 0 else 0.25,
    )
    res_fast["metric"] += "_warmstart_previous_solution_compacted"
    configs["social_fast_warmstart"] = res_fast
    log(f"[social fast-warmstart+compaction] {res_fast['value']} solves/s/chip "
        f"({res_fast['batch_latency_ms']} ms/tick, "
        f"mean iters {res_fast['mean_lm_iters']:.1f})")

    curve = []
    max_rt_batch = 0
    if args.latency_batches:
        batches = [
            int(b) for b in args.latency_batches.split(",") if b and int(b) != args.batch
        ]
        curve = run_latency_curve("social", batches, max(4, args.iters // 2), min(args.repeats, 2))
        # The social config's own run already measured latency at --batch.
        s = configs["social"]
        curve.append(
            {
                "batch": s["batch"],
                "latency_ms": s["batch_latency_ms"],
                "solves_per_s": s["value"],
                "noisy": s["noisy_timing_lower_bound"],
                "compile_s": s["compile_s"],
            }
        )
        curve.sort(key=lambda c: c["batch"])
        within = [c["batch"] for c in curve if c["latency_ms"] < 50.0]
        max_rt_batch = max(within) if within else 0

    head = configs["omni6"]
    result = {
        "metric": head["metric"],
        "value": head["value"],
        "unit": "solves/s/chip",
        "vs_baseline": head["vs_baseline"],
        "platform": jax.devices()[0].platform,
        "usable_frac": head["usable_frac"],
        "batch": head["batch"],
        "batch_latency_ms": head["batch_latency_ms"],
        "mean_lm_iters": head["mean_lm_iters"],
        "compile_s": head["compile_s"],
        "configs": configs,
        "latency_curve": curve,
        "max_batch_within_50ms_20hz": max_rt_batch,
    }
    # Full detail goes to a file; stdout's FINAL line is a compact headline the
    # driver can capture whole even if it keeps only the tail (the r02/r03
    # artifacts recorded parsed=null and lost the obstacle entry to tail
    # truncation — VERDICT r3 weak item 2).
    with open("bench_results.json", "w") as f:
        json.dump(result, f, indent=1)
    compact = {
        "metric": head["metric"],
        "value": head["value"],
        "unit": "solves/s/chip",
        "vs_baseline": head["vs_baseline"],
        "platform": result["platform"],
        "usable_frac": head["usable_frac"],
        "batch": head["batch"],
        "configs": {k: v["value"] for k, v in configs.items()},
        "max_batch_within_50ms_20hz": max_rt_batch,
        "detail": "bench_results.json",
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
