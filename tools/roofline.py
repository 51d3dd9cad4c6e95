#!/usr/bin/env python
"""Whole-tick roofline / MFU accounting (VERDICT r2 item 1).

Answers "how far from the hardware ceiling is the tick?" with three
ingredients, all measured on the CURRENT backend:

1. CALIBRATED ceilings — microbenchmarks measure this chip's achievable
   bf16-MXU flops/s, f32-VPU flops/s, and HBM stream bandwidth (nominal v5e
   datasheet peaks: 197 Tbf16-FLOP/s, ~820 GB/s; the calibration numbers are
   what a kernel can actually reach and are the honest denominators).
2. XLA's own per-executable cost model — compiled.cost_analysis() gives
   exact HLO flop and byte counts per stage program (no hand-counted flops).
3. Measured wall time per stage — the profile_stages protocol (AOT-compiled
   stage programs, fetch-fenced, min-of-k).

Per stage this yields: measured time, flop/byte counts, the roofline bound
  t_bound = max(bytes / BW_meas, flops / FLOPS_meas)
(taking the VPU ceiling for scalar-heavy stages and the MXU ceiling for the
dot-dominated ones is reported as both utilizations; the bound uses the
stage's dominant unit), and headroom = measured / t_bound.

Output: a ranked table + one JSON line. docs/performance.md holds the
interpretation; tools/bench_bicubic.py holds the kernel-local deep dive.

Usage:
  python tools/roofline.py --config social --batch 1024
  python tools/roofline.py --calibrate-only
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_exe(exe, args, repeats=3):
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = exe(*args)
        # Fetch fence: bench.py found block_until_ready can return early over
        # the axon tunnel; fetching a scalar cannot.
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0] if leaf.ndim else leaf)
        best = min(best, time.perf_counter() - t0)
    return best


def _bench_loop(fn, args, iters=50, repeats=3):
    """Time fn in an in-graph fori_loop (amortizes dispatch)."""

    @jax.jit
    def loop(*args):
        def body(i, acc):
            out = fn(*args, i)
            return acc + out

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(loop(*args))  # compile + warm
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def calibrate(repeats=3):
    """Measure achievable ceilings on this chip."""
    peaks = {}
    # MXU bf16: big square matmul, iteration-dependent so nothing hoists.
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    def mm(a, b, i):
        out = jnp.dot(a + i.astype(jnp.bfloat16) * 0, b, preferred_element_type=jnp.float32)
        return out[0, 0]

    t = _bench_loop(mm, (a, b), iters=20, repeats=repeats)
    peaks["mxu_bf16_flops"] = 2.0 * n * n * n / t

    # MXU f32 (default-precision f32 matmul path)
    af = jnp.ones((n, n), jnp.float32)
    t = _bench_loop(lambda a, b, i: jnp.dot(a + i * 0.0, b)[0, 0], (af, af), iters=10, repeats=repeats)
    peaks["mxu_f32_flops"] = 2.0 * n * n * n / t

    # VPU f32: a chained NONLINEAR map on a VMEM-resident tile. An affine
    # chain (y = y*a + b) algebraically collapses in XLA's simplifier and
    # reads as an impossible peak; the Newton-for-reciprocal map y*(2 - y)
    # (2 flops/element/step, converges stably to 1) cannot fold.
    m = (512, 512)
    x = jnp.full(m, 1.0000001, jnp.float32)
    k_steps = 32

    def vpu(x, i):
        y = x + i * 1e-9
        for _ in range(k_steps):
            y = y * (2.0 - y)
        return y[0, 0]

    t = _bench_loop(vpu, (x,), iters=200, repeats=repeats)
    peaks["vpu_f32_flops"] = (2.0 * k_steps + 2.0) * m[0] * m[1] / t

    # HBM stream: y = x * s reads+writes 2 * size bytes, array >> VMEM.
    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB

    def stream(x, i):
        return (x * (1.0 + i * 1e-9)).sum() * 0.0 + x[0]

    # sum() re-reads; use a store instead: scale into output
    @jax.jit
    def scale(x, s):
        return x * s

    np.asarray(scale(big, 1.0)[0])
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(scale(big, 1.000001)[0])
        best = min(best, time.perf_counter() - t0)
    peaks["hbm_stream_bytes"] = 2.0 * big.size * 4 / best
    return peaks


def _cost(compiled):
    ca = compiled.cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(d.get("flops", 0.0)), float(d.get("bytes accessed", 0.0))


def stage_programs(cfg, scb, carry, batch):
    """(name, fn, args, unit) per pipeline stage; unit selects the flop
    ceiling for the bound ('vpu' or 'mxu')."""
    from nav2_social_mpc_controller_tpu.controller import optimize as opt
    from nav2_social_mpc_controller_tpu.controller.controller import step
    from nav2_social_mpc_controller_tpu.controller.trajectorizer import trajectorize
    from nav2_social_mpc_controller_tpu.models.sfm import project_people
    from nav2_social_mpc_controller_tpu.solver.lm import LMConfig, lm_solve

    dims = opt.ProblemDims.from_config(cfg)

    def s_traj(scb):
        return jax.vmap(functools.partial(trajectorize, cfg.trajectorizer))(
            scb.path, scb.robot.pose
        )

    traj = jax.jit(s_traj)(scb)

    def s_format(scb, traj, carry):
        return jax.vmap(functools.partial(opt.format_to_optimize, cfg, dims))(
            traj.poses, traj.cmds, traj.n_steps, scb.robot.speed, carry
        )

    rows_n = jax.jit(s_format)(scb, traj, carry)

    def s_proj(scb, rows_n):
        rows, n_rows = rows_n

        def one(people, rows, n_rows, esdf):
            return project_people(
                people, rows, n_rows, esdf.distances, esdf.indexes, esdf.origin,
                esdf.resolution, esdf.valid,
                maxtime=cfg.trajectorizer.max_time, dt=cfg.trajectorizer.time_step,
                esdf_window=cfg.esdf_window_cells,
            )

        return jax.vmap(one)(scb.people.state, rows, n_rows, scb.esdf)

    proj = jax.jit(s_proj)(scb, rows_n)

    def s_resid(scb, rows_n, proj):
        rows, n_rows = rows_n

        def one(rows, n_rows, proj, costmap):
            rfn = opt.build_residual_fn(
                cfg, dims, rows, n_rows, proj, jnp.asarray(True), costmap
            )
            u0 = rows[0 : dims.n_blocks, 4:6].reshape(-1)
            y, f_lin = jax.linearize(rfn, u0)
            j = jax.vmap(f_lin)(jnp.eye(u0.shape[0], dtype=u0.dtype))
            return y, j

        return jax.vmap(one)(rows, n_rows, proj, scb.costmap)

    def s_solve(scb, rows_n, proj):
        rows, n_rows = rows_n
        o = cfg.optimizer
        lm_cfg = LMConfig(o.max_iterations, o.fn_tol, o.gradient_tol, o.param_tol)

        def one(rows, n_rows, proj, costmap):
            rfn = opt.build_residual_fn(cfg, dims, rows, n_rows, proj, jnp.asarray(True), costmap)
            u0 = rows[0 : dims.n_blocks, 4:6].reshape(-1)
            lo = jnp.full((dims.n_blocks * 2,), -1e9, rows.dtype)
            hi = jnp.full((dims.n_blocks * 2,), 1e9, rows.dtype)
            return lm_solve(rfn, u0, lo, hi, lm_cfg)

        return jax.vmap(one)(rows, n_rows, proj, scb.costmap)

    def s_step(scb, carry):
        return jax.vmap(functools.partial(step, cfg))(scb, carry)

    return [
        ("trajectorize", s_traj, (scb,), "vpu"),
        ("format_blend", s_format, (scb, traj, carry), "vpu"),
        ("project_people", s_proj, (scb, rows_n), "vpu"),
        ("residual+jacobian_x1", s_resid, (scb, rows_n, proj), "mxu"),
        ("lm_solve_full", s_solve, (scb, rows_n, proj), "mxu"),
        ("full_tick", s_step, (scb, carry), "mxu"),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="social",
                    choices=["social", "obstacle", "omni6", "stress36"])
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--calibrate-only", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    log("calibrating ceilings...")
    peaks = calibrate(repeats=args.repeats)
    for k, v in peaks.items():
        unit = "GB/s" if "bytes" in k else "GFLOP/s"
        log(f"  {k:22s} {v/1e9:12.1f} {unit}")
    if args.calibrate_only:
        print(json.dumps(peaks))
        return

    sys.path.insert(0, ".")
    from bench import CONFIG_PEOPLE, get_config, make_batch
    from nav2_social_mpc_controller_tpu.controller.controller import make_carry

    cfg = get_config(args.config)
    scb, batch = make_batch(cfg, args.batch, CONFIG_PEOPLE[args.config])
    carry = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(batch))

    rows = []
    mean_iters = None
    for name, fn, fargs, unit in stage_programs(cfg, scb, carry, batch):
        exe = jax.jit(fn).lower(*fargs).compile()
        flops, bytes_ = _cost(exe)
        t = _time_exe(exe, fargs, repeats=args.repeats)
        if name == "lm_solve_full":
            out = exe(*fargs)
            mean_iters = float(np.mean(np.asarray(out[1].iterations)))
        flop_peak = peaks["mxu_bf16_flops"] if unit == "mxu" else peaks["vpu_f32_flops"]
        t_flops = flops / flop_peak
        t_bw = bytes_ / peaks["hbm_stream_bytes"]
        t_bound = max(t_flops, t_bw)
        rows.append(
            dict(
                stage=name,
                measured_ms=t * 1e3,
                flops=flops,
                bytes=bytes_,
                bound_ms=t_bound * 1e3,
                bound_kind="flops" if t_flops >= t_bw else "bandwidth",
                headroom=t / max(t_bound, 1e-12),
                mfu=flops / (t * peaks["mxu_bf16_flops"]),
                vpu_util=flops / (t * peaks["vpu_f32_flops"]),
                bw_util=bytes_ / (t * peaks["hbm_stream_bytes"]),
            )
        )
        log(f"  {name:22s} {t*1e3:9.2f} ms  ({flops/1e9:.2f} GFLOP, {bytes_/1e6:.1f} MB)")

    print(f"\n=== roofline ({args.config}, batch {batch}, "
          f"{jax.devices()[0].platform}) ===")
    print(f"{'stage':22s} {'meas ms':>9} {'bound ms':>9} {'headroom':>9} "
          f"{'bound':>10} {'MFU%':>6} {'VPU%':>6} {'BW%':>6}")
    for r in rows:
        print(f"{r['stage']:22s} {r['measured_ms']:9.2f} {r['bound_ms']:9.3f} "
              f"{r['headroom']:8.1f}x {r['bound_kind']:>10} "
              f"{100*r['mfu']:6.2f} {100*r['vpu_util']:6.1f} {100*r['bw_util']:6.1f}")

    full = rows[-1]
    out = {
        "config": args.config,
        "batch": batch,
        "platform": jax.devices()[0].platform,
        "peaks": peaks,
        "stages": rows,
        "mean_lm_iters": mean_iters,
        "headline": {
            "tick_ms": full["measured_ms"],
            "tick_headroom_vs_bound": full["headroom"],
            "tick_mfu": full["mfu"],
            "tick_vpu_util": full["vpu_util"],
            "tick_bw_util": full["bw_util"],
        },
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out["headline"]))


if __name__ == "__main__":
    main()
