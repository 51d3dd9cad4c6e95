#!/usr/bin/env python
"""On-hardware cmd_vel parity: the f32 BATCHED jitted step on the ambient
backend (the real TPU under axon) vs the float64 NumPy oracle.

The BASELINE criterion — cmd_vel parity with Ceres within 1e-3 — is pinned
by the test suite ONLY on CPU in f64 (tests/test_parity_step.py): conftest
forces the CPU backend, and x64 is unavailable on TPU anyway. This tool
measures the production-precision gap on the chip itself, and since round 5
it drives ``make_step_batch`` (seeds of a config batched together) so the
measured path IS the production one: the fused critic kernel, the packed
split3 bicubic, the propose/commit trust-region kernels — none of which
engage on single-lane steps.

Protocol: per config, the robot is scripted along each seed's plan for
--ticks ticks (same _scripted_poses protocol as the parity tests); the
batched framework step runs all seeds at once (warm-start carries fed
back), the oracle runs per-seed in f64 on the host, and (v, w), status and
plan-prune cursor are compared per lane per tick.

Chaos-floor context for reading the numbers (CHAOS_FLOOR_r05.json,
tools/chaos_floor.py): representing the inputs in f32 AT ALL is a
~1e-7-scale perturbation that the 40-iteration nonconvex solve amplifies
to the same delta distribution this tool reports — the f32-vs-itself twin
study reproduces the within-1e-3 fraction of the f32-vs-f64 comparison.
Cap-bound lanes sit wherever iteration 40 left them; converged-lane
offenders root-cause to tolerance-stops on flat valleys, not basin
errors.

Arms:
  --fused-check    additionally run the identical TPU batch with
                   SOCIAL_MPC_DISABLE_FUSED=1 (pure-XLA linearize
                   pipeline) and record the TPU-fused vs TPU-linearize
                   delta distribution + status agreement (VERDICT r4
                   item 6 artifact).
  --ne-precision   highest|high: override the linearize path's
                   normal-equation precision (stress36 D=12 attribution,
                   VERDICT r4 item 4). Only meaningful with the linearize
                   path (set --disable-fused too).
  --disable-fused  run the main arm with the linearize pipeline.
  --cpu            force the CPU backend (still f32) for comparison.

Usage:
  python tools/parity_on_chip.py --seeds 10 --ticks 3 --json out.json
  python tools/parity_on_chip.py --configs stress36 --disable-fused \\
      --ne-precision highest --json stress36_highest.json
"""

import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--ticks", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--configs", default="social,obstacle,omni6,stress36")
    ap.add_argument("--fused-check", action="store_true")
    ap.add_argument("--disable-fused", action="store_true")
    ap.add_argument("--ne-precision", default=None, choices=[None, "highest", "high"])
    ap.add_argument("--json", default=None)
    ap.add_argument("--save-tpu", default=None, metavar="NPZ",
                    help="phase 1: run only the TPU batches, save results, exit "
                         "(keeps the chip claim window short; the oracle phase "
                         "takes ~45 min on host CPU)")
    ap.add_argument("--load-tpu", default=None, metavar="NPZ",
                    help="phase 2: load phase-1 results, run the oracle + "
                         "comparison on CPU only")
    args = ap.parse_args()

    if args.disable_fused:
        os.environ["SOCIAL_MPC_DISABLE_FUSED"] = "1"
    if args.ne_precision:
        os.environ["SOCIAL_MPC_NE_PRECISION"] = args.ne_precision

    import jax

    if args.cpu or args.load_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_obstacle_only_config,
        benchmark_omni_6agents_config,
        benchmark_social_config,
        benchmark_stress_h36_config,
    )
    from nav2_social_mpc_controller_tpu.core.types import RobotState
    from nav2_social_mpc_controller_tpu.controller.controller import (
        make_carry,
        make_step_batch,
    )
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario
    from nav2_social_mpc_controller_tpu.solver import lm
    from parity import oracle

    all_configs = {
        "social": (benchmark_social_config, 3),
        "obstacle": (benchmark_obstacle_only_config, 0),
        "omni6": (benchmark_omni_6agents_config, 6),
        "stress36": (benchmark_stress_h36_config, 3),
    }
    configs = {k: all_configs[k] for k in args.configs.split(",")}

    platform = jax.devices()[0].platform
    print(f"backend: {platform}  fused={'off' if args.disable_fused else 'on'}"
          f"  ne_precision={args.ne_precision or 'auto'}", file=sys.stderr)

    def scripted_poses(sc, n_ticks, stride=4):
        pts = np.asarray(sc.path.points, np.float64)
        yaw = np.asarray(sc.path.yaw, np.float64)
        n = int(sc.path.n)
        return [
            np.array([pts[i, 0], pts[i, 1], yaw[i]])
            for i in (min(t * stride, n - 1) for t in range(n_ticks))
        ]

    def to_f32(tree):
        return jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else jnp.asarray(x),
            tree,
        )

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    def run_tpu_batch(cfg, sc32_b, poses_per_seed, n_seeds):
        """Batched framework rollout; returns per (tick, seed) rows."""
        step_b = make_step_batch(cfg)
        carry = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(n_seeds))
        out = []
        for t in range(args.ticks):
            poses_t = jnp.asarray(
                np.stack([poses_per_seed[s][t] for s in range(n_seeds)]),
                jnp.float32,
            )
            sc_t = sc32_b._replace(
                robot=RobotState(pose=poses_t, speed=sc32_b.robot.speed)
            )
            cmd, aux, carry = step_b(sc_t, carry)
            out.append(
                dict(
                    v=np.asarray(cmd.linear_x, np.float64),
                    w=np.asarray(cmd.angular_z, np.float64),
                    status=np.asarray(aux.status),
                    prune=np.asarray(aux.plan_start_index),
                    iters=np.asarray(aux.solve.iterations),
                    capped=np.asarray(aux.solve.termination) == lm.TERM_NO_CONVERGENCE,
                )
            )
        return out

    import pickle

    device_results = {"__backend__": platform}
    if args.load_tpu:
        with open(args.load_tpu, "rb") as f:
            device_results = pickle.load(f)
        platform = device_results.get("__backend__", platform)

    rows = []
    fused_rows = []
    for name, (cfg_fn, n_people) in configs.items():
        cfg = cfg_fn()
        sc64s = [
            make_scenario(cfg, seed=s, n_valid_people=n_people, dtype=np.float64)
            for s in range(args.seeds)
        ]
        poses_per_seed = [scripted_poses(sc, args.ticks) for sc in sc64s]

        if args.load_tpu:
            tpu_out, alt_out = device_results[name]
        else:
            sc32_b = stack([to_f32(sc) for sc in sc64s])
            tpu_out = run_tpu_batch(cfg, sc32_b, poses_per_seed, args.seeds)
            alt_out = None
            if args.fused_check:
                os.environ["SOCIAL_MPC_DISABLE_FUSED"] = "1"
                try:
                    alt_out = run_tpu_batch(cfg, sc32_b, poses_per_seed, args.seeds)
                finally:
                    if not args.disable_fused:
                        os.environ.pop("SOCIAL_MPC_DISABLE_FUSED", None)
            device_results[name] = (tpu_out, alt_out)
            print(f"[{name}] device arms done", file=sys.stderr)
        if args.save_tpu:
            continue

        for s in range(args.seeds):
            sc64 = sc64s[s]
            plan_pts = [tuple(p) for p in np.asarray(sc64.path.points[: int(sc64.path.n)])]
            n0 = len(plan_pts)
            memory = {}
            cm = (np.asarray(sc64.costmap.data, np.float64),
                  np.asarray(sc64.costmap.origin, np.float64),
                  float(sc64.costmap.resolution))
            es = (np.asarray(sc64.esdf.distances, np.float64),
                  np.asarray(sc64.esdf.indexes),
                  np.asarray(sc64.esdf.origin, np.float64),
                  float(sc64.esdf.resolution), bool(sc64.esdf.valid))
            for t, pose in enumerate(poses_per_seed[s]):
                o_cmd, o_status, plan_pts = oracle.oracle_step(
                    cfg, plan_pts, pose, np.asarray(sc64.robot.speed, np.float64),
                    np.asarray(sc64.people.state, np.float64), cm, es, memory,
                )
                fr = tpu_out[t]
                rows.append(
                    dict(
                        config=name, seed=s, tick=t,
                        dv=abs(float(fr["v"][s]) - o_cmd[0]),
                        dw=abs(float(fr["w"][s]) - o_cmd[2]),
                        status_match=int(fr["status"][s]) == o_status,
                        prune_match=int(fr["prune"][s]) == n0 - len(plan_pts),
                        fw_iters=int(fr["iters"][s]),
                        capped=bool(fr["capped"][s]),
                        o_capped=bool(memory.get("last_solve_capped", False)),
                    )
                )
                if alt_out is not None:
                    ar = alt_out[t]
                    fused_rows.append(
                        dict(
                            config=name, seed=s, tick=t,
                            d=max(abs(float(fr["v"][s]) - float(ar["v"][s])),
                                  abs(float(fr["w"][s]) - float(ar["w"][s]))),
                            status_match=int(fr["status"][s]) == int(ar["status"][s]),
                            iters_delta=int(fr["iters"][s]) - int(ar["iters"][s]),
                            capped=bool(fr["capped"][s]) or bool(ar["capped"][s]),
                        )
                    )
        if not args.save_tpu:
            print(f"[{name}] {args.seeds * args.ticks} lanes compared", file=sys.stderr)

    if args.save_tpu:
        with open(args.save_tpu, "wb") as f:
            pickle.dump(device_results, f)
        print(f"saved device results -> {args.save_tpu}", file=sys.stderr)
        return

    def stats(sel):
        if not sel:
            return {}
        d = np.array([max(r["dv"], r["dw"]) for r in sel])
        return dict(
            n=len(sel),
            p50=float(np.percentile(d, 50)),
            p90=float(np.percentile(d, 90)),
            max=float(d.max()),
            within_1e3=float(np.mean(d <= 1e-3)),
        )

    out = {
        "backend": platform,
        "protocol": "batched make_step_batch (production kernels engaged)",
        "fused": not args.disable_fused,
        "ne_precision": args.ne_precision or "auto",
        "seeds": args.seeds,
        "ticks": args.ticks,
        "status_match_frac": float(np.mean([r["status_match"] for r in rows])),
        "prune_match_frac": float(np.mean([r["prune_match"] for r in rows])),
        "all": stats(rows),
        "converged_lanes": stats([r for r in rows if not r["capped"]]),
        "cap_bound_lanes": stats([r for r in rows if r["capped"]]),
        "per_config": {
            name: stats([r for r in rows if r["config"] == name]) for name in configs
        },
    }
    if fused_rows:
        fd = np.array([r["d"] for r in fused_rows])
        conv = np.array([not r["capped"] for r in fused_rows])
        out["fused_vs_linearize"] = {
            "status_match_frac": float(np.mean([r["status_match"] for r in fused_rows])),
            "iters_delta_mean": float(np.mean([r["iters_delta"] for r in fused_rows])),
            "all": dict(n=int(len(fd)), p50=float(np.percentile(fd, 50)),
                        p90=float(np.percentile(fd, 90)), max=float(fd.max()),
                        within_1e3=float(np.mean(fd <= 1e-3))),
            "converged": dict(
                n=int(conv.sum()),
                p50=float(np.percentile(fd[conv], 50)) if conv.any() else None,
                max=float(fd[conv].max()) if conv.any() else None,
            ),
        }
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
