#!/usr/bin/env python
"""Fake-cluster sharding-overhead curve (VERDICT r3 item 10).

Real multi-chip hardware is unavailable here, so this measures the thing
the virtual mesh CAN measure: sharding/collective OVERHEAD. Protocol:
FIXED GLOBAL batch split across N virtual CPU devices on the same fixed
physical cores — total work is constant, so perfect sharding is CONSTANT
tick time at every N; any slowdown vs the 1-device point is
mesh/shard_map/psum overhead plus virtual-device thread contention (an
upper bound on what a real slice would pay, since real chips do not share
cores). A fixed per-DEVICE batch (true weak scaling) was measured first
and rejected: growing total work on fixed cores confounds the curve with
XLA:CPU thread-pool partitioning.

Per point, a subprocess runs the single-process campaign twice (short and
long tick counts); per-tick cost is the difference, cancelling compile and
setup. Results land in WEAK_SCALING_r04.json.

  python tools/weak_scaling.py --devices 1,2,4,8 --global-batch 512
"""

import argparse
import json
import os
import subprocess
import sys


def run_point(n_devices, global_batch, ticks, config, people, repeats=3,
              control=False):
    """One curve point. control=True measures the SHAPE-IDENTICAL control:
    the same per-device program (batch global_batch/n_devices) on a 1-device
    mesh — n_devices of those back-to-back is the zero-overhead reference
    for the meshed run, cancelling XLA:CPU's batch-shape-dependent
    vectorization (the r04/r05 confound: a 256-wide program is up to ~30%
    faster PER SCENARIO than a 512-wide one on this host, which made raw
    efficiency-vs-1dev read superlinear at some N and sub-linear at
    others)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    mesh_devices = 1 if control else n_devices
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={mesh_devices}")
    env["XLA_FLAGS"] = " ".join(flags)

    per_device_batch = global_batch // n_devices
    # The control runs n_devices x the ticks so total WORK matches the
    # meshed run tick-for-tick (sequential execution of the same shards).
    tick_scale = n_devices if control else 1

    def campaign(t):
        cmd = [
            sys.executable, "-m", "nav2_social_mpc_controller_tpu", "multihost",
            "--force-cpu", "--config", config, "--ticks", str(t),
            "--per-device-batch", str(per_device_batch), "--people", str(people),
        ]
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=1200, cwd=repo_root
        )
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
        return json.loads(out.stdout.strip().splitlines()[-1])

    # Min-of-R short/long pairs (VERDICT r4 item 8): a single pair is at the
    # mercy of host scheduling jitter on the shared cores — the r04 curve's
    # 8-device point read a nonsensical 1.175 efficiency purely because the
    # 1-device baseline caught a slow run. The minimum is the least-contended
    # estimate of the true per-tick cost on every point, baseline included.
    per_tick = None
    long = None
    for _ in range(repeats):
        short_r = campaign(2 * tick_scale)
        long_r = campaign((2 + ticks) * tick_scale)
        pt = (long_r["elapsed_s"] - short_r["elapsed_s"]) / (ticks * tick_scale)
        if per_tick is None or pt < per_tick:
            per_tick = pt
            long = long_r
    if control:
        # Equal-work normalization: n_devices sequential shard ticks == one
        # meshed tick.
        return {"seq_equal_work_tick_s": round(per_tick * n_devices, 4)}
    total = long["global_batch"] / per_tick
    return {
        "devices": n_devices,
        "global_batch": long["global_batch"],
        "per_tick_s": round(per_tick, 4),
        "total_solves_per_s": round(total, 1),
        "per_device_solves_per_s": round(total / n_devices, 1),
        "usable_frac": long["n_usable"] / max(long["n_scenarios"], 1),
        "repeats": repeats,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--global-batch", type=int, default=512)
    ap.add_argument("--ticks", type=int, default=10)
    ap.add_argument("--config", default="social")
    ap.add_argument("--people", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3,
                    help="min-of-R short/long pairs per point")
    ap.add_argument("--json", default="WEAK_SCALING_r05.json")
    args = ap.parse_args()

    rows = []
    for n in (int(x) for x in args.devices.split(",")):
        r = run_point(n, args.global_batch, args.ticks, args.config, args.people,
                      repeats=args.repeats)
        if n > 1:
            c = run_point(n, args.global_batch, args.ticks, args.config,
                          args.people, repeats=args.repeats, control=True)
            r.update(c)
            r["efficiency_shape_controlled"] = round(
                r["seq_equal_work_tick_s"] / r["per_tick_s"], 3
            )
        else:
            r["seq_equal_work_tick_s"] = r["per_tick_s"]
            r["efficiency_shape_controlled"] = 1.0
        rows.append(r)
        print(json.dumps(r), file=sys.stderr)

    base = rows[0]["total_solves_per_s"]
    for r in rows:
        r["efficiency_vs_1dev"] = round(r["total_solves_per_s"] / base, 3)
    out = {
        "protocol": "fixed GLOBAL batch split across N virtual devices on fixed "
        "physical cores. efficiency_shape_controlled divides each meshed "
        "tick by its SHAPE-IDENTICAL sequential control (the same "
        "per-device program on a 1-device mesh, N x the ticks): XLA:CPU's "
        "batch-shape-dependent vectorization (up to ~30%/program on this "
        "host) cancels exactly, so the ratio isolates mesh/shard_map/psum "
        "overhead. efficiency_vs_1dev (raw, shape-confounded) is kept for "
        "comparison with the r04 artifact. min-of-R pairs per point.",
        "global_batch": args.global_batch,
        "config": args.config,
        "points": rows,
    }
    print(json.dumps(out, indent=1))
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
