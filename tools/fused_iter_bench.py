#!/usr/bin/env python
"""Standalone timing of the fused LM-iteration value_grad vs the reference
linearize path, one call each (no while loop), on the ambient backend.

  python tools/fused_iter_bench.py --batch 1024 --config social --iters 30
"""

import argparse
import functools
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--config", default="social",
                    choices=["social", "obstacle", "omni6", "stress36"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--stages", default=None,
                    help="comma list to restrict kernel stages (bisect tool)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    if args.stages is not None:
        from nav2_social_mpc_controller_tpu.ops import fused_iter as _fi
        _fi._STAGES = frozenset(args.stages.split(",")) if args.stages else frozenset()
    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_obstacle_only_config,
        benchmark_omni_6agents_config,
        benchmark_social_config,
        benchmark_stress_h36_config,
    )
    from nav2_social_mpc_controller_tpu.ops.fused_iter import (
        _fused_batched,
        _ref_value_grad,
    )
    from tests.test_fused_iter import _batch_problem

    cfg_fn = {
        "social": benchmark_social_config,
        "obstacle": benchmark_obstacle_only_config,
        "omni6": benchmark_omni_6agents_config,
        "stress36": benchmark_stress_h36_config,
    }[args.config]
    n_people = {"social": 3, "obstacle": 0, "omni6": 6, "stress36": 3}[args.config]

    base = 16
    cfg, dims, bt = _batch_problem(cfg_fn, n_people, seeds=range(base))
    reps = max(1, args.batch // base)
    tile = lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))
    args_b = tuple(
        tile(bt[k]) for k in ("u", "rows", "n_rows", "proj", "present", "cmd", "cmo", "cmr")
    )
    b = args_b[0].shape[0]
    print(f"backend={jax.devices()[0].platform} batch={b}", file=sys.stderr)

    def timed(name, fn):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args_b))
        compile_s = time.perf_counter() - t0
        for _ in range(3):
            out = fn(*args_b)
        np.asarray(out[0][0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*args_b)
        np.asarray(out[0][0])
        per = (time.perf_counter() - t0) / args.iters
        print(f"{name}: compile {compile_s:.1f}s, per-call {per * 1e6:.0f} us "
              f"({per / b * 1e9:.1f} ns/lane)")
        return out

    out_f = timed("fused ", jax.jit(functools.partial(_fused_batched, cfg, dims)))
    if not args.skip_ref:
        out_r = timed(
            "linearize",
            jax.jit(jax.vmap(functools.partial(_ref_value_grad, cfg, dims))),
        )
        c_f, c_r = np.asarray(out_f[0]), np.asarray(out_r[0])
        print(f"cost rel delta max: {np.max(np.abs(c_f - c_r) / np.maximum(np.abs(c_r), 1e-9)):.2e}")


if __name__ == "__main__":
    main()
