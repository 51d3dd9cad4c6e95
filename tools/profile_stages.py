#!/usr/bin/env python
"""Stage-level timing of the controller tick on the current backend.

AOT-compiles each pipeline stage as its own program and times first
executions with a fetch fence (see bench.py for why), batch-sized like the
benchmark. Prints one line per stage. Run on TPU (ambient env) or CPU
(JAX_PLATFORMS unset + jax.config).
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, repeats=2):
    exe = jax.jit(fn).lower(*args).compile()
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = exe(*args)
        jax.tree.map(lambda x: np.asarray(x[..., 0]) if hasattr(x, "shape") and x.ndim else np.asarray(x), out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:32s} {best*1e3:10.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--config", default="social")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_social_config,
        benchmark_stress_h36_config,
    )
    from nav2_social_mpc_controller_tpu.controller import optimize as opt
    from nav2_social_mpc_controller_tpu.controller.controller import fov_filter, make_carry, step
    from nav2_social_mpc_controller_tpu.controller.trajectorizer import trajectorize
    from nav2_social_mpc_controller_tpu.models.sfm import project_people
    from nav2_social_mpc_controller_tpu.solver.lm import LMConfig, lm_solve
    from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch

    cfg = {"social": benchmark_social_config, "stress36": benchmark_stress_h36_config}[args.config]()
    dims = opt.ProblemDims.from_config(cfg)
    base = min(64, args.batch)
    scb_h = make_scenario_batch(cfg, base, n_valid_people=3)
    reps = max(1, args.batch // base)
    scb = jax.tree.map(lambda x: jnp.tile(jnp.asarray(x), (reps,) + (1,) * (x.ndim - 1)), scb_h)
    batch = base * reps
    carry = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(batch))
    log(f"batch {batch}, platform {jax.devices()[0].platform}")

    rp = args.repeats

    # stage 1: trajectorize
    def s_traj(scb):
        return jax.vmap(functools.partial(trajectorize, cfg.trajectorizer))(scb.path, scb.robot.pose)

    traj = timed("trajectorize", s_traj, scb, repeats=rp)

    # stage 2: format
    def s_format(scb, traj, carry):
        return jax.vmap(functools.partial(opt.format_to_optimize, cfg, dims))(
            traj.poses, traj.cmds, traj.n_steps, scb.robot.speed, carry
        )

    rows_n = timed("format_to_optimize", s_format, scb, traj, carry, repeats=rp)

    # stage 3: projection
    def s_proj(scb, rows_n):
        rows, n_rows = rows_n

        def one(people, rows, n_rows, esdf):
            return project_people(
                people, rows, n_rows, esdf.distances, esdf.indexes, esdf.origin,
                esdf.resolution, esdf.valid,
                maxtime=cfg.trajectorizer.max_time, dt=cfg.trajectorizer.time_step,
            )

        return jax.vmap(one)(scb.people.state, rows, n_rows, scb.esdf)

    proj = timed("project_people", s_proj, scb, rows_n, repeats=rp)

    # stage 4: one residual + jacobian evaluation
    def s_resid(scb, rows_n, proj):
        rows, n_rows = rows_n

        def one(rows, n_rows, proj, costmap):
            rfn = opt.build_residual_fn(
                cfg, dims, rows, n_rows, proj, jnp.asarray(True), costmap
            )
            u0 = rows[0 : dims.n_blocks, 4:6].reshape(-1)
            r = rfn(u0)
            j = jax.jacfwd(rfn)(u0)
            return r, j

        return jax.vmap(one)(rows, n_rows, proj, scb.costmap)

    timed("residual + jacfwd (x1)", s_resid, scb, rows_n, proj, repeats=rp)

    # stage 5: full LM solve
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

    timed(f"lm_solve ({cfg.optimizer.max_iterations} it max)", s_solve, scb, rows_n, proj, repeats=rp)

    # stage 6: whole tick
    def s_step(scb, carry):
        return jax.vmap(functools.partial(step, cfg))(scb, carry)

    timed("full step", s_step, scb, carry, repeats=rp)


if __name__ == "__main__":
    main()
