#!/usr/bin/env python
"""Slope-protocol timing of the fused LM-iteration kernel: N chained kernel
calls inside ONE executable, per-call cost = (t_N - t_2)/(N - 2) — the axon
tunnel's ~8-10 ms per-executable dispatch floor cancels (same protocol as
bench.py / tools/roofline.py; a naive per-call loop measures ONLY that
floor).

Two-stage for wedge safety: `--prep out.npz` builds synthetic operands on
CPU and exits (no TPU claim); the default mode loads them and touches the
TPU only for one bounded compile+measure, so the process always finishes
well inside its timeout (a timeout-killed TPU process wedges the tunnel
for hours).

  python tools/fused_kernel_slope.py --prep /tmp/fk.npz --batch 1024
  python tools/fused_kernel_slope.py --inputs /tmp/fk.npz
"""

import argparse
import sys
import time

import numpy as np


def build_inputs(batch, config):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    from nav2_social_mpc_controller_tpu.controller.optimize import ProblemDims
    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_social_config,
        benchmark_stress_h36_config,
    )

    cfg = {"social": benchmark_social_config, "stress36": benchmark_stress_h36_config}[
        config
    ]()
    dims = ProblemDims.from_config(cfg)
    s, nb = dims.s, dims.n_blocks
    d = 2 * nb
    n = cfg.n_agents
    rng = np.random.default_rng(0)
    b = batch

    def r(*shape, lo=-1.0, hi=1.0):
        return rng.uniform(lo, hi, shape).astype(np.float32)

    dp = -(-d // 8) * 8
    arrs = dict(
        u_t=r(dp, b, lo=-0.5, hi=0.5),
        px=r(s, b), py=r(s, b), pth=r(s, b, lo=-3, hi=3),
        v=r(s, b, lo=0, hi=0.6),
        dxdv=r(nb, s, b), dydv=r(nb, s, b), dxdw=r(nb, s, b), dydw=r(nb, s, b),
        dth=r(nb, s, b), eb=(rng.uniform(0, 1, (nb, s, b)) > 0.5).astype(np.float32),
        val=r(s, b, lo=0, hi=254), drow=r(s, b), dcol=r(s, b),
        agents=r(n * 6, s, b),
        m_step=np.ones((s, b), np.float32), m_vel=np.ones((s, b), np.float32),
        m_social=np.ones((s, b), np.float32),
        active=(rng.uniform(0, 1, (s, b)) > 0.5).astype(np.float32),
        steer=r(s, b, lo=-3, hi=3), refx=r(s, b), refy=r(s, b),
        scal=r(8, b), vfm=np.ones((8, b), np.float32),
    )
    meta = dict(config=config, d=d, nb=nb, n_vf=dims.n_vf, n=n)
    return cfg, meta, arrs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prep", default=None, metavar="NPZ")
    ap.add_argument("--inputs", default=None, metavar="NPZ")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--config", default="social")
    ap.add_argument("--n-iters", type=int, default=22)
    args = ap.parse_args()

    if args.prep:
        _, meta, arrs = build_inputs(args.batch, args.config)
        np.savez(args.prep, **arrs, **{f"meta_{k}": v for k, v in meta.items()})
        print(f"wrote {args.prep}", file=sys.stderr)
        return

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from nav2_social_mpc_controller_tpu.core.config import (
        benchmark_social_config,
        benchmark_stress_h36_config,
    )
    from nav2_social_mpc_controller_tpu.ops import fused_iter as fi

    z = np.load(args.inputs)
    config = str(z["meta_config"])
    cfg = {"social": benchmark_social_config, "stress36": benchmark_stress_h36_config}[
        config
    ]()
    d = int(z["meta_d"])
    nb = int(z["meta_nb"])
    n_vf = int(z["meta_n_vf"])
    n = int(z["meta_n"])
    names = ["u_t", "px", "py", "pth", "v", "dxdv", "dydv", "dxdw", "dydw",
             "dth", "eb", "val", "drow", "dcol", "agents", "m_step", "m_vel",
             "m_social", "active", "steer", "refx", "refy", "scal", "vfm"]
    arrs = [jnp.asarray(z[k]) for k in names]
    statics = (d, nb, n_vf, n, cfg.optimizer.weights,
               cfg.optimizer.desired_linear_vel, 0.25)

    @jax.jit
    def chain(n_calls, *a):
        u0 = a[0]

        def body(i, carry):
            u_t, acc = carry
            cost, g, jtj = fi.fused_cost_g_jtj(statics, u_t, *a[1:])
            # Feed outputs back so no call is dead/hoistable.
            u_t2 = u_t + 1e-12 * (g.T[:, :].sum(axis=0)[None, :] + cost[None, :])
            return (u_t2.astype(u_t.dtype)[: u_t.shape[0]], acc + cost[0])

        (_, acc) = jax.lax.fori_loop(0, n_calls, body, (u0, jnp.zeros((), jnp.float32)))
        return acc

    print(f"backend={jax.devices()[0].platform}", file=sys.stderr)
    t0 = time.perf_counter()
    exe = chain.lower(jnp.int32(2), *arrs).compile()
    print(f"compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def run(k):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = exe(np.int32(k), *arrs)
            np.asarray(out)
            t = time.perf_counter() - t0
            best = t if best is None or t < best else best
        return best

    t2 = run(2)
    tn = run(args.n_iters)
    per = (tn - t2) / (args.n_iters - 2)
    b = z["px"].shape[1]
    print(f"t2={t2*1e3:.2f} ms  t{args.n_iters}={tn*1e3:.2f} ms  "
          f"per-kernel-call {per*1e6:.1f} us at B={b} "
          f"({per/b*1e9:.1f} ns/lane)")


if __name__ == "__main__":
    main()
