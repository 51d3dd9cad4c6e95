"""Streaming-runtime tests: latest-value semantics and the fixed-rate
controller loop driving the jitted step from sensor caches."""

import threading
import time

import numpy as np

from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.controller.controller import make_carry, make_step
from nav2_social_mpc_controller_tpu.runtime.stream import ControllerLoop, LatestValueCache
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario


def test_latest_value_cache_overwrites():
    c = LatestValueCache()
    v, age = c.get()
    assert v is None and age is None
    c.put(1)
    c.put(2)
    v, age = c.get()
    assert v == 2 and age >= 0.0


def test_latest_value_cache_thread_race():
    c = LatestValueCache(0)
    stop = threading.Event()

    def writer():
        i = 0
        while not stop.is_set():
            i += 1
            c.put(i)

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    seen = [c.get()[0] for _ in range(2000)]
    stop.set()
    t.join(2)
    assert all(b >= a for a, b in zip(seen, seen[1:])), "monotone latest-value reads"


def test_controller_loop_ticks_and_skips():
    cfg = benchmark_social_config()
    sc = make_scenario(cfg, seed=0, n_valid_people=2, grid_hw=(64, 64))
    step = make_step(cfg)
    cmd0, aux0, carry0 = step(sc, make_carry(cfg))  # pre-compile

    people_cache = LatestValueCache(sc.people)
    cmds = []
    n_calls = [0]

    def scenario_fn():
        n_calls[0] += 1
        if n_calls[0] % 3 == 0:
            return None  # simulated sensor dropout -> skipped tick
        people, _ = people_cache.get()
        return sc._replace(people=people)

    loop = ControllerLoop(
        step,
        make_carry(cfg),
        scenario_fn,
        lambda cmd, aux: cmds.append(float(cmd.linear_x)),
        frequency_hz=50.0,
    ).start()
    time.sleep(1.0)
    loop.stop()

    assert loop.ticks >= 5, f"expected >= 5 ticks, got {loop.ticks}"
    assert loop.missed >= 1
    assert len(cmds) == loop.ticks
    assert all(np.isfinite(c) for c in cmds)
    # carry advanced (warm-start memory populated)
    assert int(loop.carry.prev_n) >= 2
