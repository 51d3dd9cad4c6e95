"""Multi-host fake-cluster test: 2 coordinated processes x 4 virtual CPU
devices run the distributed step over a global batch mesh; cross-process
psum'd fleet metrics must count every scenario (SURVEY.md section 4d)."""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "").replace(
    "--xla_force_host_platform_device_count=8", ""
) + " --xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from nav2_social_mpc_controller_tpu.parallel import multihost
multihost.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * nproc

import jax.numpy as jnp, numpy as np
from nav2_social_mpc_controller_tpu.core.config import benchmark_social_config
from nav2_social_mpc_controller_tpu.controller.controller import make_carry
from nav2_social_mpc_controller_tpu.parallel.mesh import make_distributed_step
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario_batch

cfg = benchmark_social_config()
mesh = multihost.make_global_mesh()
local = 4  # one scenario per local device
# distinct scenarios per host
scb_local = make_scenario_batch(cfg, local, base_seed=100 * pid, n_valid_people=2, grid_hw=(64, 64))
carry_local = jax.vmap(lambda _: make_carry(cfg))(jnp.arange(local))
scb = multihost.host_local_to_global(mesh, scb_local)
carry = multihost.host_local_to_global(mesh, jax.tree.map(np.asarray, carry_local))

step = make_distributed_step(cfg, mesh)
cmd, aux, new_carry, metrics = step(scb, carry)
n = int(metrics.n_scenarios)
ok = int(metrics.n_usable)
assert n == 8, f"expected 8 global scenarios, got {n}"
assert ok == 8, f"expected 8 usable, got {ok}"
print(f"proc {pid} OK n={n}", flush=True)
"""


def test_two_process_fake_cluster(tmp_path):
    from nav2_social_mpc_controller_tpu.runtime.campaign import find_free_port

    port = str(find_free_port())
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        script = tmp_path / f"worker{pid}.py"
        script.write_text(WORKER)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(pid), "2", port],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK n=8" in out
