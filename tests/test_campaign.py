"""Multi-host campaign runner e2e (BASELINE config 5 entry point): a 2-process
x 2-virtual-device fake cluster runs a multi-tick campaign with carry
checkpointing, then resumes from the snapshot."""

import json
import os
import subprocess
import sys

def _run_campaign(tmp_path, extra):
    from nav2_social_mpc_controller_tpu.runtime.campaign import find_free_port

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable,
        "-m",
        "nav2_social_mpc_controller_tpu",
        "multihost",
        "--processes", "2",
        "--devices-per-process", "2",
        "--per-device-batch", "2",
        "--people", "2",
        "--port", str(find_free_port()),
        "--checkpoint", str(tmp_path / "carry"),
    ] + extra
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=repo_root, timeout=540
    )
    assert proc.returncode == 0, f"campaign failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_fake_cluster_campaign_and_resume(tmp_path):
    s1 = _run_campaign(tmp_path, ["--ticks", "2", "--checkpoint-every", "1"])
    assert s1["processes"] == 2
    assert s1["devices"] == 4
    assert s1["global_batch"] == 8
    assert s1["ticks"] == 2
    assert s1["n_scenarios"] == 8
    assert s1["n_usable"] == 8
    # Per-process host-local snapshots + tick metadata exist.
    for pid in range(2):
        assert os.path.exists(str(tmp_path / f"carry.proc{pid}.meta.json"))

    s2 = _run_campaign(tmp_path, ["--ticks", "3", "--resume"])
    assert s2["resumed_from_tick"] == 2
    assert s2["ticks"] == 1  # only the remaining tick runs
    assert s2["n_usable"] == 8
