"""CLI surface tests: every subcommand runs end-to-end in-process and emits
valid JSON (the runtime surface the reference delegates to ROS 2 tooling)."""

import json

import pytest

from nav2_social_mpc_controller_tpu.__main__ import main


def _run(capsys, argv):
    main(argv)
    return json.loads(capsys.readouterr().out)


def test_cli_config(capsys):
    cfg = _run(capsys, ["config", "--config", "social"])
    assert cfg["optimizer"]["control_horizon"] == 18
    assert cfg["optimizer"]["weights"]["social_weight"] == 120.0


def test_cli_config_yaml(tmp_path, capsys):
    y = tmp_path / "p.yaml"
    y.write_text(
        "FollowPath:\n  optimizer:\n    control_horizon: 12\n"
        "    parameter_block_length: 4\n"
    )
    cfg = _run(capsys, ["config", "--yaml", str(y)])
    assert cfg["optimizer"]["control_horizon"] == 12


def test_cli_step(capsys):
    out = _run(capsys, ["step", "--config", "obstacle", "--people", "0"])
    assert out["usable"] is True
    assert 0.0 <= out["linear_x"] <= 0.6 + 1e-6  # f32 box bound


def test_cli_sim(capsys):
    out = _run(capsys, ["sim", "--ticks", "12", "--people", "2"])
    assert out["status_ok_frac"] > 0.5
    assert out["max_v"] <= 0.6 + 1e-6


def test_cli_bench_tiny(capsys):
    out = _run(capsys, ["bench", "--batch", "4", "--iters", "2"])
    assert out["unit"] == "solves/s/chip"
    assert out["value"] > 0


def test_cli_dryrun(capsys):
    out = _run(capsys, ["dryrun", "--devices", "8"])
    assert out == {"dryrun": "ok", "devices": 8}


def test_cli_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])
