"""End-to-end coverage of the remaining BASELINE.json benchmark configs:
omnidirectional + 6 agents, and the H=36 stress horizon."""

import numpy as np

from nav2_social_mpc_controller_tpu.core.config import (
    benchmark_omni_6agents_config,
    benchmark_stress_h36_config,
)
from nav2_social_mpc_controller_tpu.core.types import STATUS_OK
from nav2_social_mpc_controller_tpu.controller.controller import make_carry, make_step
from nav2_social_mpc_controller_tpu.controller.optimize import ProblemDims
from nav2_social_mpc_controller_tpu.utils.scenarios import make_scenario


def test_omni_6agents_step():
    cfg = benchmark_omni_6agents_config()
    assert cfg.n_agents == 6
    assert cfg.trajectorizer.omnidirectional
    sc = make_scenario(cfg, seed=0, n_valid_people=6)
    cmd, aux, carry = make_step(cfg)(sc, make_carry(cfg))
    assert int(aux.status) == STATUS_OK
    assert np.isfinite(float(cmd.linear_x))
    assert float(cmd.linear_y) == 0.0  # linear.y forced to zero on output
    assert aux.people_proj.shape[1] == 6


def test_stress_h36_step():
    cfg = benchmark_stress_h36_config()
    dims = ProblemDims.from_config(cfg)
    assert dims.horizon == 36
    assert dims.n_blocks == 6  # 12 decision variables
    assert dims.maxsize == 40
    sc = make_scenario(cfg, seed=1, n_valid_people=3)
    cmd, aux, carry = make_step(cfg)(sc, make_carry(cfg))
    assert int(aux.status) == STATUS_OK
    assert bool(aux.solve.usable)
    assert 0.0 - 1e-6 <= float(cmd.linear_x) <= 0.6 + 1e-6
    assert float(aux.solve.final_cost) <= float(aux.solve.initial_cost) + 1e-6
