"""On-chip RB pipeline tests (CPU, small params)."""

import pytest
import numpy as np

from quantum_computations_tpu.pipelines.rb_compiled import sample_depth_compiled


@pytest.mark.slow
def test_sample_depth_compiled_produces_valid_samples():
    samples = sample_depth_compiled(
        10.0, 2, num_circuits=1, traj_per_circuit=3, rng_seed=0,
        grid_points=256, max_bond_dim=8,
    )
    assert len(samples) == 3
    for s in samples:
        # truncated rho is not exactly PSD, so values may exceed 1 slightly
        assert -0.01 <= s["fidelity"] <= 1.05
        assert -0.01 <= s["purity"] <= 1.05
        assert s["db"] == 10.0 and s["depth"] == 2


@pytest.mark.slow
def test_high_squeezing_gives_high_fidelity():
    # 13 dB peaks need a finer grid than 300 points over [-20, 20]; use 11 dB
    # with moderate resolution for a fast check.
    samples = sample_depth_compiled(
        11.0, 2, num_circuits=2, traj_per_circuit=4, rng_seed=1,
        grid_points=400, max_bond_dim=12,
    )
    mean_fid = np.mean([s["fidelity"] for s in samples])
    assert mean_fid > 0.6, mean_fid
