"""On-chip Grover pipeline smoke (slow: 3-qubit macronodes on 1 CPU core)."""

import numpy as np
import pytest

from quantum_computations_tpu.pipelines.grover_compiled import (
    GroverCompiledConfig, main, summarize,
)


@pytest.mark.slow
def test_grover_compiled_smoke(tmp_path):
    cfg = GroverCompiledConfig(
        tagged="2,7", dbs="10.0", traj_per_db=2, grid_points=256,
        max_bond_dim=8, data_file=str(tmp_path / "g.dat"),
    )
    data = main(cfg)
    assert len(data) == 2
    rho = np.array(data[0]["rho_real"])
    assert rho.shape == (8, 8)
    s = summarize(data, [2, 7])
    (mean,) = s.values()
    assert 0.0 <= mean <= 1.0 + 1e-6
