"""GKP Grover on-chip: the 3-qubit Grover sweep with the compiled engine.

TPU-native counterpart of :mod:`.grover`: one compiled program runs the whole
measurement-based Grover circuit, the logical readout and the syndrome
correction, vmapped over trajectories; only real arrays cross the host
boundary. Writes the same ``gkp_grover_*.dat`` schema.

Memory note: bond caps are static under jit, so the macronode CZ contraction
scales as (chi * d)^2 * batch — production (chi=100, d=1000) needs the
rank-adaptive :class:`..gkp.batched.BatchedGKP` runner instead; this pipeline
targets moderate caps for fast sweeps.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..config import SVDOptions
from ..dv.states import State as DVState
from ..gkp import MBGKPCircuit, db2eps
from ..gkp.compiled import CompiledGKP, logical_coeffs
from .grover import grover, success_probability
from .common import config_cli, prepare_output, write_data


@dataclasses.dataclass
class GroverCompiledConfig:
    """On-chip GKP Grover sweep (gkp_grover schema)."""

    tagged: str = "2,7"
    dbs: str = "6.67,8.33,10.0"
    traj_per_db: int = 8
    grid_points: int = 512
    grid_span: float = 20.0
    max_bond_dim: int = 8
    rel_err: float = 1e-2
    rng_seed: int = 0
    data_file: str = "gkp_grover_compiled.dat"
    overwrite: bool = False


def main(config: GroverCompiledConfig | None = None):
    config = config or GroverCompiledConfig()
    tagged = [int(x) for x in str(config.tagged).split(",")]
    circuit, init = grover(tagged)
    gkp_circuit = MBGKPCircuit.transpile(circuit)
    gkp_circuit.fill()

    qs = np.linspace(-config.grid_span, config.grid_span, config.grid_points)
    svd = SVDOptions(max_bond_dim=config.max_bond_dim, rel_err=config.rel_err)
    coeffs = logical_coeffs(init)

    prepare_output(config.data_file, config.overwrite)
    data = []
    for i, db in enumerate([float(x) for x in str(config.dbs).split(",")]):
        eps = float(db2eps(db))
        prog = CompiledGKP(gkp_circuit, qs, eps, svd)
        frames, rho_re, rho_im = prog.batched_readout(
            coeffs, config.traj_per_db, rng_seed=config.rng_seed + i,
        )
        for t in range(config.traj_per_db):
            rho = np.asarray(rho_re[t]) + 1j * np.asarray(rho_im[t])
            data.append({
                "epsilon": eps,
                "rho_real": rho.real.tolist(),
                "rho_imag": rho.imag.tolist(),
            })
        if config.data_file:
            write_data(config.data_file, data)
    return data


def summarize(data, tagged):
    """Mean success per epsilon."""
    from collections import defaultdict
    by = defaultdict(list)
    for entry in data:
        rho = np.array(entry["rho_real"]) + 1j * np.array(entry["rho_imag"])
        by[round(entry["epsilon"], 9)].append(success_probability(rho, tagged))
    return {eps: float(np.mean(v)) for eps, v in sorted(by.items())}


if __name__ == "__main__":
    cfg = config_cli(GroverCompiledConfig)
    data = main(cfg)
    print(summarize(data, [int(x) for x in str(cfg.tagged).split(",")]))
