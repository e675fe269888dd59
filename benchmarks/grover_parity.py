#!/usr/bin/env python
"""Statistical parity run: GKP Grover success vs the reference's committed data.

Runs the eager GKP simulator at (near-)production parameters on CPU x64 and
compares the mean Grover success probability against the committed
``gkp_grover_*.dat`` anchors (BASELINE.md: success(0,4) ~ 0.954 @ 12.5 dB).

Writes incremental JSON results so partial runs are usable.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("QCT_X64", "1")

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from quantum_computations_tpu.dv import State as DVState
    from quantum_computations_tpu.gkp import (
        MBGKPCircuit, Simulator as GKPSimulator, db2eps, parse_to_mps,
    )
    from quantum_computations_tpu.pipelines.grover import grover, run_simulation, success_probability

    tagged = [int(x) for x in os.environ.get("QCT_PARITY_TAGS", "0,4").split(",")]
    db = float(os.environ.get("QCT_PARITY_DB", 12.5))
    n_traj = int(os.environ.get("QCT_PARITY_TRAJ", 5))
    grid = int(os.environ.get("QCT_PARITY_GRID", 1000))
    chi = int(os.environ.get("QCT_PARITY_CHI", 50))
    out_path = os.environ.get("QCT_PARITY_OUT", "/root/repo/benchmarks/grover_parity_results.json")

    circuit, init = grover(tagged)
    qs = np.linspace(-20, 20, grid)
    eps = float(db2eps(db))
    svd = {"rel_err": 1e-2, "max_bond_dim": chi}
    gkp_circuit = MBGKPCircuit.transpile(circuit)
    gkp_circuit.fill()

    results = {"tagged": tagged, "db": db, "grid": grid, "chi": chi, "successes": []}
    for s in range(n_traj):
        t0 = time.time()
        sim = GKPSimulator(gkp_circuit, ancilla_epsilon=eps, rng_seed=100 + s, svd_options=svd)
        rho = run_simulation(sim, parse_to_mps(init, eps, qs))
        p = success_probability(rho, tagged)
        results["successes"].append({"seed": 100 + s, "success": p, "seconds": time.time() - t0})
        results["mean_success"] = float(np.mean([r["success"] for r in results["successes"]]))
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"traj {s}: success={p:.4f} ({time.time()-t0:.0f}s), "
              f"running mean={results['mean_success']:.4f}", flush=True)


if __name__ == "__main__":
    main()
