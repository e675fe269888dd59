#!/usr/bin/env python
"""Replay the 9.167 dB depth-30 cell's circuits through the eager CPU x64
exact-SVD engine (round-5 depth-deficit root-cause, step 3).

The cell (gkp_rb_tpu_d30_sweep.dat, seed 53030) sits z ~ -3.2 below the
reference (ours 0.349 vs 0.448) and the same-seed q discriminator
(q_discriminator_ab.json) exonerated the power-iteration count: q=ref
reproduces q=2 per circuit to ~0.002. Remaining hypotheses:

  (a) circuit draw — these 5 circuits are genuinely low-mean;
  (b) engine systematic — the accelerator stack (fused pair measures,
      f32, streamed machinery) loses extra fidelity per layer at depth.

This replays the EXACT 5-circuit stream (per batch: one
``random_circ(2, 30, rng)`` then one ``rng.integers(2**31)``) through
GKPSimulator + dense x64 tensor_svd (the reference-architecture path),
M trajectories per circuit, round-robin across circuits so partial
results cover every circuit. If the exact engine's per-circuit means
match ours (~0.31-0.44), the cell is a circuit-draw fluctuation; if they
recover toward the reference's 0.448, the accelerator stack is biased at
depth. Writes benchmarks/replay_d30_circuits.json incrementally.
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

B = os.path.dirname(os.path.abspath(__file__))
SEED = 53030
DB, DEPTH, NCIRC = 9.167, 30, 5
M = int(os.environ.get("QCT_REPLAY_M", "4"))
OUT = os.path.join(B, "replay_d30_circuits.json")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from quantum_computations_tpu.dv import Simulator as DVSimulator, qop
    from quantum_computations_tpu.dv.states import State as DVState
    from quantum_computations_tpu.gkp import (Simulator as GKPSimulator,
                                              db2eps, parse_to_mps)
    from quantum_computations_tpu.pipelines.grover import run_simulation
    from quantum_computations_tpu.pipelines.rb import random_circ

    rng = np.random.default_rng(SEED)
    circuits = []
    for _ in range(NCIRC):
        dv_circ, gkp_circ = random_circ(2, DEPTH, rng)
        rng.integers(2 ** 31)
        circuits.append((dv_circ, gkp_circ))

    eps = float(db2eps(DB))
    qs = np.linspace(-20, 20, 1000)
    svd = {"rel_err": 1e-2, "max_bond_dim": 100}
    init_dv = [DVState.ZERO] * 2
    init_mps = parse_to_mps(init_dv, eps, qs)
    ideals = [np.asarray(DVSimulator(dv).run(init_dv)) for dv, _ in circuits]

    out = {"cell": {"db": DB, "depth": DEPTH, "seed": SEED},
           "tpu_per_circuit_q2": [0.3123, 0.3234, 0.3626, 0.4397, 0.3065],
           "tpu_per_circuit_qref": [0.3084, 0.3244, 0.362, 0.4376, 0.3042],
           "ref_cell_mean": 0.4484,
           "replays": [{"circuit": c, "fidelities": []} for c in range(NCIRC)]}
    if os.path.exists(OUT):      # resume: keep completed (circuit, m) pairs
        try:
            prev = json.load(open(OUT))
            for c, e in enumerate(prev.get("replays", [])[:NCIRC]):
                out["replays"][c]["fidelities"] = list(e.get("fidelities", []))
        except json.JSONDecodeError:
            pass

    for m in range(M):           # round-robin: every circuit covered early
        for c, (_, gkp_circ) in enumerate(circuits):
            if len(out["replays"][c]["fidelities"]) > m:
                continue         # already done in a previous run (same seed)
            t0 = time.time()
            sim = GKPSimulator(gkp_circ, eps, rng_seed=930000 + 100 * c + m,
                               svd_options=svd)
            rho = run_simulation(sim, init_mps.copy())
            fid = float(qop.fidelity(jnp.asarray(rho), jnp.asarray(ideals[c])))
            out["replays"][c]["fidelities"].append(round(fid, 4))
            json.dump(out, open(OUT, "w"), indent=1)
            print(f"circuit {c} replay {m}: fid={fid:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    for e in out["replays"]:
        v = np.array(e["fidelities"])
        e["mean"] = round(float(v.mean()), 4)
    json.dump(out, open(OUT, "w"), indent=1)
    print(json.dumps({"per_circuit_exact": [e["mean"] for e in out["replays"]]}))


if __name__ == "__main__":
    sys.exit(main())
