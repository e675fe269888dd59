#!/usr/bin/env python
"""Replay the 11.667 dB d8 cell's low-fidelity CIRCUITS through the eager
CPU x64 exact-SVD engine (VERDICT r4 #1 adjudication, step 2).

The same-seed prerot/noprerot A/B (queue 29) reproduced the cell's mean to
z = -0.01 with identical low-fidelity trajectories, exonerating the prerot
rewrite. What remains: the cell mean (0.974) sits z = -1.63 below the
reference (0.9928) because ~7/112 trajectories land at fidelity 0.37-0.9.
Two hypotheses:

  (a) physics — those circuits genuinely have high logical-flip
      probability under measurement-outcome stochasticity (the reference's
      own 100-sample cell mean implies a ~1.4%% flip rate, so seeing more
      in our ensemble draw is possible);
  (b) engine systematic — f32 + rank-adaptive truncation + fused gadgets
      mis-simulate those particular circuits.

This script replays the EXACT circuit stream of the chip cell
(rng seed 110809, the rb_batched draw order: per batch of 16, one
``random_circ(2, 8, rng)`` then one ``rng.integers(2**31)``), selects the
batches containing low-fidelity rows plus two control batches, and runs
each circuit M times through the eager x64 exact-SVD engine (the
reference-architecture path: GKPSimulator + dense tensor_svd). If the
eager engine also produces low-fidelity trajectories on those circuits at
a similar rate, the chip cell is physics; if it stays at ~0.99, the
accelerator stack is biased on those circuits.

Writes benchmarks/replay_bad_circuits.json incrementally.
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
CELL_DAT = os.path.join(B, "gkp_rb_tpu_11.667_d8.dat")
SEED = 110809
DB, DEPTH, NBATCH, BATCH = 11.667, 8, 7, 16
M = int(os.environ.get("QCT_REPLAY_M", "6"))
BAD_THRESH = 0.9
OUT = os.path.join(B, "replay_bad_circuits.json")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from quantum_computations_tpu.dv import (Simulator as DVSimulator, qop)
    from quantum_computations_tpu.dv.states import State as DVState
    from quantum_computations_tpu.gkp import (Simulator as GKPSimulator,
                                              db2eps, parse_to_mps)
    from quantum_computations_tpu.pipelines.grover import run_simulation
    from quantum_computations_tpu.pipelines.rb import random_circ

    rows = json.load(open(CELL_DAT))
    fids = np.array([r["fidelity"] for r in rows])
    bad_batches = sorted({i // BATCH for i in np.flatnonzero(fids < BAD_THRESH)})
    good_batches = [b for b in range(NBATCH) if b not in bad_batches][:2]
    print(f"bad batches {bad_batches} (rows<{BAD_THRESH}: "
          f"{int((fids < BAD_THRESH).sum())}), controls {good_batches}")

    # replay the chip cell's exact circuit stream
    rng = np.random.default_rng(SEED)
    circuits = []
    for _ in range(NBATCH):
        dv_circ, gkp_circ = random_circ(2, DEPTH, rng)
        batch_seed = int(rng.integers(2 ** 31))
        circuits.append((dv_circ, gkp_circ, batch_seed))

    eps = float(db2eps(DB))
    qs = np.linspace(-20, 20, 1000)
    svd = {"rel_err": 1e-2, "max_bond_dim": 100}
    init_dv = [DVState.ZERO] * 2
    init_mps = parse_to_mps(init_dv, eps, qs)

    out = {"cell": {"db": DB, "depth": DEPTH, "seed": SEED},
           "bad_batches": [int(b) for b in bad_batches],
           "control_batches": [int(b) for b in good_batches],
           "chip_batch_means": [round(float(fids[i*BATCH:(i+1)*BATCH].mean()), 4)
                                for i in range(NBATCH)],
           "chip_batch_nbad": [int((fids[i*BATCH:(i+1)*BATCH] < BAD_THRESH).sum())
                               for i in range(NBATCH)],
           "replays": []}

    for b in bad_batches + good_batches:
        dv_circ, gkp_circ, _ = circuits[b]
        ideal = np.asarray(DVSimulator(dv_circ).run(init_dv))
        entry = {"batch": int(b), "kind": "bad" if b in bad_batches else "control",
                 "fidelities": []}
        out["replays"].append(entry)
        for m in range(M):
            t0 = time.time()
            sim = GKPSimulator(gkp_circ, eps, rng_seed=900000 + 100 * b + m,
                               svd_options=svd)
            rho = run_simulation(sim, init_mps.copy())
            fid = float(qop.fidelity(jnp.asarray(rho), jnp.asarray(ideal)))
            entry["fidelities"].append(round(fid, 4))
            json.dump(out, open(OUT, "w"), indent=1)
            print(f"batch {b} ({entry['kind']}) replay {m}: fid={fid:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    for e in out["replays"]:
        v = np.array(e["fidelities"])
        e["mean"] = round(float(v.mean()), 4)
        e["n_bad"] = int((v < BAD_THRESH).sum())
    json.dump(out, open(OUT, "w"), indent=1)
    print(json.dumps({k: out[k] for k in
                      ("bad_batches", "chip_batch_nbad")}, indent=1))


if __name__ == "__main__":
    main()
