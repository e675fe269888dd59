#!/usr/bin/env python
"""Bond-dimension convergence of the fused vs unfused batched engine (CPU).

The fused gadget measurements (ops/fused_gadget.py) are EXACT — no SVD
truncation inside single-mode gadgets and none in the macronode's measurement
stage — so the fused engine should converge in chi much earlier than the
unfused engine (whose every gadget truncates at chi). This study runs the
same RB cell (db, depth fixed; identical circuit streams via a shared seed)
across a chi ladder for both engines and reports cell means.

A practical consequence worth measuring: if the fused engine at chi=50
matches the unfused engine at chi=100, production sweeps can halve every
remaining streamed split's bond at no accuracy cost.

CPU-only (forces the cpu platform); writes
benchmarks/fused_convergence_study.json.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

DB = float(os.environ.get("QCT_CONV_DB", 5.833))
DEPTH = int(os.environ.get("QCT_CONV_DEPTH", 8))
GRID = int(os.environ.get("QCT_CONV_GRID", 300))
SAMPLES = int(os.environ.get("QCT_CONV_SAMPLES", 24))
BATCH = int(os.environ.get("QCT_CONV_BATCH", 8))
CHIS_FUSED = [int(x) for x in os.environ.get("QCT_CONV_CHIS", "8,16,25,50").split(",")]
CHIS_UNFUSED = [int(x) for x in os.environ.get("QCT_CONV_CHIS_UNFUSED", "25,50").split(",")]
SEED = int(os.environ.get("QCT_CONV_SEED", 7))


def run_cell(chi: int, fused: bool) -> dict:
    import time

    from quantum_computations_tpu.gkp import db2eps
    from quantum_computations_tpu.gkp.batched import BatchedGKP
    from quantum_computations_tpu.pipelines.rb_batched import sample_depth_batched

    qs = np.linspace(-20, 20, GRID)
    runner = BatchedGKP(qs, float(db2eps(DB)),
                        {"rel_err": 1e-2, "max_bond_dim": chi},
                        adaptive=True, granularity="op",
                        fused_single=fused, fused_pair=fused)
    stats: dict = {}
    t0 = time.perf_counter()
    rows = sample_depth_batched(runner, DB, DEPTH, SAMPLES, BATCH,
                                np.random.default_rng(SEED), stats)
    dt = time.perf_counter() - t0
    fids = np.asarray([r["fidelity"] for r in rows])
    # cluster-robust SE over circuits (trajectories share circuits per batch)
    cm = np.array([fids[i:i + BATCH].mean() for i in range(0, len(fids), BATCH)])
    return {
        "chi": chi, "fused": fused,
        "mean": round(float(fids.mean()), 4),
        "se_cluster": round(float(cm.std(ddof=1) / np.sqrt(len(cm))), 4),
        "n": len(fids), "dropped": stats["dropped"],
        "mean_trace": round(float(np.mean([r["trace"] for r in rows])), 4),
        "seconds": round(dt, 1),
        "sec_per_traj": round(dt / max(1, stats["attempted"]), 3),
    }


def main():
    out = {"db": DB, "depth": DEPTH, "grid": GRID, "samples": SAMPLES,
           "seed": SEED, "cells": []}
    for chi in CHIS_FUSED:
        row = run_cell(chi, fused=True)
        out["cells"].append(row)
        print(json.dumps(row), flush=True)
    for chi in CHIS_UNFUSED:
        row = run_cell(chi, fused=False)
        out["cells"].append(row)
        print(json.dumps(row), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fused_convergence_study.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
