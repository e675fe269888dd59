#!/usr/bin/env python
"""Wall-clock attribution of one production RB cell on the accelerator.

Runs `QCT_PROF_BATCHES` batches of `QCT_PROF_BATCH` trajectories at the
production parameters (grid 1000, chi 100) through the op-granularity batched
engine with WallClock spans enabled, then prints the per-span attribution
table (dispatch+device for async spans, true stall time for fetch spans) —
the measurement VERDICT r2 asked for: is the engine dispatch-RTT-bound,
device-compute-bound, or host-eigh-bound?

Optionally captures a jax.profiler trace when QCT_PROFILE_DIR is set.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("QCT_PROF_BATCH", 8))
BATCHES = int(os.environ.get("QCT_PROF_BATCHES", 2))
DEPTH = int(os.environ.get("QCT_PROF_DEPTH", 8))
DB = float(os.environ.get("QCT_PROF_DB", 5.833))
GRID = int(os.environ.get("QCT_PROF_GRID", 1000))
CHI = int(os.environ.get("QCT_PROF_CHI", 100))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quantum_computations_tpu.dv.states import State as DVState
    from quantum_computations_tpu.gkp import db2eps
    from quantum_computations_tpu.gkp.batched import BatchedGKP
    from quantum_computations_tpu.gkp.compiled import logical_coeffs
    from quantum_computations_tpu.pipelines.rb import random_circ
    from quantum_computations_tpu.utils.profiling import WallClock, maybe_trace

    qs = np.linspace(-20, 20, GRID)
    runner = BatchedGKP(qs, float(db2eps(DB)),
                        dict(rel_err=1e-2, max_bond_dim=CHI),
                        adaptive=True, granularity="op")
    coeffs = logical_coeffs([DVState.ZERO, DVState.ZERO])
    rng = np.random.default_rng(7)

    # warm-up batch: compiles / cache loads, NOT attributed
    _, gkp_circ = random_circ(2, DEPTH, rng)
    t0 = time.perf_counter()
    tensors, frames = runner.run_circuit(gkp_circ, coeffs, BATCH, rng_seed=0)
    rho_re, _ = runner.readout(tensors, frames)
    tr = np.asarray(rho_re).trace(axis1=1, axis2=2)
    warm_s = time.perf_counter() - t0
    print(json.dumps({"warmup_s": round(warm_s, 1),
                      "finite": bool(np.all(np.isfinite(tr)))}), flush=True)

    WallClock.enable()
    WallClock.reset()
    t0 = time.perf_counter()
    with maybe_trace():
        for b in range(BATCHES):
            _, gkp_circ = random_circ(2, DEPTH, rng)
            tensors, frames = runner.run_circuit(
                gkp_circ, coeffs, BATCH, rng_seed=b + 1)
            rho_re, _ = runner.readout(tensors, frames)
            tr = np.asarray(rho_re).trace(axis1=1, axis2=2)
            assert np.all(np.isfinite(tr)), tr
    total = time.perf_counter() - t0

    table = WallClock.table()
    print(json.dumps({
        "metric": "rb_production_attribution",
        "db": DB, "depth": DEPTH, "grid": GRID, "chi": CHI,
        "batch": BATCH, "batches": BATCHES,
        "total_s": round(total, 1),
        "sec_per_traj": round(total / (BATCH * BATCHES), 2),
        "spans": table,
        "unattributed_s": round(total - sum(v["seconds"] for v in table.values()), 1),
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
