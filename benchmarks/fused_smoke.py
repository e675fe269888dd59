"""TPU smoke test of the fused single-mode gadget executor.

Small shapes (grid 256, chi=8) so remote compiles stay in minutes: runs an
H+P single-qubit circuit batch through BatchedGKP with QCT_FUSED_SINGLE on,
checks the readout is finite with a sane trace, and times a warm repeat.
Writes benchmarks/fused_smoke_result.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quantum_computations_tpu.pipelines.common import setup_compile_cache


def main():
    setup_compile_cache()
    from quantum_computations_tpu.dv import State as DVState, gates as dvg
    from quantum_computations_tpu.gkp import MBGKPCircuit, db2eps
    from quantum_computations_tpu.gkp.batched import BatchedGKP
    from quantum_computations_tpu.gkp.compiled import logical_coeffs

    qs = np.linspace(-20, 20, 256)
    circ = MBGKPCircuit.transpile([dvg.H(0), dvg.P(0)], 1)
    circ.fill()
    runner = BatchedGKP(qs, float(db2eps(10.0)),
                        {"rel_err": 1e-2, "max_bond_dim": 8},
                        adaptive=True, granularity="op", fused_single=True)
    coeffs = logical_coeffs([DVState.ZERO])

    t0 = time.perf_counter()
    tensors, frames = runner.run_circuit(circ, coeffs, 8, rng_seed=0)
    rho_re, rho_im = runner.readout(tensors, frames)
    rho_re = np.asarray(rho_re)  # real fetch surfaces backend errors
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    tensors, frames = runner.run_circuit(circ, coeffs, 8, rng_seed=1)
    rho_re2, rho_im2 = runner.readout(tensors, frames)
    rho_re2 = np.asarray(rho_re2)
    warm = time.perf_counter() - t0

    traces = rho_re2[:, 0, 0] + rho_re2[:, 1, 1]
    ok = bool(np.all(np.isfinite(rho_re)) and np.all(np.isfinite(rho_re2))
              and np.all(traces > 0.05) and np.all(traces < 1.5))
    result = {
        "metric": "fused_single_smoke",
        "ok": ok,
        "cold_s": round(cold, 2),
        "warm_s": round(warm, 3),
        "traces": [round(float(t), 4) for t in traces],
        "executors": sorted({k[0] for k in runner._cache}),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fused_smoke_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
