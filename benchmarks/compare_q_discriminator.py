#!/usr/bin/env python
"""Adjudicate the deep-cell power-iteration count (q) for the RB grid.

The first depth-30 cell (9.167 dB, queue 30, q=2 streamed power
iterations) landed at z ~ -2.7 below the reference with a variance
decomposition showing the deficit is not circuit-sampling noise. The
reference's own tensor_svd uses RANDOMIZED SVD with q = 7 power
iterations at production shapes (`reference mps.py:25-50`: q = 7 when
k < 0.1*min(shape), oversampling 10) — our round-4 q=2 adoption was
validated per-split at shallow depth, but near bond saturation (depth
>= 30) the singular spectrum flattens and the q=2 subspace keeps
measurably less weight per split, compounding over layers.

This compares the SAME-SEED re-run of the 9.167 dB depth-30 cell at
QCT_STREAM_POWER_ITERS=ref (rb_930_qref.dat, seed 53030 — the
identical circuit stream and PRNG keys as the q=2 cell in
gkp_rb_tpu_d30_sweep.dat) against the q=2 rows, circuit-cluster paired,
and against the reference cell. Decision written to
benchmarks/logs/DEEP_POWER_ITERS ("ref" or "2"): flip to "ref" when the
paired uplift exceeds +0.03 with paired z > 1.5, or when the qref run
is within 1 SE of the reference while q=2 is not.
Writes benchmarks/q_discriminator_ab.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

B = os.path.dirname(os.path.abspath(__file__))
REF_DAT = ("/root/reference/impact_of_finite_squeezing_on_near-term_quantum_"
           "computations_using_gkp_qubits/data/gkp_rb.dat")
DB, DEPTH, BATCH = 9.167, 30, 16


def _cell(path):
    if not os.path.exists(path):
        return None
    try:
        rows = json.load(open(path))
    except json.JSONDecodeError:
        return None
    v = [float(r["fidelity"]) for r in rows
         if abs(float(r["db"]) - DB) < 1e-3 and int(r["depth"]) == DEPTH]
    return np.asarray(v) if v else None


def main():
    q2 = _cell(os.path.join(B, "gkp_rb_tpu_d30_sweep.dat"))
    qr = _cell(os.path.join(B, "rb_930_qref.dat"))
    if q2 is None or qr is None:
        print(json.dumps({"error": "missing q2 or qref cell"}))
        return 1
    m = (min(len(q2), len(qr)) // BATCH) * BATCH
    c2 = q2[:m].reshape(-1, BATCH).mean(axis=1)
    cr = qr[:m].reshape(-1, BATCH).mean(axis=1)
    diff = cr - c2
    dse = float(diff.std(ddof=1) / np.sqrt(len(diff))) if len(diff) > 1 else float("nan")
    paired_z = float(diff.mean() / dse) if dse and np.isfinite(dse) else float("nan")

    ref_rows = [float(r["fidelity"]) for r in json.load(open(REF_DAT))
                if abs(float(r["db"]) - DB) < 0.01 and int(r["depth"]) == DEPTH]
    rv = np.asarray(ref_rows)
    rse = float(rv.std() / np.sqrt(len(rv)))

    def z_vs_ref(cm):
        se = float(cm.std(ddof=1) / np.sqrt(len(cm)))
        return float((cm.mean() - rv.mean()) / np.hypot(se, rse))

    z2, zr = z_vs_ref(c2), z_vs_ref(cr)
    flip = (diff.mean() > 0.03 and paired_z > 1.5) or (abs(zr) <= 1.0 < abs(z2))
    decision = "ref" if flip else "2"

    report = {
        "metric": "rb_deep_q_discriminator",
        "cell": [DB, DEPTH],
        "q2_mean": round(float(q2[:m].mean()), 4),
        "qref_mean": round(float(qr[:m].mean()), 4),
        "paired_uplift": round(float(diff.mean()), 4),
        "paired_se": round(dse, 4),
        "paired_z": round(paired_z, 2),
        "per_circuit_q2": [round(float(x), 4) for x in c2],
        "per_circuit_qref": [round(float(x), 4) for x in cr],
        "ref_mean": round(float(rv.mean()), 4),
        "z_q2_vs_ref": round(z2, 2),
        "z_qref_vs_ref": round(zr, 2),
        "decision_deep_power_iters": decision,
    }
    print(json.dumps(report))
    json.dump(report, open(os.path.join(B, "q_discriminator_ab.json"), "w"),
              indent=1)
    with open(os.path.join(B, "logs", "DEEP_POWER_ITERS"), "w") as f:
        f.write(decision)
    return 0


if __name__ == "__main__":
    sys.exit(main())
