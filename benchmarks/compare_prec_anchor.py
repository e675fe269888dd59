#!/usr/bin/env python
"""Score the distribution-precision production anchor cell (10 dB, depth 8).

QCT_FUSED_TAB_PREC / QCT_FUSED_P1_PREC (ops/fused_gadget.py) drop the fused
gadgets' DISTRIBUTION-ONLY tabulations and first-distribution einsums from
6-pass "highest" to bf16x3 "high" — these feed outcome sampling and the
scalar collapse normalisation only, never the collapsed state tensor, so the
expected statistical effect is nil (relative distribution error ~1e-6 vs the
rel_err=1e-2 truncation). This scores the same-seed anchor cell
(gkp_rb_precfast_anchor.dat, seed 100810 — the prerot anchor's seed, so the
circuit stream AND PRNG key stream match row for row) against
  * the prerot anchor cell (gkp_rb_prerot_anchor.dat) — same seed, highest
    precision: the direct A/B; also reports the fraction of rows whose
    fidelity differs (categorical draws flipped by the precision change),
  * the reference's committed gkp_rb.dat (cluster-robust z),
and writes benchmarks/precfast_anchor_ab.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

B = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, B)
REF_DAT = ("/root/reference/impact_of_finite_squeezing_on_near-term_quantum_"
           "computations_using_gkp_qubits/data/gkp_rb.dat")
DB, DEPTH = 10.0, 8


def _rows(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        txt = f.read().strip()
    if not txt:
        return []
    rows = json.loads(txt) if txt.startswith("[") else [
        json.loads(line) for line in txt.splitlines() if line.strip()]
    return [r for r in rows
            if abs(float(r["db"]) - DB) < 1e-6 and int(r["depth"]) == DEPTH]


def _stats(rows, cluster=0):
    v = np.asarray([float(r["fidelity"]) for r in rows])
    if len(v) == 0:
        return None
    if cluster and len(v) >= 2 * cluster:
        m = (len(v) // cluster) * cluster
        cm = v[:m].reshape(-1, cluster).mean(axis=1)
        se = float(cm.std(ddof=1) / np.sqrt(len(cm)))
    else:
        se = float(v.std(ddof=1) / np.sqrt(len(v))) if len(v) > 1 else float("nan")
    return float(v.mean()), se, int(len(v))


def main():
    anchor_rows = _rows(os.path.join(B, "gkp_rb_precfast_anchor.dat"))
    anchor = _stats(anchor_rows, cluster=16)
    if anchor is None:
        print(json.dumps({"error": "precfast anchor .dat empty or missing"}))
        return 1
    base_rows = _rows(os.path.join(B, "gkp_rb_prerot_anchor.dat"))
    base = _stats(base_rows, cluster=16)
    ref = _stats(_rows(REF_DAT), cluster=20)

    def z(a, b):
        return round((a[0] - b[0]) / np.hypot(a[1], b[1]), 2)

    flipped = None
    if base is not None:
        m = min(len(anchor_rows), len(base_rows))
        av = np.asarray([float(r["fidelity"]) for r in anchor_rows[:m]])
        bv = np.asarray([float(r["fidelity"]) for r in base_rows[:m]])
        flipped = int(np.sum(np.abs(av - bv) > 1e-9))

    meta_path = os.path.join(B, "gkp_rb_precfast_anchor.dat.meta.json")
    sec = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        rows = meta if isinstance(meta, list) else [meta]
        sec = rows[0].get("sec_per_traj")

    report = {
        "metric": "rb_precfast_anchor_ab",
        "cell": [DB, DEPTH],
        "anchor": {"mean": round(anchor[0], 4), "se": round(anchor[1], 4),
                   "n": anchor[2], "sec_per_traj": sec},
        "z_vs_prerot_anchor_same_seed": z(anchor, base) if base else None,
        "prerot_anchor_mean": round(base[0], 4) if base else None,
        "rows_changed_same_seed": flipped,
        "z_vs_ref": z(anchor, ref) if ref else None,
        "ref_mean": round(ref[0], 4) if ref else None,
        "ref_n": ref[2] if ref else None,
    }
    print(json.dumps(report))
    with open(os.path.join(B, "precfast_anchor_ab.json"), "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
