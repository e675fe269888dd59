#!/usr/bin/env python
"""Score the exact-pair-prerot production anchor cell (10 dB, depth 8).

The prerot rewrite (QCT_FUSED_EXACT_PREROT, ops/fused_gadget.py) reroutes the
both-angles-nonzero fused pair measure onto the Gram-eligible a1=0 path.
Accuracy was adjudicated against the eager exact-SVD ground truth
(benchmarks/prerot_accuracy_results.jsonl) and the on-chip speed A/B measured
0.4059 -> 0.6451 traj/s (benchmarks/logs/bench-prerot.log). This scores the
production-scale anchor (gkp_rb_prerot_anchor.dat, queue 26: chi=100,
grid 1000, 10 dB depth-8, fused defaults + prerot) against
  * the fused-default (no-prerot) row cell  (gkp_rb_fused_10.0_d8.dat),
  * the split-engine cell                   (gkp_rb_tpu_10.0*.dat),
  * the reference's committed gkp_rb.dat    (cluster-robust z),
with circuit-cluster-robust SEs, and writes benchmarks/prerot_anchor_ab.json.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

B = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, B)
REF_DAT = ("/root/reference/impact_of_finite_squeezing_on_near-term_quantum_"
           "computations_using_gkp_qubits/data/gkp_rb.dat")
DB, DEPTH = 10.0, 8


def _rows(paths):
    out = []
    for p in paths:
        with open(p) as f:
            txt = f.read().strip()
        if not txt:
            continue
        rows = json.loads(txt) if txt.startswith("[") else [
            json.loads(line) for line in txt.splitlines() if line.strip()]
        out.extend(r for r in rows
                   if abs(float(r["db"]) - DB) < 1e-6 and int(r["depth"]) == DEPTH)
    return out


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
    anchor = _stats(_rows([os.path.join(B, "gkp_rb_prerot_anchor.dat")]), cluster=16)
    if anchor is None:
        print(json.dumps({"error": "anchor .dat empty or missing"}))
        return 1
    fused = _stats(_rows([os.path.join(B, "gkp_rb_fused_10.0_d8.dat")]), cluster=16)
    split = _stats(_rows(sorted(glob.glob(os.path.join(B, "gkp_rb_tpu_10.0*.dat")))),
                   cluster=16)
    ref = _stats(_rows([REF_DAT]), cluster=20)

    def z(a, b):
        return round((a[0] - b[0]) / np.hypot(a[1], b[1]), 2)

    meta_path = os.path.join(B, "gkp_rb_prerot_anchor.dat.meta.json")
    sec = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        rows = meta if isinstance(meta, list) else [meta]
        sec = rows[0].get("sec_per_traj")

    report = {
        "metric": "rb_prerot_anchor_ab",
        "cell": [DB, DEPTH],
        "anchor": {"mean": round(anchor[0], 4), "se": round(anchor[1], 4),
                   "n": anchor[2], "sec_per_traj": sec},
        "z_vs_fused_default": z(anchor, fused) if fused else None,
        "fused_mean": round(fused[0], 4) if fused else None,
        "z_vs_split": z(anchor, split) if split else None,
        "split_mean": round(split[0], 4) if split else None,
        "z_vs_ref": z(anchor, ref) if ref else None,
        "ref_mean": round(ref[0], 4) if ref else None,
        "ref_n": ref[2] if ref else None,
    }
    print(json.dumps(report))
    with open(os.path.join(B, "prerot_anchor_ab.json"), "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
