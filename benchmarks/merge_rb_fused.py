#!/usr/bin/env python
"""Score the fused-default-engine RB row against the split engine + reference.

VERDICT r3 #4: the DEFAULT engine (fused_single + fused_pair, gkp/batched.py)
had production-scale evidence only at CPU scale. Queue 17 produces
``gkp_rb_fused_10.0_d{8,10,15,20}.dat`` at chi=100 / grid 1000 with the fused
defaults ON; this compares every cell against (a) the committed split-engine
10.0 dB cells (``gkp_rb_tpu*.dat``, fused_single=0) and (b) the reference's
committed ``gkp_rb.dat``, with circuit-cluster-robust SEs, plus the measured
s/traj of both engines from the .meta.json sidecars. Writes
``benchmarks/gkp_rb_fused_summary.json``.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = os.path.dirname(os.path.abspath(__file__))
REF_DAT = ("/root/reference/impact_of_finite_squeezing_on_near-term_quantum_"
           "computations_using_gkp_qubits/data/gkp_rb.dat")
DB = 10.0


def cell_stats(rows, cluster=0):
    from collections import defaultdict
    by = defaultdict(list)
    for s in rows:
        if abs(float(s["db"]) - DB) < 1e-6:
            by[int(s["depth"])].append(float(s["fidelity"]))
    out = {}
    for depth, vals in by.items():
        v = np.asarray(vals)
        if cluster and len(v) >= 2 * cluster:
            m = (len(v) // cluster) * cluster
            cm = v[:m].reshape(-1, cluster).mean(axis=1)
            se = float(cm.std(ddof=1) / np.sqrt(len(cm))) if len(cm) > 1 else float("nan")
        else:
            se = float(v.std(ddof=1) / np.sqrt(len(v)))
        out[depth] = (float(v.mean()), se, len(v))
    return out


def main():
    fused_rows, fused_meta = [], []
    for p in sorted(glob.glob(os.path.join(B, "gkp_rb_fused_10.0_d*.dat"))):
        if p.endswith(".meta.json"):
            continue
        try:  # in-flight cells leave empty placeholders
            fused_rows += json.load(open(p))
        except (json.JSONDecodeError, OSError):
            continue
        mp = p + ".meta.json"
        if os.path.exists(mp):
            fused_meta += json.load(open(mp))
    if not fused_rows:
        print(json.dumps({"status": "no fused data yet"}))
        return

    split_rows = []
    for p in sorted(glob.glob(os.path.join(B, "gkp_rb_tpu*.dat"))):
        if p.endswith(".meta.json") or "_summary" in p:
            continue
        split_rows += json.load(open(p))
    ref_rows = json.load(open(REF_DAT))

    fused = cell_stats(fused_rows, cluster=16)
    split = cell_stats(split_rows, cluster=16)
    ref = cell_stats(ref_rows)

    report = {"metric": "gkp_rb_fused_engine_parity", "db": DB, "cells": []}
    ok = 0
    for depth in sorted(fused):
        fm, fse, fn = fused[depth]
        cell = {"depth": depth, "fused_mean": round(fm, 4), "fused_n": fn}
        for name, src in (("split", split), ("ref", ref)):
            if depth in src:
                m, se, n = src[depth]
                z = (fm - m) / np.sqrt(fse ** 2 + se ** 2)
                cell[f"z_vs_{name}"] = round(float(z), 2)
                cell[f"{name}_mean"] = round(m, 4)
        report["cells"].append(cell)
        if abs(cell.get("z_vs_ref", 0)) < 2:
            ok += 1
    report["within_2se_of_ref"] = ok
    spt = [m.get("sec_per_traj") for m in fused_meta if m.get("sec_per_traj")]
    report["fused_sec_per_traj"] = spt
    report["engines"] = [m.get("engine") for m in fused_meta][:1]

    # fused-default Grover cell ({0,4} @ 12.5 dB, queue17 grover-04-fused)
    gpath = os.path.join(B, "gkp_grover_fused_04.dat")
    if os.path.exists(gpath):
        sys.path.insert(0, B)
        from merge_grover_tpu import successes
        try:
            grows = json.load(open(gpath))
        except (json.JSONDecodeError, OSError):
            grows = []
        if grows:
            by = successes(grows, (0, 4))
            (eps, vals), = by.items()
            v = np.asarray(vals)
            m, se = float(v.mean()), float(v.std(ddof=1) / np.sqrt(len(v)))
            ref_m, ref_se = 0.9537, 0.0141  # gkp_grover_04.dat @ eps, n=40
            spl_m, spl_se = 0.9571, 0.0159  # our split engine, n=60
            report["grover_04_fused"] = {
                "epsilon": eps, "mean": round(m, 4), "se": round(se, 4),
                "n": len(v),
                "z_vs_ref": round((m - ref_m) / np.hypot(se, ref_se), 2),
                "z_vs_split": round((m - spl_m) / np.hypot(se, spl_se), 2),
            }
    out = os.path.join(B, "gkp_rb_fused_summary.json")
    json.dump(report, open(out, "w"), indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
