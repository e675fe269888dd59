#!/usr/bin/env python
"""Score the fused-engine anchor cells against the unfused dataset + reference.

Compares, at the (5.833 dB, depth 8) anchor cell:
  * the committed UNFUSED production sweep (gkp_rb_tpu_5.833.dat),
  * the fused-engine anchor (rb_fused_anchor.dat, queue4),
  * the fused + device-eigh anchor (rb_all_opts_anchor.dat, queue5),
  * the reference's committed gkp_rb.dat cell,
with cluster-robust SEs (trajectories within a batch share a circuit), plus
warm sec/traj from the .meta.json sidecars. Prints one JSON report and
writes benchmarks/fused_anchor_ab.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from merge_rb_tpu import REF_DAT, cell_stats  # noqa: E402

B = os.path.dirname(os.path.abspath(__file__))
CELL = (5.833, 8)


def _load(path):
    with open(path) as f:
        return json.load(f)


def _stats(path, cluster):
    rows = [r for r in _load(path)
            if (round(float(r["db"]), 3), int(r["depth"])) == CELL]
    if not rows:
        return None
    st = cell_stats(rows, cluster=cluster)[CELL]
    meta_path = path + ".meta.json"
    sec = None
    if os.path.exists(meta_path):
        for m in _load(meta_path):
            if (round(float(m["db"]), 3), int(m["depth"])) == CELL:
                sec = m.get("sec_per_traj")
    return {"mean": round(st[0], 4), "se": round(st[1], 4), "n": st[2],
            "sec_per_traj": sec}


def main():
    report = {"cell": {"db": CELL[0], "depth": CELL[1]}}

    ref_rows = [r for r in _load(REF_DAT)
                if (round(float(r["db"]), 3), int(r["depth"])) == CELL]
    ref = cell_stats(ref_rows)[CELL]
    report["reference"] = {"mean": round(ref[0], 4), "se": round(ref[1], 4),
                           "n": ref[2]}

    candidates = {
        "unfused_sweep": ("gkp_rb_tpu_5.833.dat", 16),
        "fused_anchor": ("rb_fused_anchor.dat", 16),
        "fused_device_eigh_anchor": ("rb_all_opts_anchor.dat", 16),
    }
    for name, (fname, cluster) in candidates.items():
        path = os.path.join(B, fname)
        if not os.path.exists(path):
            report[name] = None
            continue
        st = _stats(path, cluster)
        if st is not None:
            z = (st["mean"] - ref[0]) / max(np.hypot(st["se"], ref[1]), 1e-12)
            st["z_vs_reference"] = round(float(z), 2)
        report[name] = st

    fu, un = report.get("fused_anchor"), report.get("unfused_sweep")
    if fu and un:
        se = float(np.hypot(fu["se"], un["se"]))
        report["fused_vs_unfused_z"] = round((fu["mean"] - un["mean"]) / max(se, 1e-12), 2)
        if fu["sec_per_traj"] and un["sec_per_traj"]:
            report["fused_speedup"] = round(un["sec_per_traj"] / fu["sec_per_traj"], 2)

    out = os.path.join(B, "fused_anchor_ab.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
