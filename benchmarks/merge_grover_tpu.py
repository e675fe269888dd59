#!/usr/bin/env python
"""Score the production TPU Grover datasets against the reference's.

Loads each on-chip oracle dataset (``gkp_grover_tpu*.dat``, producer
``pipelines/grover_batched.py`` — schema {epsilon, rho_real, rho_imag},
identical to the reference's ``gkp_grover_{04,27,36}.dat``, producer
``impact_.../grover.py:82-145``), computes the mean success probability per
epsilon with the reference's plot_data.ipynb cell-11 metric (RAW diagonal
sum over the tagged basis states), and compares against the reference
dataset cells at the same epsilon with a z-score. Prints a JSON report and
writes ``benchmarks/gkp_grover_tpu_summary.json``.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = os.path.dirname(os.path.abspath(__file__))
REF_DIR = ("/root/reference/impact_of_finite_squeezing_on_near-term_quantum_"
           "computations_using_gkp_qubits/data")

# our dataset globs -> (tagged states, reference dataset file); continuation
# runs (extra trajectories / dB sweeps, disjoint seeds) land in
# ``gkp_grover_tpu_<oracle>_*.dat`` and are pooled with the primary file.
ORACLES = {
    ("gkp_grover_tpu.dat", "gkp_grover_tpu_04_*.dat"):
        ((0, 4), "gkp_grover_04.dat"),
    ("gkp_grover_tpu_27.dat", "gkp_grover_tpu_27_*.dat"):
        ((2, 7), "gkp_grover_27.dat"),
    ("gkp_grover_tpu_36.dat", "gkp_grover_tpu_36_*.dat"):
        ((3, 6), "gkp_grover_36.dat"),
}


def successes(rows, tagged):
    """Per-epsilon success-probability samples (raw-diagonal convention)."""
    from quantum_computations_tpu.pipelines.grover import success_probability

    by: dict[float, list[float]] = {}
    for row in rows:
        rho = np.asarray(row["rho_real"]) + 1j * np.asarray(row["rho_imag"])
        by.setdefault(round(float(row["epsilon"]), 9), []).append(
            success_probability(rho, list(tagged)))
    return by


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # High-dB prerot adjudication (adjudicate_prerot_highdb.py): when the
    # queue-28 A/B finds the prerot rewrite biased at high squeezing, drop
    # prerot-era samples at db >= 10.8 (provenance: engine.exact_prerot).
    adj_path = os.path.join(B, "prerot_highdb_adjudication.json")
    prerot_ok = True
    if os.path.exists(adj_path):
        prerot_ok = json.load(open(adj_path)).get("decision_prerot_highdb", 1) == 1

    report = {"metric": "gkp_grover_tpu_production_dataset",
              "prerot_highdb_ok": prerot_ok, "oracles": []}
    for patterns, (tagged, ref_name) in ORACLES.items():
        paths = sorted(p for pat in patterns
                       for p in glob.glob(os.path.join(B, pat))
                       if not p.endswith(".meta.json"))
        if not paths:
            report["oracles"].append({"oracle": ref_name, "status": "missing"})
            continue
        rows, meta = [], []
        for p in paths:
            try:
                frows = json.load(open(p))
            except json.JSONDecodeError:
                print(f"# skipping unreadable (in-flight?) dataset {p}",
                      file=sys.stderr)
                continue
            fmeta = (json.load(open(p + ".meta.json"))
                     if os.path.exists(p + ".meta.json") else [])
            if not prerot_ok:
                tainted = {round(float(m["epsilon"]), 9) for m in fmeta
                           if float(m.get("db", 0)) >= 10.8
                           and str(m.get("engine", {}).get("exact_prerot")) == "1"}
                if tainted:
                    frows = [r for r in frows
                             if round(float(r["epsilon"]), 9) not in tainted]
                    fmeta = [m for m in fmeta
                             if round(float(m["epsilon"]), 9) not in tainted]
            rows.extend(frows)
            meta.extend(fmeta)
        ours = successes(rows, tagged)
        ref = successes(json.load(open(os.path.join(REF_DIR, ref_name))), tagged)
        cells = []
        for eps, vals in sorted(ours.items()):
            v = np.asarray(vals)
            # nearest reference epsilon (the sweeps share db2eps exactly, but
            # float round-trips through JSON can differ in the last digit)
            ref_eps = min(ref, key=lambda e: abs(e - eps))
            rv = np.asarray(ref[ref_eps])
            se = float(v.std(ddof=1) / np.sqrt(len(v))) if len(v) > 1 else 0.0
            ref_se = float(rv.std(ddof=1) / np.sqrt(len(rv)))
            z = ((float(v.mean()) - float(rv.mean()))
                 / max(np.hypot(se, ref_se), 1e-12))
            # Near-deterministic points (both means > 0.99, high dB): the
            # trajectory variance collapses, so z amplifies sub-percent
            # absolute deviations — the ~0.2-0.6% low lean there is the
            # known f32 + rel_err=1e-2 truncation cost of the accelerator
            # defaults, invisible at any point with real statistics.
            # abs_dev is the honest companion metric for such cells.
            cells.append({
                "tagged": list(tagged), "epsilon": eps,
                "mean": round(float(v.mean()), 4), "se": round(se, 4),
                "n": len(v),
                "ref_mean": round(float(rv.mean()), 4),
                "ref_se": round(ref_se, 4), "ref_n": len(rv),
                "z": round(z, 2),
                "abs_dev": round(float(v.mean() - rv.mean()), 4),
                "near_deterministic": bool(v.mean() > 0.99 and rv.mean() > 0.99),
                "engines": [{**m.get("engine", {}), "n": m.get("samples")}
                            for m in meta
                            if abs(float(m.get("epsilon", -1)) - eps) < 1e-12],
            })
        entry = {"oracle": ref_name, "cells": cells}
        # success-vs-dB curve (reference plot_data.ipynb cell 11-12): our
        # per-dB means/2SE next to the reference's at the same dB and the
        # analytic Walshe-style estimate curve
        from quantum_computations_tpu.pipelines.analysis import (
            grover_error_estimate, grover_success_curve)

        ours_curve = grover_success_curve(rows, list(tagged))
        ref_curve = grover_success_curve(
            json.load(open(os.path.join(REF_DIR, ref_name))), list(tagged))
        entry["curve"] = {
            str(db): {**pt,
                      "ref": ref_curve.get(db),
                      "estimate": round(grover_error_estimate(db), 4)}
            for db, pt in ours_curve.items()}
        if meta:
            entry["drop_rate"] = max(m.get("drop_rate", 0.0) for m in meta)
            entry["sec_per_traj"] = [m.get("sec_per_traj") for m in meta]
            entry["engine"] = meta[-1].get("engine")
        report["oracles"].append(entry)
    allc = [c for o in report["oracles"] for c in o.get("cells", [])]
    zs = [abs(c["z"]) for c in allc]
    stat = [abs(c["z"]) for c in allc if not c.get("near_deterministic")]
    report["max_abs_z"] = max(zs) if zs else None
    report["all_within_2se"] = bool(zs) and all(z <= 2.0 for z in zs)
    # z is ill-conditioned on near-deterministic cells (see the comment at
    # the cell loop); report the statistical-cells view and the worst
    # absolute deviation of the near-deterministic ones alongside.
    report["max_abs_z_statistical"] = max(stat) if stat else None
    report["statistical_within_2se"] = bool(stat) and all(z <= 2.0 for z in stat)
    nd = [abs(c["abs_dev"]) for c in allc if c.get("near_deterministic")]
    report["near_deterministic_worst_abs_dev"] = max(nd) if nd else None
    print(json.dumps(report, indent=1))
    json.dump(report, open(os.path.join(B, "gkp_grover_tpu_summary.json"), "w"),
              indent=1)
    if "--plot" in sys.argv:
        _plot(report)


def _plot(report):
    """Success-vs-dB curve figure (reference plot_data.ipynb cell 12): our
    per-dB means with 2 SE bars, the reference's at the same dBs, and the
    analytic Walshe-style estimate curve; asymptotes 13/28 and 2/8."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from quantum_computations_tpu.pipelines.analysis import (
        grover_error_estimate)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4), sharey=True)
    for ax, entry in zip(axes, report["oracles"]):
        curve = entry.get("curve")
        if not curve:
            continue
        dbs = sorted(float(db) for db in curve)
        ax.axhline(13 / 28, color="0", lw=0.8)
        ax.axhline(2 / 8, color="0", ls="--", lw=0.8)
        xs = np.linspace(min(dbs) - 0.5, max(dbs) + 0.5, 100)
        ax.plot(xs, [grover_error_estimate(x) for x in xs], "k-",
                alpha=0.4, label="RB estimate")
        ours_m = [curve[str(db)]["mean"] for db in dbs]
        ours_e = [curve[str(db)]["err_2se"] for db in dbs]
        ax.errorbar(dbs, ours_m, ours_e, fmt=".-", color="C0", capsize=4,
                    label="TPU (2 SE)")
        ref_pts = [(db, curve[str(db)]["ref"]) for db in dbs
                   if curve[str(db)].get("ref")]
        if ref_pts:
            ax.errorbar([p[0] for p in ref_pts],
                        [p[1]["mean"] for p in ref_pts],
                        [p[1]["err_2se"] for p in ref_pts], fmt="x",
                        color="C3", capsize=4, label="reference (2 SE)")
        ax.set_xlabel("GKP squeezing (dB)")
        ax.set_title(entry["oracle"].replace(".dat", ""))
        ax.set_ylim(-0.05, 1.05)
        ax.grid(alpha=0.3)
    axes[0].set_ylabel("Success probability")
    axes[0].legend(loc="lower right", fontsize=8)
    fig.tight_layout()
    out = os.path.join(B, "gkp_grover_curves.png")
    fig.savefig(out, dpi=120)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
