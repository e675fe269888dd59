#!/usr/bin/env python
"""Merge the per-dB production RB sweeps into one dataset and score parity.

The TPU queue writes one ``gkp_rb_tpu_<db>.dat`` (+ ``.meta.json`` sidecar)
per dB (benchmarks/run_tpu_queue.sh). This merges them into
``benchmarks/gkp_rb_tpu.dat`` (the reference ``gkp_rb.dat`` schema:
{db, depth, fidelity, purity} rows — producer
``impact_.../randomised_benchmarking.py:78-123``), fits the RB decay per dB
with :func:`pipelines.analysis.rb_fit`, and compares every cell mean
against the reference's committed dataset with a z-score
(SE = sqrt(se_ours^2 + se_ref^2)). Prints a JSON report and writes it to
``benchmarks/gkp_rb_tpu_summary.json``.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = os.path.dirname(os.path.abspath(__file__))
REF_DAT = ("/root/reference/impact_of_finite_squeezing_on_near-term_quantum_"
           "computations_using_gkp_qubits/data/gkp_rb.dat")


def cell_stats(samples, cluster: int = 0):
    """Per-(db, depth) mean/SE/n. With cluster=B > 0, rows are treated as
    consecutive batches of B trajectories sharing one random circuit (the
    rb_batched layout) and the SE is computed over CIRCUIT means — the naive
    per-row SE understates the cell uncertainty because trajectories within
    a batch are correlated through their shared circuit."""
    by = defaultdict(list)
    for s in samples:
        by[(round(float(s["db"]), 3), int(s["depth"]))].append(float(s["fidelity"]))
    out = {}
    for k, v in sorted(by.items()):
        v = np.asarray(v)
        if cluster > 1 and len(v) > cluster:
            groups = [v[i:i + cluster] for i in range(0, len(v), cluster)]
            cm = np.array([g.mean() for g in groups])
            se = float(cm.std(ddof=1) / np.sqrt(len(cm)))
            ncl = len(cm)
            wvar = float(np.mean([g.var(ddof=1) for g in groups
                                  if len(g) > 1] or [0.0]))
        else:
            se = float(v.std() / np.sqrt(len(v)))
            ncl = len(v)
            wvar = 0.0
        out[k] = (float(v.mean()), se, len(v), ncl, float(v.std()), wvar)
    return out


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from quantum_computations_tpu.pipelines.analysis import rb_fit

    # High-dB prerot adjudication (benchmarks/adjudicate_prerot_highdb.py):
    # if the queue-28 A/B found the prerot rewrite biased at high squeezing,
    # exclude the prerot-era rows of the affected cells (db >= 10.8) from the
    # pooled dataset — exact-path replacement cells land under *_noprerot.dat.
    adj_path = os.path.join(B, "prerot_highdb_adjudication.json")
    prerot_ok = True
    if os.path.exists(adj_path):
        prerot_ok = json.load(open(adj_path)).get("decision_prerot_highdb", 1) == 1

    data, meta, excluded = [], [], []
    for path in sorted(glob.glob(os.path.join(B, "gkp_rb_tpu_*.dat"))):
        if path.endswith(".meta.json"):
            continue
        if prerot_ok and path.endswith("_noprerot.dat"):
            # Same-seed prerot-OFF adjudication replicas: the circuit stream
            # AND the low-fidelity trajectories duplicate the base file
            # (prerot_highdb_adjudication.json, z=-0.01 same-seed), so
            # pooling them double-counts circuits. They only join the pooled
            # dataset as REPLACEMENTS when prerot is rejected.
            excluded.append({"file": os.path.basename(path),
                             "reason": "same-seed adjudication replica"})
            continue
        try:
            rows = json.load(open(path))
        except json.JSONDecodeError:  # in-flight sweep: empty placeholder
            print(f"skipping unreadable {path}", file=sys.stderr)
            continue
        mpath = path + ".meta.json"
        fmeta = json.load(open(mpath)) if os.path.exists(mpath) else []
        if not prerot_ok:
            tainted = {(round(float(m["db"]), 3), int(m["depth"]))
                       for m in fmeta
                       if float(m["db"]) >= 10.8
                       and str(m.get("engine", {}).get("exact_prerot")) == "1"}
            if tainted:
                kept = [r for r in rows
                        if (round(float(r["db"]), 3), int(r["depth"]))
                        not in tainted]
                excluded.append({"file": os.path.basename(path),
                                 "cells": sorted(map(list, tainted)),
                                 "rows_dropped": len(rows) - len(kept)})
                rows = kept
                fmeta = [m for m in fmeta
                         if (round(float(m["db"]), 3), int(m["depth"]))
                         not in tainted]
        data += rows
        meta += fmeta
    if not data:
        print("no gkp_rb_tpu_*.dat files yet", file=sys.stderr)
        return 1

    json.dump(data, open(os.path.join(B, "gkp_rb_tpu.dat"), "w"))
    batch = max([m.get("batch", 16) for m in meta] or [16])
    ours = cell_stats(data, cluster=batch)
    ref = cell_stats(json.load(open(REF_DAT)))  # one circuit per row: naive SE is right

    # per-cell engine provenance: every distinct engine config that
    # contributed samples to the cell, with its sample count
    engines_by_cell = defaultdict(list)
    for m in meta:
        key = (round(float(m["db"]), 3), int(m["depth"]))
        if "engine" in m:
            engines_by_cell[key].append(
                {**m["engine"], "n": m.get("samples")})

    cells = []
    for key, (mean, se, n, ncl, _std, wvar) in ours.items():
        row = {"db": key[0], "depth": key[1], "mean": round(mean, 4),
               "se": round(se, 4), "n": n, "n_circuits": ncl,
               "engines": engines_by_cell.get(key, [])}
        if key in ref:
            rmean, rse, rn, _rncl, rstd, _rwv = ref[key]
            # Few-circuit cells (the deep d30/d60 grid: 80 samples = 5
            # circuits of 16 trajectories): between-circuit variance cannot
            # be estimated from <10 clusters, and the round-5 adjudication
            # of the 9.167 d30 cell (q_discriminator_ab.json,
            # rb_930_splitengine.dat, replay_d30_circuits.json) showed the
            # circuit POPULATION is mixture-heavy — the reference's row
            # spread (1 circuit/row, sigma_row^2 = sigma_circ^2 +
            # sigma_traj^2) includes easy-circuit mass a 5-draw can miss
            # entirely while the drawn circuits agree locally. Report TWO
            # z's for such cells: "z" uses the conservative circuit bound
            # (sigma_circ <= ref row std, sampled ncl times) and "z_traj"
            # the trajectory-level cluster SE (the sigma_circ ~ 0 reading).
            se_eff = se
            if ncl < 10:
                se_floor = float(np.sqrt(rstd ** 2 / ncl + wvar / max(n, 1)))
                if se_floor > se:
                    se_eff = se_floor
                    row["se_circuit_floored"] = round(se_floor, 4)
                    row["z_traj"] = round(
                        float((mean - rmean) / max(np.hypot(se, rse), 1e-9)), 2)
            z = (mean - rmean) / max(np.hypot(se_eff, rse), 1e-9)
            row.update({"ref_mean": round(rmean, 4), "ref_n": rn,
                        "z": round(float(z), 2)})
        cells.append(row)

    attempted = sum(m.get("attempted", 0) for m in meta)
    dropped = sum(m.get("dropped", 0) for m in meta)
    fit = rb_fit(data)
    report = {
        "metric": "gkp_rb_tpu_production_dataset",
        "samples": len(data),
        "attempted": attempted, "dropped": dropped,
        "drop_rate": round(dropped / max(1, attempted), 4),
        "sec_per_traj": {str(m["db"]): m["sec_per_traj"] for m in meta
                         if m.get("depth") == 8},
        "cells": cells,
        "within_1se": sum(1 for c in cells if "z" in c and abs(c["z"]) <= 1),
        "within_2se": sum(1 for c in cells if "z" in c and abs(c["z"]) <= 2),
        "compared": sum(1 for c in cells if "z" in c),
        "ref_cells_total": len(ref),
        "ref_cells_covered": sum(1 for k in ref if k in ours),
        "prerot_highdb_ok": prerot_ok,
        "excluded_prerot_rows": excluded,
        "decay_fit": {str(db): {"a": round(v["a"], 4), "p": round(v["p"], 4)}
                      for db, v in fit.items()},
    }
    json.dump(report, open(os.path.join(B, "gkp_rb_tpu_summary.json"), "w"),
              indent=1)
    print(json.dumps(report, indent=1))
    if "--plot" in sys.argv:
        _plot(ours, ref, fit)
    return 0


def _plot(ours, ref, fit):
    """Decay-curve figure (reference plot_data.ipynb cell 7): per-dB cell
    means with 2 SE bars (ours solid, reference open markers) and the fitted
    ``a p^m + 1/4`` decay lines."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dbs = sorted({k[0] for k in ours})
    cmap = plt.cm.viridis
    fig, ax = plt.subplots(figsize=(9, 5))
    xs = np.linspace(0, 62, 100)
    for i, db in enumerate(dbs):
        c = cmap(i / max(1, len(dbs) - 1))
        depths = sorted(k[1] for k in ours if k[0] == db)
        means = [ours[(db, m)][0] for m in depths]
        errs = [2 * ours[(db, m)][1] for m in depths]
        ax.errorbar(depths, means, errs, fmt="o", ms=4, capsize=3, color=c,
                    label=f"{db} dB (TPU)")
        rd = sorted((k[1], ref[k]) for k in ref if k[0] == db)
        if rd:
            ax.errorbar([m for m, _ in rd], [v[0] for _, v in rd],
                        [2 * v[1] for _, v in rd], fmt="s", ms=5, mfc="none",
                        capsize=3, color=c, alpha=0.6)
        if db in fit:
            ax.plot(xs, fit[db]["a"] * fit[db]["p"] ** xs + 0.25, "-",
                    color=c, lw=1, alpha=0.8)
    ax.axhline(0.25, color="0", ls="--", lw=0.8)
    ax.set_xlabel("Circuit depth")
    ax.set_ylabel("Average output fidelity")
    ax.set_xlim(0, 65)
    ax.grid(alpha=0.3)
    ax.legend(fontsize=7, ncol=2, title="filled = TPU, open = reference")
    fig.tight_layout()
    out = os.path.join(B, "gkp_rb_decay_curves.png")
    fig.savefig(out, dpi=120)
    print(f"# wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
