#!/usr/bin/env python
"""Adjudicate the prerot rewrite at high squeezing (VERDICT r4 weak #2).

Round 4's first out-of-band RB cell — 11.667 dB depth-8 at z = -2.16 vs the
reference (`gkp_rb_tpu_11.667_d8.dat`, run with prerot default-ON) — sits
exactly where the prerot approximation's state-dependent aliasing error is
most plausible (ADVICE r4 #4).  Queue 28 produces two new cells:

- ``gkp_rb_tpu_11.667_d8_noprerot.dat`` — SAME rng seed (110809), prerot OFF:
  the identical random-circuit stream scored through the exact-kernel pair
  path.  Circuit-ensemble variance cancels between this and the round-4
  cell, so their difference isolates the prerot effect (conservatively
  scored as independent — shared circuits only reduce the true variance).
- ``gkp_rb_tpu_11.667_d8_b.dat`` — fresh seed (210809), prerot ON: a fluke
  test of the original z = -2.16.

Decision rule (written to ``prerot_highdb_adjudication.json`` and, as a bare
0/1, to ``logs/PREROT_HIGHDB`` for the queue to source):

- |z(prerot_r4 - noprerot)| >= 2            -> prerot biased at high dB: 0
- pooled prerot (r4 + b) vs reference < -2.5 while noprerot is within 2
  of the reference                           -> 0
- otherwise                                  -> 1 (keep the shipped default)

Missing inputs fail safe to 1 with a note (the queue then runs the deep
cells with the shipped default, matching round-4 behaviour).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

B = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(B))
sys.path.insert(0, B)

from merge_rb_tpu import cell_stats  # noqa: E402  (cluster-robust SE)

REF_DAT = ("/root/reference/impact_of_finite_squeezing_on_near-term_quantum_"
           "computations_using_gkp_qubits/data/gkp_rb.dat")
KEY = (11.667, 8)


def _load(path):
    p = os.path.join(B, path)
    if not os.path.exists(p):
        return None
    try:
        rows = json.load(open(p))
    except json.JSONDecodeError:
        return None
    stats = cell_stats(rows, cluster=16)
    return stats.get(KEY)


def _z(a, b):
    return (a[0] - b[0]) / float(np.hypot(a[1], b[1]))


def main():
    ref = cell_stats(json.load(open(REF_DAT))).get(KEY)
    r4 = _load("gkp_rb_tpu_11.667_d8.dat")          # prerot ON, seed 110809
    nop = _load("gkp_rb_tpu_11.667_d8_noprerot.dat")  # prerot OFF, seed 110809
    b = _load("gkp_rb_tpu_11.667_d8_b.dat")         # prerot ON, seed 210809

    out = {"cell": {"db": KEY[0], "depth": KEY[1]},
           "ref": ref, "prerot_r4": r4, "noprerot": nop, "prerot_b": b}
    decision = 1
    notes = []
    if r4 is None or nop is None:
        notes.append("inputs missing - fail safe to shipped default (prerot on)")
    else:
        z_pair = _z(r4, nop)
        out["z_prerot_vs_noprerot_sameseed"] = round(z_pair, 3)
        out["z_noprerot_vs_ref"] = round(_z(nop, ref), 3)
        out["z_prerot_r4_vs_ref"] = round(_z(r4, ref), 3)
        if b is not None:
            out["z_prerot_b_vs_ref"] = round(_z(b, ref), 3)
            pooled_mean = (r4[0] * r4[2] + b[0] * b[2]) / (r4[2] + b[2])
            pooled_se = float(np.hypot(r4[1] * r4[2], b[1] * b[2])
                              / (r4[2] + b[2]))
            out["z_prerot_pooled_vs_ref"] = round(
                (pooled_mean - ref[0]) / float(np.hypot(pooled_se, ref[1])), 3)
        if abs(z_pair) >= 2:
            decision = 0
            notes.append("same-seed prerot/noprerot split >= 2 SE: prerot "
                         "biased at 11.667 dB; deep high-dB cells run exact")
        elif (out.get("z_prerot_pooled_vs_ref", 0) < -2.5
              and abs(out["z_noprerot_vs_ref"]) < 2):
            decision = 0
            notes.append("pooled prerot low vs reference while exact path "
                         "agrees: prerot systematic at high dB")
        else:
            notes.append("no prerot-attributable bias detected at 11.667 dB")
    out["decision_prerot_highdb"] = decision
    out["notes"] = notes
    json.dump(out, open(os.path.join(B, "prerot_highdb_adjudication.json"),
                        "w"), indent=1)
    os.makedirs(os.path.join(B, "logs"), exist_ok=True)
    open(os.path.join(B, "logs", "PREROT_HIGHDB"), "w").write(str(decision))
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
