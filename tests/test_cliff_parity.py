"""Machine-precision parity of Clifford-encoding fidelities vs reference data.

`benchmarks/gkp_cliff_generated.dat` is produced by our pipeline at the
reference's production parameters (d=1000 grid, x64). The per-class
16-Pauli fidelity vectors are DETERMINISTIC; our 720 symplectic classes are a
relabeling of the reference's (BFS visit order differs), so each of our
sorted vectors must match some reference class to machine precision.
"""

import json
import os

import numpy as np
import pytest

GEN = "/root/repo/benchmarks/gkp_cliff_generated.dat"
REF = (
    "/root/reference/impact_of_finite_squeezing_on_near-term_quantum_computations"
    "_using_gkp_qubits/data/gkp_cliff.dat"
)

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GEN) and os.path.exists(REF)),
    reason="generated or reference data missing",
)


@pytest.mark.parametrize("db", [5.0, 5.8333333333333333])
def test_generated_fidelities_match_reference_classes(db):
    ours = json.load(open(GEN))
    ref = json.load(open(REF))
    ref5 = [e for e in ref if abs(e["db"] - db) < 1e-3]
    ours5 = [e for e in ours if abs(e["db"] - db) < 1e-3]
    assert len(ours5) >= 100, "generated dataset too small"

    R = np.sort(np.array([e["fidelities"] for e in ref5]), axis=1)
    errs = []
    for e in ours5:
        a = np.sort(np.array(e["fidelities"]))
        errs.append(np.abs(R - a[None, :]).max(axis=1).min())
    errs = np.array(errs)
    # machine-precision agreement with some reference class for EVERY class
    assert errs.max() < 1e-10, errs.max()

    # multiset check: Pauli-related Cliffords share sorted vectors, so compare
    # multiplicities of unique vectors; ours (possibly partial) must never
    # exceed the reference multiplicity for any vector.
    from collections import Counter
    key = lambda v: tuple(np.round(np.sort(v), 9))
    ref_counts = Counter(key(e["fidelities"]) for e in ref5)
    our_counts = Counter(key(e["fidelities"]) for e in ours5)
    for k, c in our_counts.items():
        match = [rk for rk in ref_counts if max(abs(x - y) for x, y in zip(k, rk)) < 1e-8]
        assert match, "unmatched fidelity vector"
        assert c <= sum(ref_counts[m] for m in match) + 1


def test_quarter_invariant_on_generated_data():
    ours = json.load(open(GEN))
    fids = np.array([e["fidelities"] for e in ours])
    assert abs(fids.mean() - 0.25) < 0.01
