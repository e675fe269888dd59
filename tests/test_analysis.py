"""Analysis-layer goldens against the COMMITTED reference datasets.

BASELINE.md anchor values: RB mean fidelity 0.341 @ (5.83 dB, depth 8) and
0.732 @ (10 dB, depth 20); Grover(2,7) success 0.284 @ 6.67 dB → 0.997 @ 15 dB;
Clifford mean Pauli fidelity = 0.2500.
"""

import os

import numpy as np
import pytest

from quantum_computations_tpu.pipelines import analysis

REF = (
    "/root/reference/impact_of_finite_squeezing_on_near-term_quantum_computations"
    "_using_gkp_qubits/data"
)

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference data not mounted")


def test_rb_dataset_anchors():
    data = analysis.load_dat(os.path.join(REF, "gkp_rb.dat"))
    fits = analysis.rb_fit(data)
    db = min(fits, key=lambda d: abs(d - 5.8333))
    i8 = fits[db]["depths"].index(8)
    assert abs(fits[db]["mean_fidelity"][i8] - 0.341) < 0.01
    db10 = min(fits, key=lambda d: abs(d - 10.0))
    i20 = fits[db10]["depths"].index(20)
    assert abs(fits[db10]["mean_fidelity"][i20] - 0.732) < 0.01
    # decay fits are sane: higher squeezing -> larger p
    assert fits[db10]["p"] > fits[db]["p"]
    assert 0 < fits[db]["p"] < 1


def test_grover_dataset_anchors():
    data = analysis.load_dat(os.path.join(REF, "gkp_grover_27.dat"))
    by_db = analysis.grover_success_by_db(data, [2, 7])
    def at(db):
        key = min(by_db, key=lambda d: abs(d - db))
        return by_db[key]
    assert abs(at(6.667) - 0.284) < 0.02
    assert abs(at(11.667) - 0.855) < 0.02
    assert abs(at(15.0) - 0.997) < 0.01


def test_clifford_dataset_invariant():
    data = analysis.load_dat(os.path.join(REF, "gkp_cliff.dat"))
    summary = analysis.clifford_summary(data)
    for db, s in summary.items():
        assert abs(s["mean_over_paulis"] - 0.25) < 0.002, (db, s)


def test_grover_success_curve_and_estimate():
    """Curve points (reference plot_data.ipynb cell 11) on the committed
    {2,7} dataset, and the analytic Walshe-style estimate's limits."""
    data = analysis.load_dat(os.path.join(REF, "gkp_grover_27.dat"))
    curve = analysis.grover_success_curve(data, [2, 7])
    key = min(curve, key=lambda d: abs(d - 11.667))
    pt = curve[key]
    assert abs(pt["mean"] - 0.855) < 0.02
    assert pt["n"] == 40 and 0 < pt["err_2se"] < 0.2
    # analytic estimate: ~uniform 2/8 at low squeezing, -> 1 at high
    assert abs(analysis.grover_error_estimate(5.0) - 0.25) < 0.01
    assert analysis.grover_error_estimate(20.0) > 0.99
    # monotone through the transition region
    vals = [analysis.grover_error_estimate(db) for db in (8, 10, 12, 14)]
    assert all(a < b for a, b in zip(vals, vals[1:])), vals
    # notebook cell-2 numeric spot check: gate error at 10 dB
    e = analysis.analytical_gate_error(10.0, 2)
    assert 0 < e < 0.1
