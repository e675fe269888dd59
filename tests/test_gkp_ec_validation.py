"""Steane-EC validation-suite tests (the reference's numerical_tests.ipynb as code)."""

import pytest

from quantum_computations_tpu.pipelines.gkp_ec_validation import (
    gaussian_product_identity_check, steane_ec_width_test,
)


def test_gaussian_product_identity():
    assert gaussian_product_identity_check(samples=25) == 0


def test_steane_ec_width_matches_analytic():
    res = steane_ec_width_test(epsilon_in=0.1, epsilon_ancilla=0.08, grid_points=800)
    assert abs(res["numeric_q"] - res["analytic_q"]) / res["analytic_q"] < 0.05
    assert abs(res["numeric_p"] - res["analytic_p"]) / res["analytic_p"] < 0.05


def test_steane_ec_width_other_params():
    res = steane_ec_width_test(epsilon_in=0.05, epsilon_ancilla=0.1, grid_points=800)
    assert abs(res["numeric_q"] - res["analytic_q"]) / res["analytic_q"] < 0.06


# ---------------------------------------------------------------------------
# figures.ipynb experiments (reference performance_analysis figures cells 2-12)
# ---------------------------------------------------------------------------

def test_knill_steane_equivalence():
    from quantum_computations_tpu.pipelines.gkp_ec_validation import (
        knill_steane_equivalence_check,
    )
    res = knill_steane_equivalence_check(grid_points=700)
    # The two circuits are mathematically identical maps for the same
    # post-selected results; differences are pure grid/interp error.
    assert res["rel_wigner_diff"] < 1e-4, res
    assert res["overlap"] > 1 - 1e-6, res


@pytest.mark.slow
def test_imperfect_p_gate_fidelity_recovery():
    from quantum_computations_tpu.pipelines.gkp_ec_validation import (
        imperfect_p_gate_experiment,
    )
    res = imperfect_p_gate_experiment(grid_points=600)
    assert res["after_gate"] < res["initial"] - 0.005, res
    assert res["after_projection"] > res["initial"] - 0.001, res


@pytest.mark.slow
def test_imperfect_cx_gate_fidelity_recovery():
    from quantum_computations_tpu.pipelines.gkp_ec_validation import (
        imperfect_cx_gate_experiment,
    )
    res = imperfect_cx_gate_experiment(grid_points=400)
    assert res["after_gate"] < res["initial"] - 0.02, res
    assert res["after_projection"] > res["initial"] - 0.005, res


@pytest.mark.slow
def test_bell_state_comparison_favors_qunaught():
    from quantum_computations_tpu.pipelines.gkp_ec_validation import (
        bell_state_comparison,
    )
    res = bell_state_comparison(grid_points=400)
    # an unentangled qunaught product has no logical Bell fidelity; the
    # beamsplitter creates it, and beats the CX-on-GKP construction
    assert res["qunaught_bell"] > res["qunaught_before"] + 0.3, res
    assert res["qunaught_bell"] > res["gkp_bell"] + 0.05, res
    assert res["gkp_bell"] < res["gkp_before"], res
