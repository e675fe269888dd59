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
