"""CV circuit snippet tests (reference cv_circuits.py parity)."""

import numpy as np
import pytest

from quantum_computations_tpu.cv import MPS, Simulator, State
from quantum_computations_tpu.gkp import db2eps, full_logical_density_mps
from quantum_computations_tpu.pipelines import cv_circuits as ccs
from quantum_computations_tpu.dv import qop
import jax.numpy as jnp

QS = np.linspace(-20, 20, 400)
EPS = db2eps(10.0)
SVD = {"max_bond_dim": 16, "rel_err": 1e-2}


@pytest.mark.slow
def test_quadrature_correction_preserves_logical_state():
    circ = ccs.quadrature_correction(EPS)
    sim = Simulator(circ, rng_seed=2, svd_options=SVD)
    out = sim.run(MPS(QS, [State.GKP_ZERO.eval(QS, EPS)]))
    assert len(out) == 1
    rho = np.asarray(full_logical_density_mps(out, normalised=True))
    # Z-information survives quadrature correction up to X-syndromes:
    # state stays in the {|0>,|1>} mixture with strong |0> weight or |1> weight
    assert rho[0, 0].real + rho[1, 1].real > 0.95


def test_steane_error_correction_runs():
    circ = ccs.steane_error_correction(EPS)
    sim = Simulator(circ, rng_seed=4, svd_options=SVD)
    out = sim.run(MPS(QS, [State.GKP_PLUS.eval(QS, EPS)]))
    assert len(out) == 1
    assert len(sim.results) == 2
    assert np.isfinite(float(out.norm()))


def test_bell_qunaught_creates_correlations():
    circ = ccs.bell_qunaught(EPS)
    sim = Simulator(circ, rng_seed=5, svd_options=SVD)
    out = sim.run(MPS(QS, []))
    assert len(out) == 2
    rho = np.asarray(full_logical_density_mps(out, normalised=True))
    bell = np.zeros(4)
    bell[0] = bell[3] = 2**-0.5
    fid = float(qop.fidelity(jnp.asarray(bell), jnp.asarray(rho)))
    assert fid > 0.8, fid
