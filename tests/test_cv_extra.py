"""Remaining CV/GKP surface: CX shear, D gate, Mp, SimulatorAlt."""

import numpy as np
import jax
import pytest

from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.cv import MPS, State, gates as cvg
from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
from quantum_computations_tpu.gkp import (
    MBGKPCircuit, SimulatorAlt, db2eps, full_logical_density_mps, parse_to_mps,
    syndrome_matrix,
)
import jax.numpy as jnp

QS = np.linspace(-18, 18, 360)
DQ = (QS[-1] - QS[0]) / (len(QS) - 1)
SVD = {"max_bond_dim": 12, "rel_err": 1e-2}


@pytest.mark.slow
def test_cx_displaces_target_by_control():
    # |q1 ~ 2> control, vacuum target: CX shifts target to ~ +2.
    vac = np.asarray(State.VACUUM.eval(QS))
    ctrl = np.roll(vac, int(round(2.0 / DQ)))  # coherent-ish state at q=2
    mps = MPS(QS, [jnp.asarray(ctrl), jnp.asarray(vac)])
    cvg.CX(0, 1).apply(mps, key=jax.random.PRNGKey(0), svd_options=SVDOptions(**SVD))
    rho = np.asarray(mps.partial_density_mps(1))
    peak = QS[np.argmax(np.diag(rho).real)]
    assert abs(peak - 2.0) < 0.3, peak


def test_d_gate_combines_displacements():
    vac = State.VACUUM.eval(QS)
    mps = MPS(QS, [vac])
    cvg.D(0, [1.5, 0.7]).apply(mps)
    out = np.asarray(mps[0][0, :, 0])
    peak = QS[np.argmax(np.abs(out))]
    assert abs(peak - 1.5) < 0.2
    # dagger inverts
    cvg.D(0, [1.5, 0.7], dagger=True).apply(mps)
    out2 = np.asarray(mps[0][0, :, 0])
    overlap = abs(np.vdot(np.asarray(vac), out2)) * DQ
    assert overlap > 0.98


@pytest.mark.slow
def test_mp_measures_momentum():
    # Momentum-squeezed state: Mp results concentrate near 0.
    eps = db2eps(10.0)
    plus = State.GKP_PLUS.eval(QS, eps)
    results = []
    for seed in range(4):
        mps = MPS(QS, [plus, State.VACUUM.eval(QS)])
        res = cvg.Mp(1).apply(mps, key=jax.random.PRNGKey(seed))
        results.append(float(res.result))
        assert len(mps) == 1
    assert np.std(results) < 3.0  # vacuum p-distribution has std ~ 1/sqrt(2)


@pytest.mark.slow
def test_simulator_alt_exact_hadamard():
    """SimulatorAlt applies H as an exact Fourier (no EC gadget)."""
    eps = db2eps(10.0)
    circuit = [dvg.H(0), dvg.P(0)]
    circ = MBGKPCircuit.transpile(circuit, 1)
    circ.fill()
    sim = SimulatorAlt(circ, eps, rng_seed=1, svd_options=SVD)
    mps, syndromes = sim.run(parse_to_mps([DVState.ZERO], eps, QS))
    rho = np.asarray(full_logical_density_mps(mps))
    corr = np.asarray(syndrome_matrix(syndromes))
    rho = corr @ rho @ corr.conj().T
    rho = rho / np.trace(rho)
    want = np.asarray(DVSimulator(circuit).run([DVState.ZERO]))
    fid = float(qop.fidelity(jnp.asarray(want), jnp.asarray(rho)))
    assert fid > 0.85, fid
