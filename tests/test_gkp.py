"""GKP engine tests: logical readout, Bell insertion, MB gadgets, full simulator."""

import numpy as np
import jax
import pytest
from itertools import product as iprod

from quantum_computations_tpu.cv import MPS, State as CVState
from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
from quantum_computations_tpu.gkp import (
    GKPBellState, InsertBell, MBGKPCircuit, MBI, Simulator as GKPSimulator,
    db2eps, eps2db, full_logical_density_mps, parse_to_mps, syndrome_matrix,
)
from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.cv.simulator import Simulator as CVSimulator

QS = np.linspace(-20, 20, 500)
EPS = db2eps(10.0)
SVD = {"max_bond_dim": 24, "rel_err": 1e-2}


def reference_logical_density(mps: MPS) -> np.ndarray:
    """Independent 4^N-loop implementation of the Shaw et al. readout
    (mirrors reference gkp utils.py:42-96 semantics in plain numpy)."""
    qs = np.asarray(mps.domain)
    dq = (qs[-1] - qs[0]) / len(qs)
    qd = qs[:, None] - qs[None, :]
    SQPI = np.sqrt(np.pi)
    Im = np.identity(len(qs))
    Xm = np.zeros((len(qs), len(qs)))
    Zm = np.zeros((len(qs), len(qs)))
    for n, m in enumerate(range(1, int((qs[-1] - qs[0]) / SQPI) + 1, 2)):
        coeff = (-1) ** (n % 2) * 2 / (m * np.pi)
        Xm += coeff * (np.sinc((qd - m * SQPI) / dq) + np.sinc((qd + m * SQPI) / dq))
        Zm += coeff * np.diag(2 * np.cos(SQPI * m * qs))
    Ym = 1j * Xm @ Zm
    Pms = [Im, Xm, Ym, Zm]
    Ps = [np.eye(2), np.array([[0, 1], [1, 0]]), np.array([[0, -1j], [1j, 0]]),
          np.array([[1, 0], [0, -1]])]
    N = len(mps)
    tensors = [np.asarray(t) for t in mps]
    rho = np.zeros((2**N, 2**N), dtype=complex)
    for index in iprod(*[[0, 1, 2, 3]] * N):
        coeff = np.ones((1, 1))
        for i, m in zip(index, tensors):
            coeff = np.einsum("ab,aci,bdj,dc->ij", coeff, m, np.conj(m), Pms[i], optimize=True)
        coeff = coeff[0, 0] * (dq / 2) ** N
        pauli = 1
        for i in index:
            pauli = np.kron(pauli, Ps[i])
        rho = rho + coeff * pauli
    return rho


def test_db_eps_roundtrip():
    for db in [5.0, 9.17, 15.0]:
        assert np.isclose(eps2db(db2eps(db)), db, atol=1e-10)


def test_logical_density_of_encoded_states():
    for cv_state, ket in [
        (CVState.GKP_ZERO, np.array([1.0, 0.0])),
        (CVState.GKP_PLUS, np.array([1.0, 1.0]) / np.sqrt(2)),
        (CVState.GKP_T, np.array([1.0, np.exp(1j * np.pi / 4)]) / np.sqrt(2)),
    ]:
        mps = MPS(QS, [cv_state.eval(QS, EPS)])
        rho = np.asarray(full_logical_density_mps(mps, normalised=True))
        fid = float(qop.fidelity(jax.numpy.asarray(ket), jax.numpy.asarray(rho)))
        assert fid > 0.98, (cv_state, fid)


def test_fast_readout_matches_4N_loop():
    # two-mode entangled state via Bell insertion
    bell = GKPBellState.PLUS.eval(QS, EPS)
    got = np.asarray(full_logical_density_mps(bell))
    want = reference_logical_density(bell)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_bell_state_is_logical_bell():
    bell = GKPBellState.PLUS.eval(QS, EPS)
    rho = np.asarray(full_logical_density_mps(bell, normalised=True))
    bell_ket = np.zeros(4)
    bell_ket[0] = bell_ket[3] = 2**-0.5
    fid = float(qop.fidelity(jax.numpy.asarray(bell_ket), jax.numpy.asarray(rho)))
    assert fid > 0.95


@pytest.mark.slow
def test_insert_bell_mid_chain():
    zero = CVState.GKP_ZERO.eval(QS, EPS)
    mps = MPS(QS, [zero, zero])
    InsertBell(1, gkp_epsilon=EPS).apply(
        mps, key=jax.random.PRNGKey(0), svd_options=SVDOptions(**SVD)
    )
    assert len(mps) == 4
    mps.validate()
    # logical state ~ |0> Bell |0>
    rho = np.asarray(full_logical_density_mps(mps, normalised=True))
    want = np.zeros(16)
    want[0b0000] = want[0b0110] = 2**-0.5
    fid = float(qop.fidelity(jax.numpy.asarray(want), jax.numpy.asarray(rho)))
    assert fid > 0.9


def test_mbi_error_correction_preserves_logical_state():
    """Knill EC gadget (MBI) preserves |0>_gkp up to a tracked syndrome."""
    mps = MPS(QS, [CVState.GKP_ZERO.eval(QS, EPS)])
    gadget = MBI(0, epsilon=EPS)
    sim = CVSimulator(gadget.compile(), rng_seed=3, svd_options=SVD)
    out = sim.run(mps)
    assert len(out) == 1
    syndromes, indices = gadget.compute_syndrome([r.result for r in sim.results])
    (x, z), = [(int(a), int(b)) for a, b in syndromes]
    rho = np.asarray(full_logical_density_mps(out, normalised=True))
    corr = np.asarray(syndrome_matrix([(x, z)]))
    rho = corr @ rho @ corr.conj().T
    fid = float(qop.fidelity(jax.numpy.asarray(np.array([1.0, 0.0])), jax.numpy.asarray(rho)))
    assert fid > 0.9, (fid, (x, z))


def run_gkp(circuit, init, seed):
    gkp_circ = MBGKPCircuit.transpile(circuit)
    gkp_circ.fill()
    sim = GKPSimulator(gkp_circ, ancilla_epsilon=EPS, rng_seed=seed, svd_options=SVD)
    mps, syndromes = sim.run(parse_to_mps(init, EPS, QS))
    rho = np.asarray(full_logical_density_mps(mps))
    corr = np.asarray(syndrome_matrix(syndromes))
    rho = corr @ rho @ corr.conj().T
    return rho / np.trace(rho)


@pytest.mark.parametrize("seed", [0, 1])
def test_gkp_simulator_single_qubit_vs_dv(seed):
    """The RB self-consistency pattern: GKP/CV path vs exact DV path."""
    circuit = [dvg.H(0), dvg.P(0)]
    init = [DVState.ZERO]
    rho = run_gkp(circuit, init, seed)
    want = np.asarray(DVSimulator(circuit).run([DVState.ZERO]))
    fid = float(qop.fidelity(jax.numpy.asarray(want), jax.numpy.asarray(rho)))
    assert fid > 0.9, fid


@pytest.mark.slow
def test_gkp_simulator_two_qubit_vs_dv():
    circuit = [dvg.H(0), dvg.CZ(0, 1), dvg.H(1)]
    init = [DVState.ZERO, DVState.ZERO]
    rho = run_gkp(circuit, init, 7)
    want = np.asarray(DVSimulator(circuit).run(init))
    fid = float(qop.fidelity(jax.numpy.asarray(want), jax.numpy.asarray(rho)))
    assert fid > 0.85, fid
