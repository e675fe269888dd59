"""CV engine tests: states vs mpmath, MPS container, gates, end-to-end EC circuit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from mpmath import jtheta

from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.cv import MPS, Simulator, State, gates as cvg
from quantum_computations_tpu.cv import states as cvs

QS = np.linspace(-20, 20, 500)
DQ = (QS[-1] - QS[0]) / (len(QS) - 1)


def mp_gkp_sym(q, epsilon, state=(1, 0)):
    """Independent mpmath evaluation of the symmetric GKP wavefunction."""
    def mtheta(a, b, z, tau):
        pre = np.exp(np.pi * 1j * tau * a**2 + 2j * np.pi * a * (z + b))
        return pre * complex(jtheta(3, np.pi * (z + a * tau + b), np.exp(1j * np.pi * tau)))
    tau = 1j * np.tanh(epsilon) / 2
    out = np.zeros_like(q, dtype=complex)
    for i, qi in enumerate(q):
        env = np.exp(-np.tanh(epsilon) * qi**2 / 2)
        tot = sum(c * mtheta(0, mu / 2, -qi / (2 * np.sqrt(np.pi) * np.cosh(epsilon)), tau)
                  for mu, c in enumerate(state))
        out[i] = env * tot
    return out


def db2eps(db):
    return 2.0 * np.arctanh(np.float_power(10.0, -db / 10.0) / 2.0)


@pytest.mark.parametrize("db", [6.0, 12.0])
def test_gkp_state_matches_mpmath(db):
    eps = db2eps(db)
    got = np.asarray(State.GKP_ZERO.eval(QS, eps))
    want = mp_gkp_sym(QS, eps, (1, 0))
    want = want / np.sqrt(np.sum(np.abs(want) ** 2) * DQ)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_fourier_is_gkp_hadamard():
    # The Fourier gate acts as Hadamard on the GKP codespace: F|+> ~ |0>.
    eps = db2eps(10.0)
    plus = State.GKP_PLUS.eval(QS, eps)
    zero = State.GKP_ZERO.eval(QS, eps)
    mps = MPS(QS, [plus])
    cvg.F(0).apply(mps)
    overlap = np.abs(np.vdot(np.asarray(zero), np.asarray(mps[0][0, :, 0])) * DQ)
    assert overlap > 0.99


def test_vacuum_normalised_and_fourier_invariant():
    vac = State.VACUUM.eval(QS)
    assert np.isclose(np.sum(np.abs(np.asarray(vac)) ** 2) * DQ, 1.0, atol=1e-6)
    mps = MPS(QS, [vac])
    cvg.F(0).apply(mps)
    np.testing.assert_allclose(np.asarray(mps[0][0, :, 0]), np.asarray(vac), atol=1e-5)


def test_mps_norm_product_state():
    vac = State.VACUUM.eval(QS)
    mps = MPS(QS, [vac, vac, vac])
    assert np.isclose(float(mps.norm()), 1.0, atol=1e-6)


def test_partial_density_diagonal_is_position_distribution():
    vac = np.asarray(State.VACUUM.eval(QS))
    mps = MPS(QS, [vac, vac])
    rho = np.asarray(mps.partial_density_mps(0))
    np.testing.assert_allclose(np.diag(rho).real, np.abs(vac) ** 2, atol=1e-6)


def test_insert_middle_and_edges():
    vac = State.VACUUM.eval(QS)
    mps = MPS(QS, [vac, vac])
    key = jax.random.PRNGKey(0)
    cvg.Insert(1, State.VACUUM).apply(mps, key=key, svd_options=SVDOptions(max_bond_dim=8))
    assert len(mps) == 3
    assert np.isclose(float(mps.norm()), 1.0, atol=1e-5)
    cvg.Insert(0, State.VACUUM).apply(mps, key=key)
    cvg.Insert(4, State.VACUUM).apply(mps, key=key)
    assert len(mps) == 5
    mps.validate()


@pytest.mark.slow
def test_bs_on_two_vacua_is_identity():
    # Beam splitter leaves |vac,vac> invariant.
    vac = State.VACUUM.eval(QS)
    mps = MPS(QS, [vac, vac])
    cvg.BS(0, 1).apply(mps, key=jax.random.PRNGKey(0), svd_options=SVDOptions(max_bond_dim=16))
    assert np.isclose(float(mps.norm()), 1.0, atol=1e-3)
    rho = np.asarray(mps.partial_density_mps(0))
    # tolerance limited by the bilinear resampling error of the BS kernel
    np.testing.assert_allclose(np.diag(rho).real, np.abs(np.asarray(vac)) ** 2, atol=2e-3)


def test_displacements():
    vac = np.asarray(State.VACUUM.eval(QS))
    mps = MPS(QS, [jnp.asarray(vac)])
    cvg.X(0, 2.0).apply(mps)
    shifted = np.asarray(mps[0][0, :, 0])
    # peak moves from 0 to +2
    assert abs(QS[np.argmax(np.abs(shifted))] - 2.0) < 0.1
    # Z displacement adds a linear phase only: |psi| unchanged
    mps2 = MPS(QS, [jnp.asarray(vac)])
    cvg.Z(0, 1.3).apply(mps2)
    np.testing.assert_allclose(np.abs(np.asarray(mps2[0][0, :, 0])), np.abs(vac), atol=1e-7)


@pytest.mark.slow
def test_cz_creates_correlation_and_truncates():
    eps = db2eps(10.0)
    zero = State.GKP_ZERO.eval(QS, eps)
    mps = MPS(QS, [zero, zero])
    cvg.CZ(0, 1).apply(mps, key=jax.random.PRNGKey(3), svd_options=SVDOptions(max_bond_dim=32, rel_err=1e-2))
    assert np.isclose(float(mps.norm()), 1.0, atol=1e-2)
    assert mps[0].shape[2] <= 32


def test_mq_collapses_and_removes_mode():
    vac = State.VACUUM.eval(QS)
    mps = MPS(QS, [vac, vac])
    res = cvg.Mq(0).apply(mps, key=jax.random.PRNGKey(7))
    assert len(mps) == 1
    # measured position should be within a few std-devs of 0
    assert abs(float(res.result)) < 4.0
    assert np.isclose(float(mps.norm()), 1.0, atol=1e-4)


def test_mq_post_selection():
    vac = State.VACUUM.eval(QS)
    mps = MPS(QS, [vac, vac])
    res = cvg.Mq(0, result=0.5).apply(mps, key=None)
    assert abs(float(res.result) - 0.5) < DQ
    # probability density at the snapped grid point for the vacuum
    q = float(res.result)
    assert np.isclose(float(res.probability), np.pi**-0.5 * np.exp(-q * q), atol=1e-3)


def test_homodyne_angle_pi_flips_sign():
    vac = State.VACUUM.eval(QS)
    mps = MPS(QS, [vac, vac])
    res = cvg.Homodyne(0, np.pi, result=0.5).apply(mps, key=None)
    assert np.isclose(float(res.result), -0.5, atol=2 * DQ)


def test_simulator_quadrature_correction_runs():
    """End-to-end: the reference cv_circuits.quadrature_correction snippet."""
    eps = db2eps(10.0)
    circ = [
        cvg.Insert(1, State.GKP_ZERO, gkp_epsilon=eps),
        cvg.CZ(0, 1),
        cvg.Mp(1),
    ]
    sim = Simulator(circ, rng_seed=11, svd_options={"max_bond_dim": 32, "rel_err": 1e-2})
    init = MPS(QS, [State.GKP_PLUS.eval(QS, eps)])
    out = sim.run(init)
    assert len(out) == 1
    assert len(sim.results) == 1
    assert np.isclose(float(out.norm()), 1.0, atol=1e-2)


def test_simulator_deterministic_under_seed():
    eps = db2eps(8.0)
    def run(seed):
        circ = [cvg.Insert(1, State.GKP_ZERO, gkp_epsilon=eps), cvg.CZ(0, 1), cvg.Mp(1)]
        sim = Simulator(circ, rng_seed=seed, svd_options={"max_bond_dim": 16, "rel_err": 1e-2})
        out = sim.run(MPS(QS, [State.GKP_PLUS.eval(QS, eps)]))
        return float(sim.results[0].result)
    assert run(5) == run(5)
