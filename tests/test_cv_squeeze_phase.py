"""CV S (squeezing) and Phase (rotation) gates — capability upgrades over the
reference's NotImplementedError stubs (reference cv gates.py:249-269)."""

import numpy as np
import jax.numpy as jnp

from quantum_computations_tpu.cv import MPS, State, gates as cvg

QS = np.linspace(-18, 18, 360)
DQ = (QS[-1] - QS[0]) / (len(QS) - 1)


def _single(state_vec):
    return MPS(QS, [jnp.asarray(state_vec)])


def _mode(mps):
    return np.asarray(mps[0][0, :, 0])


def _norm(psi):
    return float(np.sqrt(np.sum(np.abs(psi) ** 2) * DQ))


def _var_q(psi):
    p = np.abs(psi) ** 2 * DQ
    p = p / p.sum()
    mean = float(np.sum(QS * p))
    return float(np.sum((QS - mean) ** 2 * p))


def test_phase_half_pi_is_fourier():
    mps_a = _single(State.VACUUM.eval(QS))
    cvg.X(0, 1.3).apply(mps_a)  # displaced vacuum: asymmetric test state
    mps_b = MPS(QS, [mps_a[0]])
    cvg.Phase(0, np.pi / 2).apply(mps_a)
    cvg.F(0).apply(mps_b)
    overlap = abs(np.vdot(_mode(mps_b), _mode(mps_a))) * DQ
    assert overlap > 0.999, overlap


def test_phase_identity_parity_and_composition():
    vac = np.asarray(State.VACUUM.eval(QS))
    disp = np.roll(vac, int(round(2.0 / DQ)))  # peak at q≈+2

    mps = _single(disp)
    cvg.Phase(0, 0.0).apply(mps)
    assert np.allclose(_mode(mps), disp)

    cvg.Phase(0, np.pi).apply(mps)  # parity: peak moves to q≈-2
    peak = QS[np.argmax(np.abs(_mode(mps)))]
    assert abs(peak + 2.0) < 0.2, peak

    # composition: two quarter turns == parity-from-start
    mps2 = _single(disp)
    cvg.Phase(0, np.pi / 4).apply(mps2)
    cvg.Phase(0, np.pi / 4).apply(mps2)
    cvg.Phase(0, np.pi / 2).apply(mps2)
    overlap = abs(np.vdot(_mode(mps), _mode(mps2))) * DQ
    assert overlap > 0.995, overlap
    assert abs(_norm(_mode(mps2)) - 1.0) < 1e-3


def test_phase_dagger_inverts():
    mps = _single(State.VACUUM.eval(QS))
    cvg.X(0, 1.0).apply(mps)
    start = _mode(mps).copy()
    cvg.Phase(0, 0.7).apply(mps)
    cvg.Phase(0, 0.7, dagger=True).apply(mps)
    overlap = abs(np.vdot(start, _mode(mps))) * DQ
    assert overlap > 0.999, overlap


def test_squeeze_vacuum_matches_analytic_gaussian():
    for r in (0.5, -0.5):
        mps = _single(State.VACUUM.eval(QS))
        cvg.S(0, r).apply(mps)
        out = _mode(mps)
        expected = np.pi ** -0.25 * np.exp(r / 2) * np.exp(-np.exp(2 * r) * QS**2 / 2)
        err = np.max(np.abs(np.abs(out) - expected))
        assert err < 2e-3, (r, err)
        assert abs(_norm(out) - 1.0) < 1e-3


def test_squeeze_variances_both_axes():
    half = 0.5  # vacuum q variance
    r = 0.6
    mps = _single(State.VACUUM.eval(QS))
    cvg.S(0, r).apply(mps)  # squeeze q: Var(q) -> e^{-2r}/2
    assert abs(_var_q(_mode(mps)) - half * np.exp(-2 * r)) < 0.01

    mps = _single(State.VACUUM.eval(QS))
    cvg.S(0, r, np.pi / 2).apply(mps)  # squeeze p: Var(q) -> e^{+2r}/2
    assert abs(_var_q(_mode(mps)) - half * np.exp(2 * r)) < 0.02


def test_squeeze_dagger_inverts():
    mps = _single(State.VACUUM.eval(QS))
    cvg.X(0, 0.8).apply(mps)
    start = _mode(mps).copy()
    cvg.S(0, 0.7, 0.3).apply(mps)
    cvg.S(0, 0.7, 0.3, dagger=True).apply(mps)
    overlap = abs(np.vdot(start, _mode(mps))) * DQ
    assert overlap > 0.998, overlap
