"""Fused single-mode gadget vs the eager exact-SVD gadget path.

The fused executor (ops/fused_gadget.py) must reproduce the conventional
Bell-insert + BS + two-homodyne sequence exactly (up to interpolation
convention) when the conventional path runs with NO truncation. Outcomes are
forced (post-selected) on both paths so states and probabilities compare
deterministically.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.cv import gates as cvg
from quantum_computations_tpu.cv.mps import MPS
from quantum_computations_tpu.cv.states import State as CVState
from quantum_computations_tpu.gkp import db2eps
from quantum_computations_tpu.gkp.compiled import _insert_bell
from quantum_computations_tpu.ops import interp
from quantum_computations_tpu.ops.fused_gadget import (fused_pair_measure2,
                                                       fused_single_gadget)

QS = np.linspace(-10.0, 10.0, 160)
EPS = db2eps(8.0)
EXACT = SVDOptions(max_bond_dim=4096, rel_err=0.0, abs_err=0.0)
KEY = jax.random.PRNGKey(7)


def _bell(c1=1.0):
    zero = CVState.GKP_ZERO.eval(jnp.asarray(QS), EPS)
    one = CVState.GKP_ONE.eval(jnp.asarray(QS), EPS)
    return jnp.stack([2 ** (-1 / 4) * zero, 2 ** (-1 / 4) * c1 * one], axis=-1)


def _entangled_chain():
    """Two GKP modes entangled by an exact CZ (moderate bond truncation is
    fine — both paths start from the SAME chain)."""
    plus = CVState.GKP_PLUS.eval(jnp.asarray(QS), EPS).reshape(1, -1, 1)
    zero = CVState.GKP_ZERO.eval(jnp.asarray(QS), EPS).reshape(1, -1, 1)
    mps = MPS(QS, [plus, zero])
    cvg.CZ(0, 1).apply(mps, key=KEY,
                       svd_options=SVDOptions(max_bond_dim=24, rel_err=1e-8))
    return mps.tensors


def _eager_gadget(tensors, idx, a1, a2, i_f, j_f):
    """Reference path: exact-SVD Bell insert + BS + two forced homodynes."""
    mps = MPS(QS, list(tensors))
    _insert_bell(mps, idx + 1, 1.0, EPS, EXACT, KEY)
    cvg.BS(idx, idx + 1).apply(mps, key=KEY, svd_options=EXACT)
    if a1 != 0.0:
        mps[idx] = interp.rotation(jnp.asarray(QS), mps[idx], -a1, axis=1)
    rho1 = np.clip(np.asarray(mps.partial_density_mps(idx)).diagonal().real, 0, None)
    r1 = cvg.Mq(idx, result=float(QS[i_f])).apply(mps, key=KEY)
    mps[idx] = interp.rotation(jnp.asarray(QS), mps[idx], -a2, axis=1)
    rho2 = np.clip(np.asarray(mps.partial_density_mps(idx)).diagonal().real, 0, None)
    r2 = cvg.Mq(idx, result=float(QS[j_f])).apply(mps, key=KEY)
    return mps, (float(r1.probability), float(r2.probability)), (rho1, rho2)


def _dense(tensors):
    """Contract a short chain to a dense vector."""
    res = jnp.asarray(tensors[0])
    for t in tensors[1:]:
        res = jnp.tensordot(res, jnp.asarray(t), axes=(res.ndim - 1, 0))
    return np.asarray(res).reshape(-1)


@pytest.mark.parametrize("idx,a1,a2", [
    (0, 0.0, np.pi / 2),            # identity/P-family gadget on the left mode
    (1, 0.0, float(np.arctan(2))),  # P gadget on the right mode
    (0, np.pi / 4, -np.pi / 4),     # Hadamard gadget angles
])
def test_fused_matches_eager_exact(idx, a1, a2):
    tensors = _entangled_chain()

    # choose outcomes at the eager distribution's mass so probabilities are
    # well away from underflow
    probe = _eager_gadget(tensors, idx, a1, a2, 0, 0)
    i_f = int(np.argmax(probe[2][0]))
    probe = _eager_gadget(tensors, idx, a1, a2, i_f, 0)
    j_f = int(np.argmax(probe[2][1]))

    eager_mps, (p1_e, p2_e), (rho1_e, _) = _eager_gadget(
        tensors, idx, a1, a2, i_f, j_f)
    fused_tensors, m1, m2, diag = fused_single_gadget(
        list(tensors), idx, QS, _bell(), a1, a2, KEY, force=(i_f, j_f),
        diagnostics=True)

    assert np.isclose(float(m1), QS[i_f]) and np.isclose(float(m2), QS[j_f])

    # first-homodyne distribution agrees with the exact-SVD partial density
    rho1_f = np.asarray(diag["rho1"])
    scale = max(rho1_e.max(), 1e-30)
    np.testing.assert_allclose(rho1_f / scale, rho1_e / scale, atol=2e-4)

    assert np.isclose(float(diag["p1"]), p1_e, rtol=2e-4, atol=1e-9)
    assert np.isclose(float(diag["p2"]), p2_e, rtol=5e-4, atol=1e-9)

    # final collapsed chains agree (the fused output replaces the input mode
    # in place; the eager chain has the same mode count after two collapses)
    assert len(fused_tensors) == len(eager_mps.tensors)
    v_e, v_f = _dense(eager_mps.tensors), _dense(fused_tensors)
    assert v_e.shape == v_f.shape
    # States must match up to a GLOBAL phase: the rotation kernel
    # (ops/interp.rotation) omits the Namias theta-dependent scalar phase, and
    # the fused path composes a different rotation sequence
    # (R(-a1) (x) R(-a1) then R(a1-a2)) than the eager path (R(-a1), R(-a2)),
    # so the two trajectories differ by a constant phase for a1 != 0.
    # Physically irrelevant: readout is a density matrix.
    overlap = np.vdot(v_e, v_f)
    n_e, n_f = np.linalg.norm(v_e), np.linalg.norm(v_f)
    assert abs(overlap) / (n_e * n_f) > 1 - 1e-6
    v_f = v_f * np.exp(-1j * np.angle(overlap))
    np.testing.assert_allclose(v_f, v_e, atol=5e-4 * np.abs(v_e).max())


def test_fused_output_shape_preserved():
    tensors = _entangled_chain()
    out, _, _ = fused_single_gadget(list(tensors), 0, QS, _bell(), 0.0,
                                    np.pi / 2, KEY)
    assert [t.shape for t in out] == [t.shape for t in tensors]


def _eager_pair(tensors, m, a1, a2, i_f, j_f):
    """Reference for the generic pair measure: exact BS + two forced Mq."""
    mps = MPS(QS, list(tensors))
    cvg.BS(m, m + 1).apply(mps, key=KEY, svd_options=EXACT)
    if a1 != 0.0:
        mps[m] = interp.rotation(jnp.asarray(QS), mps[m], -a1, axis=1)
    rho1 = np.clip(np.asarray(mps.partial_density_mps(m)).diagonal().real, 0, None)
    r1 = cvg.Mq(m, result=float(QS[i_f])).apply(mps, key=KEY)
    if a2 != 0.0:
        mps[m] = interp.rotation(jnp.asarray(QS), mps[m], -a2, axis=1)
    rho2 = np.clip(np.asarray(mps.partial_density_mps(m)).diagonal().real, 0, None)
    r2 = cvg.Mq(m, result=float(QS[j_f])).apply(mps, key=KEY)
    return mps, (float(r1.probability), float(r2.probability)), (rho1, rho2)


def _four_mode_chain():
    """[plus, zero, plus, zero] entangled by two exact CZs — a stand-in for
    the macronode's chain right before its third beamsplitter."""
    states = [CVState.GKP_PLUS, CVState.GKP_ZERO, CVState.GKP_PLUS, CVState.GKP_ZERO]
    mps = MPS(QS, [s.eval(jnp.asarray(QS), EPS).reshape(1, -1, 1) for s in states])
    opts = SVDOptions(max_bond_dim=16, rel_err=1e-8)
    cvg.CZ(0, 1).apply(mps, key=KEY, svd_options=opts)
    cvg.CZ(2, 3).apply(mps, key=KEY, svd_options=opts)
    cvg.CZ(1, 2).apply(mps, key=KEY, svd_options=opts)
    return mps.tensors


@pytest.mark.slow  # the exact-SVD eager reference takes ~2.5 min per case
@pytest.mark.parametrize("m,a1,a2", [
    (1, 0.0, float(np.arctan(2))),                    # a1 = 0 fast path
    (1, -np.pi / 2, 0.0),                             # SWAP first pair (kernel path)
    (1, float(np.arctan(2)), -float(np.arctan(2))),   # CZ second pair (kernel path)
])
def test_fused_pair_matches_eager_exact(m, a1, a2):
    tensors = _four_mode_chain()

    probe = _eager_pair(tensors, m, a1, a2, 0, 0)
    i_f = int(np.argmax(probe[2][0]))
    probe = _eager_pair(tensors, m, a1, a2, i_f, 0)
    j_f = int(np.argmax(probe[2][1]))

    eager_mps, (p1_e, p2_e), (rho1_e, _) = _eager_pair(tensors, m, a1, a2, i_f, j_f)
    # prerot=False: this test pins the EXACT-KERNEL discretisation against the
    # eager ground truth at tight tolerances; the prerot rewrite (default on)
    # has its own regression test with the adjudicated looser bounds below.
    fused_tensors, m1, m2, diag = fused_pair_measure2(
        list(tensors), m, QS, a1, a2, KEY, force=(i_f, j_f), diagnostics=True,
        prerot=False)

    assert np.isclose(float(m1), QS[i_f]) and np.isclose(float(m2), QS[j_f])
    if diag["swapped"]:
        # order-swapped path: individual marginals differ by measurement
        # order, but the JOINT density p1*p2 is order-invariant
        joint_f = float(diag["p1"]) * float(diag["p2"])
        np.testing.assert_allclose(joint_f, p1_e * p2_e, rtol=1e-3)
    else:
        rho1_f = np.asarray(diag["rho1"])
        scale = max(rho1_e.max(), 1e-30)
        np.testing.assert_allclose(rho1_f / scale, rho1_e / scale, atol=2e-4)
        assert np.isclose(float(diag["p1"]), p1_e, rtol=3e-4, atol=1e-9)
        assert np.isclose(float(diag["p2"]), p2_e, rtol=1e-3, atol=1e-9)

    assert len(fused_tensors) == len(eager_mps.tensors)
    v_e, v_f = _dense(eager_mps.tensors), _dense(fused_tensors)
    overlap = np.vdot(v_e, v_f)
    assert abs(overlap) / (np.linalg.norm(v_e) * np.linalg.norm(v_f)) > 1 - 1e-6
    v_f = v_f * np.exp(-1j * np.angle(overlap))
    np.testing.assert_allclose(v_f, v_e, atol=5e-4 * np.abs(v_e).max())


@pytest.mark.parametrize("grid_n", [160, 161])  # both parity classes of d-1
@pytest.mark.parametrize("m,a1,a2", [
    (1, 0.0, float(np.arctan(2))),   # a1 = 0 fast path
    (1, -np.pi / 2, 0.0),            # order-swapped path
])
def test_fused_pair_gram_matches_loop(grid_n, m, a1, a2):
    """The Gram-factorised correlation p1 pass (QCT_FUSED_PAIR_GRAM) is
    mathematically identical to the per-column loop — same distributions,
    probabilities and collapsed chain to FFT roundoff."""
    global QS
    qs_save = QS
    QS = np.linspace(-10.0, 10.0, grid_n)
    try:
        tensors = _four_mode_chain()
        swapped = a1 != 0.0 and abs(a2) < 1e-12

        def loop(force):
            return fused_pair_measure2(list(tensors), m, QS, a1, a2, KEY,
                                       force=force, gram=False,
                                       diagnostics=True)

        # walk the loop path's distributions to a well-supported outcome pair
        d0 = loop((0, 0))[3]
        s1 = int(np.argmax(np.asarray(d0["rho1"])))
        d1 = loop((0, s1) if swapped else (s1, 0))[3]
        s2 = int(np.argmax(np.asarray(d1["rho2"])))
        force = (s2, s1) if swapped else (s1, s2)

        out_l, m1_l, m2_l, dg_l = loop(force)
        out_g, m1_g, m2_g, dg_g = fused_pair_measure2(
            list(tensors), m, QS, a1, a2, KEY, force=force, gram=True,
            diagnostics=True)

        assert float(m1_g) == float(m1_l) and float(m2_g) == float(m2_l)
        scale = float(np.max(np.asarray(dg_l["rho1"])))
        np.testing.assert_allclose(np.asarray(dg_g["rho1"]) / scale,
                                   np.asarray(dg_l["rho1"]) / scale,
                                   atol=1e-7)
        np.testing.assert_allclose(float(dg_g["p1"]), float(dg_l["p1"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dg_g["rho2"]),
                                   np.asarray(dg_l["rho2"]), rtol=1e-6,
                                   atol=1e-10 * float(np.max(np.asarray(dg_l["rho2"]))))
        for tg, tl in zip(out_g, out_l):
            np.testing.assert_allclose(np.asarray(tg), np.asarray(tl),
                                       atol=1e-7 * max(1.0, float(np.max(np.abs(np.asarray(tl))))))
    finally:
        QS = qs_save


def test_fused_pair_gram_fallback_paths():
    """Non-45-degree BS and asymmetric grids must fall back to the loop (the
    correlation identity needs s == c and a lattice-symmetric grid)."""
    tensors = _four_mode_chain()
    # non-45 BS: gram=True must still give the loop result (fallback inside)
    out_g, m1g, m2g = fused_pair_measure2(
        list(tensors), 1, QS, 0.0, 0.3, KEY, bs_angle=np.pi / 3,
        force=(70, 90), gram=True)
    out_l, m1l, m2l = fused_pair_measure2(
        list(tensors), 1, QS, 0.0, 0.3, KEY, bs_angle=np.pi / 3,
        force=(70, 90), gram=False)
    assert float(m1g) == float(m1l) and float(m2g) == float(m2l)
    for tg, tl in zip(out_g, out_l):
        np.testing.assert_allclose(np.asarray(tg), np.asarray(tl), atol=1e-12)


def test_fused_engine_two_qubit_vs_dv():
    """Batched engine with fused pair measures matches DV on a CZ circuit."""
    from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
    from quantum_computations_tpu.gkp import MBGKPCircuit
    from quantum_computations_tpu.gkp.batched import BatchedGKP
    from quantum_computations_tpu.gkp.compiled import logical_coeffs

    gates = [dvg.H(0), dvg.CZ(0, 1)]
    circ = MBGKPCircuit.transpile(gates, 2)
    circ.fill()
    runner = BatchedGKP(np.linspace(-20, 20, 300), db2eps(10.0),
                        SVDOptions(max_bond_dim=8, rel_err=1e-2),
                        adaptive=True, granularity="op",
                        fused_single=True, fused_pair=True)
    coeffs = logical_coeffs([DVState.ZERO, DVState.ZERO])
    tensors, frames = runner.run_circuit(circ, coeffs, 3, rng_seed=9)
    assert any(k[0] == "fused_pair" for k in runner._cache)
    rho_re, rho_im = runner.readout(tensors, frames)
    rhos = np.asarray(rho_re) + 1j * np.asarray(rho_im)
    assert np.all(np.isfinite(rhos))
    want = np.asarray(DVSimulator(gates).run([DVState.ZERO, DVState.ZERO]))
    fids = [float(qop.fidelity(jnp.asarray(want), jnp.asarray(r))) for r in rhos]
    assert np.mean(fids) > 0.55, fids


@pytest.mark.slow
def test_fused_vs_unfused_statistics():
    """Fused and unfused engines must agree statistically on an RB-style
    workload (the fused paths remove truncation loss, so fused means may sit
    slightly HIGHER, within a few standard errors)."""
    from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
    from quantum_computations_tpu.gkp import MBGKPCircuit
    from quantum_computations_tpu.gkp.batched import BatchedGKP
    from quantum_computations_tpu.gkp.compiled import logical_coeffs

    gates = [dvg.H(0), dvg.CZ(0, 1), dvg.P(1), dvg.H(1)]
    circ = MBGKPCircuit.transpile(gates, 2)
    circ.fill()
    want = np.asarray(DVSimulator(gates).run([DVState.ZERO, DVState.ZERO]))
    coeffs = logical_coeffs([DVState.ZERO, DVState.ZERO])
    qs = np.linspace(-20, 20, 300)
    stats = {}
    for fused in (True, False):
        runner = BatchedGKP(qs, db2eps(10.0),
                            SVDOptions(max_bond_dim=8, rel_err=1e-2),
                            adaptive=True, granularity="op",
                            fused_single=fused, fused_pair=fused)
        fids = []
        for seed in range(3):
            tensors, frames = runner.run_circuit(circ, coeffs, 16, rng_seed=seed)
            rho_re, rho_im = runner.readout(tensors, frames)
            rhos = np.asarray(rho_re) + 1j * np.asarray(rho_im)
            fids += [float(qop.fidelity(jnp.asarray(want), jnp.asarray(r)))
                     for r in rhos]
        stats[fused] = (np.mean(fids), np.std(fids) / np.sqrt(len(fids)))
    (mu_f, se_f), (mu_u, se_u) = stats[True], stats[False]
    se = float(np.hypot(se_f, se_u))
    assert abs(mu_f - mu_u) < 4 * se + 0.05, stats
    assert mu_f > mu_u - 2 * se, stats  # fused must not be systematically worse


def test_fused_engine_swap_circuit_vs_dv():
    """SWAP macronode through the fused engine (order-swapped first pair)."""
    from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
    from quantum_computations_tpu.gkp import MBGKPCircuit
    from quantum_computations_tpu.gkp.batched import BatchedGKP
    from quantum_computations_tpu.gkp.compiled import logical_coeffs

    gates = [dvg.H(0), dvg.SWAP(0, 1)]
    circ = MBGKPCircuit.transpile(gates, 2)
    circ.fill()
    runner = BatchedGKP(np.linspace(-20, 20, 300), db2eps(10.0),
                        SVDOptions(max_bond_dim=8, rel_err=1e-2),
                        adaptive=True, granularity="op",
                        fused_single=True, fused_pair=True)
    coeffs = logical_coeffs([DVState.ZERO, DVState.ZERO])
    tensors, frames = runner.run_circuit(circ, coeffs, 3, rng_seed=2)
    rho_re, rho_im = runner.readout(tensors, frames)
    rhos = np.asarray(rho_re) + 1j * np.asarray(rho_im)
    assert np.all(np.isfinite(rhos))
    want = np.asarray(DVSimulator(gates).run([DVState.ZERO, DVState.ZERO]))
    fids = [float(qop.fidelity(jnp.asarray(want), jnp.asarray(r))) for r in rhos]
    assert np.mean(fids) > 0.55, fids


def test_fused_engine_single_qubit_vs_dv():
    """Batched engine with fused gadgets matches the DV simulator (fast,
    single-qubit H circuit)."""
    from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
    from quantum_computations_tpu.gkp import MBGKPCircuit
    from quantum_computations_tpu.gkp.batched import BatchedGKP
    from quantum_computations_tpu.gkp.compiled import logical_coeffs

    gates = [dvg.H(0), dvg.P(0)]
    circ = MBGKPCircuit.transpile(gates, 1)
    circ.fill()
    runner = BatchedGKP(np.linspace(-20, 20, 300), db2eps(10.0),
                        SVDOptions(max_bond_dim=8, rel_err=1e-2),
                        fused_single=True)
    assert runner.fused_single
    coeffs = logical_coeffs([DVState.ZERO])
    tensors, frames = runner.run_circuit(circ, coeffs, 4, rng_seed=11)
    assert any(k[0] == "fused_single" for k in runner._cache)
    rho_re, rho_im = runner.readout(tensors, frames)
    rhos = np.asarray(rho_re) + 1j * np.asarray(rho_im)
    assert np.all(np.isfinite(rhos))
    want = np.asarray(DVSimulator(gates).run([DVState.ZERO]))
    fids = [float(qop.fidelity(jnp.asarray(want), jnp.asarray(r))) for r in rhos]
    assert np.mean(fids) > 0.7, fids


@pytest.mark.parametrize("m,a1,a2", [
    (1, float(np.arctan(2)), -float(np.arctan(2))),   # CZ second pair
    (1, float(np.pi / 3), float(np.pi / 4)),          # generic angles
])
def test_fused_pair_prerot_matches_exact_kernel(m, a1, a2):
    """QCT_FUSED_EXACT_PREROT rewrites the exact-kernel pair path (both
    homodyne angles nonzero) into the Gram-eligible a1==0 path by the
    BS/rotation commute identity. Both are discretisations of the same
    continuum measurement; the commutator of the discretised frFT kernel
    with the band-limited line interpolation bounds their difference.
    Adjudicated vs the eager exact-SVD ground truth in
    benchmarks/prerot_accuracy_results.jsonl (state overlap deficit
    <= 2.7e-5, two orders below the production rel_err=1e-2 truncation);
    this pins the prerot-vs-exact gap as a fast regression test."""
    tensors = _four_mode_chain()

    out_e = fused_pair_measure2(list(tensors), m, QS, a1, a2, KEY,
                                force=(0, 0), diagnostics=True, prerot=False)
    i_f = int(np.argmax(np.asarray(out_e[3]["rho1"])))
    out_e = fused_pair_measure2(list(tensors), m, QS, a1, a2, KEY,
                                force=(i_f, 0), diagnostics=True, prerot=False)
    j_f = int(np.argmax(np.asarray(out_e[3]["rho2"])))
    out_e = fused_pair_measure2(list(tensors), m, QS, a1, a2, KEY,
                                force=(i_f, j_f), diagnostics=True,
                                prerot=False)
    out_p = fused_pair_measure2(list(tensors), m, QS, a1, a2, KEY,
                                force=(i_f, j_f), diagnostics=True,
                                prerot=True)

    te, de = out_e[0], out_e[3]
    tp, dp = out_p[0], out_p[3]
    assert not dp["swapped"]  # the rewrite landed on the a1 == 0 path
    # rotations preserve the position-integral measure: same rho1/p1/p2
    scale = max(float(np.asarray(de["rho1"]).max()), 1e-30)
    np.testing.assert_allclose(np.asarray(dp["rho1"]) / scale,
                               np.asarray(de["rho1"]) / scale, atol=2e-3)
    assert np.isclose(float(dp["p1"]), float(de["p1"]), rtol=1e-3)
    assert np.isclose(float(dp["p2"]), float(de["p2"]), rtol=5e-3)

    v_e, v_p = _dense(te), _dense(tp)
    overlap = np.vdot(v_e, v_p)
    assert abs(overlap) / (np.linalg.norm(v_e) * np.linalg.norm(v_p)) > 1 - 1e-4
    v_p = v_p * np.exp(-1j * np.angle(overlap))
    np.testing.assert_allclose(v_p, v_e, atol=2e-2 * np.abs(v_e).max())
