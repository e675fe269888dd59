"""Per-gadget-jit batched runner vs DV reference and compile-reuse behaviour."""

import pytest
import numpy as np
import jax.numpy as jnp

from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
from quantum_computations_tpu.gkp import MBGKPCircuit, db2eps
from quantum_computations_tpu.gkp.batched import BatchedGKP
from quantum_computations_tpu.gkp.compiled import logical_coeffs

QS = np.linspace(-20, 20, 300)
EPS = db2eps(10.0)
SVD = SVDOptions(max_bond_dim=8, rel_err=1e-2)


def run_batched(gates, init_states, batch, seed=0):
    circ = MBGKPCircuit.transpile(gates, len(init_states))
    circ.fill()
    runner = BatchedGKP(QS, EPS, SVD)
    coeffs = logical_coeffs(init_states)
    tensors, frames = runner.run_circuit(circ, coeffs, batch, rng_seed=seed)
    rho_re, rho_im = runner.readout(tensors, frames)
    return np.asarray(rho_re) + 1j * np.asarray(rho_im), runner


@pytest.mark.slow
def test_batched_single_qubit_matches_dv():
    gates = [dvg.H(0), dvg.T(0)]
    rhos, _ = run_batched(gates, [DVState.ZERO], batch=6)
    want = np.asarray(DVSimulator(gates).run([DVState.ZERO]))
    fids = [float(qop.fidelity(jnp.asarray(want), jnp.asarray(r))) for r in rhos]
    assert np.mean(fids) > 0.75, fids


def test_compile_cache_reused_across_circuits():
    """A second circuit with the same gadget kinds must add no new executors."""
    gates1 = [dvg.H(0), dvg.P(0)]
    gates2 = [dvg.P(0), dvg.H(0), dvg.P(0)]
    circ1 = MBGKPCircuit.transpile(gates1, 1)
    circ1.fill()
    circ2 = MBGKPCircuit.transpile(gates2, 1)
    circ2.fill()
    runner = BatchedGKP(QS, EPS, SVD)
    coeffs = logical_coeffs([DVState.ZERO])
    runner.run_circuit(circ1, coeffs, 2, rng_seed=0)
    n_after_first = len(runner._cache)
    runner.run_circuit(circ2, coeffs, 2, rng_seed=1)
    assert len(runner._cache) == n_after_first  # same kinds/shapes -> full reuse


@pytest.mark.slow
def test_batched_matches_compiled_distribution():
    """Batched runner and whole-circuit compiled engine agree statistically."""
    from quantum_computations_tpu.gkp.compiled import CompiledGKP

    gates = [dvg.H(0)]
    circ = MBGKPCircuit.transpile(gates, 1)
    circ.fill()
    want = np.asarray(DVSimulator(gates).run([DVState.ZERO]))

    rhos, _ = run_batched(gates, [DVState.ZERO], batch=8, seed=3)
    fid_batched = np.mean([float(qop.fidelity(jnp.asarray(want), jnp.asarray(r))) for r in rhos])

    prog = CompiledGKP(circ, QS, EPS, SVD)
    frames, rho_re, rho_im = prog.batched_readout(logical_coeffs([DVState.ZERO]), 8, rng_seed=3)
    rhos_c = np.asarray(rho_re) + 1j * np.asarray(rho_im)
    fid_comp = np.mean([float(qop.fidelity(jnp.asarray(want), jnp.asarray(r))) for r in rhos_c])

    assert abs(fid_batched - fid_comp) < 0.25, (fid_batched, fid_comp)
    assert fid_batched > 0.75


@pytest.mark.slow
def test_adaptive_trimming_shrinks_bonds_and_matches_dv():
    gates = [dvg.H(0), dvg.P(0)]
    circ = MBGKPCircuit.transpile(gates, 1)
    circ.fill()
    runner = BatchedGKP(QS, EPS, SVD, adaptive=True)
    coeffs = logical_coeffs([DVState.ZERO])
    tensors, frames = runner.run_circuit(circ, coeffs, 4, rng_seed=2)
    # bonds should be trimmed below the static cap after measurements
    caps = [t.shape[-1] for t in tensors[:-1]]
    assert all(c <= 8 for c in caps)
    rho_re, rho_im = runner.readout(tensors, frames)
    rhos = np.asarray(rho_re) + 1j * np.asarray(rho_im)
    want = np.asarray(DVSimulator(gates).run([DVState.ZERO]))
    fids = [float(qop.fidelity(jnp.asarray(want), jnp.asarray(r))) for r in rhos]
    assert np.mean(fids) > 0.7, fids


@pytest.mark.slow
def test_op_granularity_matches_dv():
    gates = [dvg.H(0), dvg.CZ(0, 1)]
    circ = MBGKPCircuit.transpile(gates, 2)
    circ.fill()
    runner = BatchedGKP(QS, EPS, SVD, adaptive=True, granularity="op")
    coeffs = logical_coeffs([DVState.ZERO, DVState.ZERO])
    tensors, frames = runner.run_circuit(circ, coeffs, 3, rng_seed=5)
    rho_re, rho_im = runner.readout(tensors, frames)
    rhos = np.asarray(rho_re) + 1j * np.asarray(rho_im)
    want = np.asarray(DVSimulator(gates).run([DVState.ZERO, DVState.ZERO]))
    fids = [float(qop.fidelity(jnp.asarray(want), jnp.asarray(r))) for r in rhos]
    assert np.mean(fids) > 0.6, fids
    # no whole-gadget executors were compiled, only op-level ones
    assert not any(k[0] in ("single", "two") for k in runner._cache)


def test_epsilon_is_traced_not_baked():
    """epsilon flows as executor DATA: different dBs through the same cache
    signature must give different states (guards against a dropped argument),
    and a fresh runner at another dB adds no new cache signatures."""
    runner_a = BatchedGKP(QS, db2eps(6.0), SVD)
    runner_b = BatchedGKP(QS, db2eps(12.0), SVD)
    coeffs = logical_coeffs([DVState.ZERO])
    ta = np.asarray(runner_a.init_tensors(coeffs, 2)[0])
    tb = np.asarray(runner_b.init_tensors(coeffs, 2)[0])
    assert ta.shape == tb.shape
    assert np.max(np.abs(ta - tb)) > 1e-3  # epsilon actually reached the state

    gates = [dvg.H(0), dvg.P(0)]
    circ = MBGKPCircuit.transpile(gates, 1)
    circ.fill()
    runner_a.run_circuit(circ, coeffs, 2, rng_seed=0)
    sigs_a = set(runner_a._cache)
    runner_b._cache = runner_a._cache  # share the executor cache across dBs
    runner_b.run_circuit(circ, coeffs, 2, rng_seed=0)
    assert set(runner_b._cache) == sigs_a  # dB change adds NO new executors


def _run_production_path(track: bool, *, seed=7, stream_threshold=None,
                         monkeypatch=None):
    """Run the production engine config (op granularity, adaptive, fused
    single+pair) on a circuit hitting every rank-tracked op: Bell splices,
    BS splits, fused pair-measures, fused singles and feed-forward."""
    from quantum_computations_tpu.cv import gates as cvg

    if stream_threshold is not None:
        monkeypatch.setattr(cvg, "_STREAM_THRESHOLD", stream_threshold)
    gates = [dvg.H(0), dvg.CZ(0, 1), dvg.T(1), dvg.SWAP(0, 1), dvg.P(0)]
    circ = MBGKPCircuit.transpile(gates, 2)
    circ.fill()
    runner = BatchedGKP(QS, EPS, SVD, adaptive=True, granularity="op",
                        fused_single=True, fused_pair=True, track_ranks=track)
    coeffs = logical_coeffs([DVState.ZERO, DVState.ZERO])
    tensors, frames = runner.run_circuit(circ, coeffs, 3, rng_seed=seed)
    return [np.asarray(t) for t in tensors], frames, runner


def test_rank_tracking_matches_full_fetch():
    """Host-tracked bond ranks must reproduce the full-fetch trim decisions
    exactly: identical shapes (same trims), identical values, identical
    frames — with NO full-chain rank fetch compiled in tracking mode."""
    t_on, f_on, r_on = _run_production_path(True)
    t_off, f_off, r_off = _run_production_path(False)
    assert [t.shape for t in t_on] == [t.shape for t in t_off]
    for a, b in zip(t_on, t_off):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(f_on, f_off)
    assert not any(k[0] == "ranks" for k in r_on._cache)  # no full fetch
    assert any(k[0] == "ranks" for k in r_off._cache)     # control


def test_rank_tracking_matches_full_fetch_streamed(monkeypatch):
    """Same parity check with the streamed BS branch forced on (tiny
    threshold): the split's host-returned rank must match what the full
    fetch would measure on the zero-masked factors."""
    t_on, f_on, r_on = _run_production_path(
        True, seed=11, stream_threshold=1, monkeypatch=monkeypatch)
    t_off, f_off, r_off = _run_production_path(
        False, seed=11, stream_threshold=1, monkeypatch=monkeypatch)
    assert [t.shape for t in t_on] == [t.shape for t in t_off]
    for a, b in zip(t_on, t_off):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(f_on, f_off)
    assert not any(k[0] == "ranks" for k in r_on._cache)


@pytest.mark.slow
def test_rank_tracking_three_qubit_middle_insert():
    """3-qubit chain: the CZ(1,2) macronode splices Bells mid-chain (both
    the front/middle and the append insert paths) — parity vs full fetch."""
    gates = [dvg.H(0), dvg.CZ(1, 2), dvg.CZ(0, 1), dvg.T(2)]
    circ = MBGKPCircuit.transpile(gates, 3)
    circ.fill()
    outs = []
    for track in (True, False):
        runner = BatchedGKP(QS, EPS, SVD, adaptive=True, granularity="op",
                            fused_single=True, fused_pair=True,
                            track_ranks=track)
        coeffs = logical_coeffs([DVState.ZERO] * 3)
        tensors, frames = runner.run_circuit(circ, coeffs, 2, rng_seed=13)
        outs.append(([np.asarray(t) for t in tensors], frames))
    (t_on, f_on), (t_off, f_off) = outs
    assert [t.shape for t in t_on] == [t.shape for t in t_off]
    for a, b in zip(t_on, t_off):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(f_on, f_off)
