"""Pipeline tests: tomography, GKP-EC projectors, Clifford encoding, smoke runs."""

import json
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import fftconvolve

from quantum_computations_tpu.dv import qop
from quantum_computations_tpu.gkp import db2eps
from quantum_computations_tpu.pipelines import clifford_fidelity as cf
from quantum_computations_tpu.pipelines import gkp_ec, grover, rb, tomography


# ---------------------------------------------------------------------------
# tomography
# ---------------------------------------------------------------------------

def test_tomography_identity_channel():
    chan = tomography.quantum_channel([np.identity(2)], ket_input=True, return_input=True)
    Ks = tomography.process_tomography(chan, 1)
    assert len(Ks) == 1
    K = Ks[0]
    # K should be proportional to identity with |c| = 1
    assert np.allclose(np.abs(K[0, 0]), 1.0, atol=1e-8)
    assert np.allclose(K / K[0, 0], np.identity(2), atol=1e-8)


def test_tomography_depolarizing_channel():
    p = 0.25
    Ks_true = [np.sqrt(1 - p) * qop.IDTY] + [np.sqrt(p / 3) * P for P in qop.PAULIS]
    chan = tomography.quantum_channel(Ks_true, ket_input=True, return_input=True)
    D, Ks = tomography.process_tomography(chan, 1, normalised=True, strict=True)
    # Kraus basis is P/sqrt(2) (Frobenius-normalised), so eigenvalues are 2q.
    np.testing.assert_allclose(
        np.sort(D[D > 1e-10])[::-1],
        [2 * (1 - p), 2 * p / 3, 2 * p / 3, 2 * p / 3], atol=1e-8,
    )
    # unnormalised operators satisfy the completeness relation
    total = sum(d * K.conj().T @ K for d, K in zip(D, Ks))
    np.testing.assert_allclose(total, np.identity(2), atol=1e-8)


def test_tomography_two_qubit_unitary():
    U = np.asarray(qop.CZ)
    chan = tomography.quantum_channel([U], ket_input=True, return_input=True)
    Ks = tomography.process_tomography(chan, 2)
    assert len(Ks) == 1
    phase = Ks[0][0, 0] / U[0, 0]
    np.testing.assert_allclose(Ks[0], U * phase, atol=1e-7)


# ---------------------------------------------------------------------------
# gkp_ec (performance-analysis projectors)
# ---------------------------------------------------------------------------

QS = np.linspace(-15, 15, 400)
EPS = db2eps(10.0)


def _gkp(qs, eps, state=(1, 0)):
    return np.asarray(gkp_ec.gkp_sym(jnp.asarray(qs), eps, state))


def test_project_asym_matches_scipy():
    zero = _gkp(QS, EPS, (1, 0))
    state = _gkp(QS, EPS, (1, 1))
    got = np.asarray(gkp_ec.gkp_project_asym(QS, jnp.asarray(state), jnp.asarray(zero)))

    dq = (QS[-1] - QS[0]) / len(QS)
    plus = np.asarray(gkp_ec.fourier(QS, jnp.asarray(zero)))
    want = fftconvolve(state * plus, zero, mode="same") * dq
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())


def test_logical_fidelity_of_clean_gkp_state():
    zero = _gkp(QS, EPS, (1, 0))
    zero = np.asarray(gkp_ec.normalise(QS, jnp.asarray(zero)))
    fid = gkp_ec.logical_fidelity(QS, jnp.asarray(zero))
    assert fid > 0.95


def test_project_sym_keeps_logical_zero():
    zero = _gkp(QS, EPS, (1, 0))
    one = _gkp(QS, EPS, (0, 1))
    state = np.asarray(gkp_ec.normalise(QS, jnp.asarray(zero)))
    out = np.asarray(gkp_ec.gkp_project_sym(QS, jnp.asarray(state), jnp.asarray(zero), jnp.asarray(one)))
    out = np.asarray(gkp_ec.normalise(QS, jnp.asarray(out)))
    overlap = abs(np.vdot(state, out)) * (QS[1] - QS[0])
    assert overlap > 0.95


# ---------------------------------------------------------------------------
# clifford_fidelity
# ---------------------------------------------------------------------------

def test_compute_cliffords_finds_720_classes():
    reps = cf.compute_cliffords()
    assert len(reps) == 720


def test_average_survival_invariant():
    """Average over classes x paulis of |<00|P C|00>|^2 = 1/4
    (reference average_clifford_fidelity.py:155-162)."""
    reps = cf.compute_cliffords()
    paulis = cf.compute_paulis()
    ket = np.array([1.0, 0, 0, 0])
    res = sum(abs(ket @ p @ c @ ket) ** 2 for c in reps for p in paulis)
    res /= len(reps) * len(paulis)
    assert np.isclose(res, 0.25, atol=1e-10)


def test_encode_ket_and_job():
    qs = np.linspace(-15, 15, 300)
    paulis = cf.compute_paulis()
    bell = np.array([1.0, 0, 0, 1.0]) / np.sqrt(2)
    mps = cf.encode_ket(qs, EPS, bell)
    assert len(mps) == 2
    assert mps[0].shape == (1, 300, 2)
    result = cf.job(qs, 10.0, np.identity(4), 0, paulis)
    fids = result["fidelities"]
    assert len(fids) == 16
    assert all(-1e-6 <= f <= 1.0 + 1e-6 for f in fids)
    assert fids[0] > 0.9  # identity Pauli: encoding fidelity of |00>


# ---------------------------------------------------------------------------
# grover / rb smoke runs (tiny params)
# ---------------------------------------------------------------------------

def test_grover_pipeline_builds_cz_only_circuit():
    circ, init = grover.grover([2, 7])
    from quantum_computations_tpu.dv import gates as dvg
    assert not any(isinstance(g, dvg.CX) for g in circ)
    # must reproduce the DV Grover result through the CZ-only form
    from quantum_computations_tpu.dv import Simulator
    state = np.asarray(Simulator(circ).run(init))
    probs = np.abs(state) ** 2
    np.testing.assert_allclose(probs[[2, 7]], 0.5, atol=1e-6)


@pytest.mark.slow
def test_grover_pipeline_smoke(tmp_path):
    cfg = grover.GroverConfig(
        db_min=10.0, db_max=10.0, db_points=1, db_skip=0, repeats=1,
        grid_points=300, max_bond_dim=12, rng_seed=1,
        data_file=str(tmp_path / "g.dat"),
    )
    data = grover.main(cfg, progress=False)
    assert len(data) == 1
    rho = np.array(data[0]["rho_real"]) + 1j * np.array(data[0]["rho_imag"])
    assert rho.shape == (8, 8)
    tr = np.trace(rho).real
    assert 0.2 < tr < 2.0
    saved = json.loads((tmp_path / "g.dat").read_text())
    assert len(saved) == 1


@pytest.mark.slow
def test_rb_sample_depth_smoke():
    samples = rb.sample_depth(10.0, 3, 1, 5, grid_points=300, max_bond_dim=12)
    assert len(samples) == 1
    s = samples[0]
    assert 0.0 <= s["fidelity"] <= 1.0 + 1e-6
    assert 0.0 <= s["purity"] <= 1.0 + 1e-6
    assert s["db"] == 10.0 and s["depth"] == 3


def test_rb_batched_smoke():
    """Production-path RB driver (batched op-granularity engine) produces
    valid samples at toy parameters."""
    import numpy as np
    from quantum_computations_tpu.pipelines.rb_batched import RBBatchedConfig, main

    rows = main(RBBatchedConfig(dbs="10.0", depths="2", num_samples=2, batch=2,
                                grid_points=128, grid_span=15.0,
                                max_bond_dim=10, data_file="", rng_seed=1))
    assert len(rows) == 2
    for r in rows:
        # reference-schema keys plus the trace diagnostic (leakage monitor)
        assert set(r) == {"db", "depth", "fidelity", "purity", "trace"}
        assert 0.5 < r["trace"] <= 1.05
        assert -0.05 <= r["fidelity"] <= 1.05
        assert 0.0 < r["purity"] <= 1.1


def test_rb_batched_meta_stats(tmp_path):
    """The production RB driver reports per-cell drop statistics alongside
    the reference-schema dataset (VERDICT r2: drop rate must be a metric)."""
    from quantum_computations_tpu.pipelines.rb_batched import RBBatchedConfig, main

    path = str(tmp_path / "rb.dat")
    main(RBBatchedConfig(dbs="10.0", depths="2", num_samples=2, batch=2,
                         grid_points=128, grid_span=15.0,
                         max_bond_dim=10, data_file=path, rng_seed=1))
    meta = json.loads((tmp_path / "rb.dat.meta.json").read_text())
    assert len(meta) == 1
    cell = meta[0]
    assert cell["samples"] == 2 and cell["attempted"] >= 2
    assert cell["drop_rate"] == cell["dropped"] / cell["attempted"]
    assert 0.0 <= cell["mean_fidelity"] <= 1.05
    assert cell["seconds"] > 0 and cell["sec_per_traj"] > 0


@pytest.mark.slow
def test_grover_batched_smoke(tmp_path):
    """Production-path Grover driver (batched op-granularity engine) at toy
    parameters: valid 8x8 rho rows, reference-compatible schema, meta stats."""
    from quantum_computations_tpu.pipelines.grover_batched import (
        GroverBatchedConfig, main, summarize)

    path = str(tmp_path / "grov.dat")
    data = main(GroverBatchedConfig(tagged="0,4", dbs="10.0", trajectories=2,
                                    batch=2, grid_points=256, grid_span=15.0,
                                    max_bond_dim=12, rng_seed=3,
                                    data_file=path))
    assert len(data) == 2
    for entry in data:
        rho = np.array(entry["rho_real"]) + 1j * np.array(entry["rho_imag"])
        assert rho.shape == (8, 8)
        assert 0.2 < np.trace(rho).real < 2.0
    summary = summarize(data, [0, 4])
    (mean, sem), = summary.values()
    assert 0.0 <= mean <= 1.0 + 1e-6
    meta = json.loads((tmp_path / "grov.dat.meta.json").read_text())
    assert meta[0]["samples"] == 2
    assert meta[0]["drop_rate"] == meta[0]["dropped"] / meta[0]["attempted"]


def test_rb_batched_threaded_streams(monkeypatch):
    """QCT_RB_THREADS=2 runs two engine streams; rows remain schema-valid
    and the cell meta records the thread count."""
    import numpy as np
    from quantum_computations_tpu.pipelines.rb_batched import RBBatchedConfig, main

    monkeypatch.setenv("QCT_RB_THREADS", "2")
    rows = main(RBBatchedConfig(dbs="10.0", depths="2", num_samples=4, batch=2,
                                grid_points=128, grid_span=15.0,
                                max_bond_dim=10, data_file="", rng_seed=2))
    assert len(rows) >= 4
    for r in rows:
        assert set(r) == {"db", "depth", "fidelity", "purity", "trace"}
        assert 0.5 < r["trace"] <= 1.05
        assert -0.05 <= r["fidelity"] <= 1.05


@pytest.mark.slow
def test_grover_batched_threaded_streams(tmp_path, monkeypatch):
    """QCT_GROVER_THREADS=2: two engine streams produce a schema-valid
    dataset with thread provenance in the meta."""
    from quantum_computations_tpu.pipelines.grover_batched import (
        GroverBatchedConfig, main)

    monkeypatch.setenv("QCT_GROVER_THREADS", "2")
    path = str(tmp_path / "grov_thr.dat")
    data = main(GroverBatchedConfig(tagged="0,4", dbs="10.0", trajectories=4,
                                    batch=2, grid_points=256, grid_span=15.0,
                                    max_bond_dim=12, rng_seed=3,
                                    data_file=path, overwrite=True))
    assert len(data) >= 4
    seeds = {(r["rng_seed"], r["rng_lane"]) for r in data}
    assert len(seeds) == len(data)  # provenance stays unique across streams
    meta = json.loads((tmp_path / "grov_thr.dat.meta.json").read_text())
    assert meta[0]["engine"]["threads"] == 2
