"""Device-resident trajectory entry point (real/int jit boundaries)."""

import numpy as np
import jax
import pytest

from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
from quantum_computations_tpu.gkp import MBGKPCircuit, db2eps
from quantum_computations_tpu.gkp.compiled import CompiledGKP, logical_coeffs

QS = np.linspace(-20, 20, 300)
EPS = db2eps(10.0)


def test_batched_readout_matches_dv():
    gates = [dvg.H(0), dvg.P(0)]
    circ = MBGKPCircuit.transpile(gates, 1)
    circ.fill()
    prog = CompiledGKP(circ, QS, EPS, SVDOptions(max_bond_dim=8, rel_err=1e-2))
    coeffs = logical_coeffs([DVState.ZERO])

    frames, rho_re, rho_im = prog.batched_readout(coeffs, 6, rng_seed=0)
    assert frames.shape == (6, 1, 2)
    assert rho_re.shape == (6, 2, 2)
    # outputs are real arrays (transfer-safe)
    assert not np.iscomplexobj(np.asarray(rho_re))

    want = np.asarray(DVSimulator(gates).run([DVState.ZERO]))
    fids = []
    for i in range(6):
        rho = np.asarray(rho_re[i]) + 1j * np.asarray(rho_im[i])
        # RAW (unnormalised) rho, reference convention: trace carries the
        # deterministic Shaw-readout grid factor (~(G-1)/G; the reference's
        # grid-1000 Grover data shows the same constant 0.997003 trace).
        assert 0.98 < np.trace(rho).real <= 1.0 + 1e-6
        fids.append(float(qop.fidelity(jax.numpy.asarray(want), jax.numpy.asarray(rho))))
    assert np.mean(fids) > 0.8, fids


def test_logical_coeffs_mapping():
    c = logical_coeffs([DVState.PLUS, DVState.T])
    assert c.shape == (2, 2, 2)
    np.testing.assert_allclose(c[0, 0], [2**-0.5, 0], atol=1e-7)
    np.testing.assert_allclose(c[1, 1], [0.5, 0.5], atol=1e-7)
