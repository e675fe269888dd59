"""Compiled (fully-jitted, vmapped) GKP trajectory engine tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.cv.mps import MPS
from quantum_computations_tpu.dv import Simulator as DVSimulator, State as DVState, gates as dvg, qop
from quantum_computations_tpu.gkp import (
    MBGKPCircuit, db2eps, full_logical_density_mps, parse_to_mps, syndrome_matrix,
)
from quantum_computations_tpu.gkp.compiled import CompiledGKP

QS = np.linspace(-20, 20, 300)
EPS = db2eps(10.0)
SVD = SVDOptions(max_bond_dim=8, rel_err=1e-2)


def corrected_rho(tensors, frame):
    mps = MPS(QS, [t for t in tensors])
    rho = np.asarray(full_logical_density_mps(mps))
    corr = np.asarray(syndrome_matrix([(int(x), int(z)) for x, z in np.asarray(frame)]))
    rho = corr @ rho @ corr.conj().T
    return rho / np.trace(rho)


def build(circuit, N=1):
    circ = MBGKPCircuit.transpile(circuit, N)
    circ.fill()
    return CompiledGKP(circ, QS, EPS, SVD)


@pytest.mark.parametrize("gates,label", [
    ([dvg.H(0)], "H"),
    ([dvg.P(0)], "P"),
    pytest.param([dvg.T(0)], "T", marks=pytest.mark.slow),
    pytest.param([dvg.H(0), dvg.T(0), dvg.H(0)], "HTH", marks=pytest.mark.slow),
])
def test_compiled_single_qubit_matches_dv(gates, label):
    prog = build(gates)
    dv_state = np.asarray(DVSimulator(gates).run([DVState.ZERO]))
    init = parse_to_mps([DVState.ZERO], EPS, QS)

    fids = []
    for seed in range(4):
        tensors, frame = prog.trajectory(init.tensors, jax.random.PRNGKey(seed))
        rho = corrected_rho(tensors, frame)
        fids.append(float(qop.fidelity(jnp.asarray(dv_state), jnp.asarray(rho))))
    assert np.mean(fids) > 0.8, (label, fids)


@pytest.mark.slow
def test_compiled_jit_and_vmap():
    prog = build([dvg.H(0)])
    init = parse_to_mps([DVState.ZERO], EPS, QS)

    tensors, frames = prog.batched(init, 5, rng_seed=0)
    assert frames.shape == (5, 1, 2)
    # batch axis present on every tensor
    for t in tensors:
        assert t.shape[0] == 5

    # per-trajectory determinism: same key -> same result
    t1, f1 = jax.jit(prog.trajectory)(init.tensors, jax.random.PRNGKey(3))
    t2, f2 = jax.jit(prog.trajectory)(init.tensors, jax.random.PRNGKey(3))
    for a, b in zip(t1, t2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


@pytest.mark.slow
def test_compiled_t_correction_consistency():
    """The classically-controlled P correction after T must keep trajectories
    consistent with the DV result on average (exercises traced control)."""
    gates = [dvg.T(0), dvg.T(0)]  # T^2 = P
    prog = build(gates)
    dv_state = np.asarray(DVSimulator([dvg.P(0)]).run([DVState.H]))
    init = parse_to_mps([DVState.H], EPS, QS)
    fids = []
    for seed in range(6):
        tensors, frame = prog.trajectory(init.tensors, jax.random.PRNGKey(seed))
        rho = corrected_rho(tensors, frame)
        fids.append(float(qop.fidelity(jnp.asarray(dv_state), jnp.asarray(rho))))
    assert np.mean(fids) > 0.75, fids
