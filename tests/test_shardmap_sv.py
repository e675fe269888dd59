"""Explicit-collective sharded statevector vs dense reference (8-dev CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quantum_computations_tpu.dv import qop
from quantum_computations_tpu.parallel.shardmap_sv import ShardMapStateVector

rng = np.random.default_rng(1)


def rand_u(d):
    a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, _ = np.linalg.qr(a)
    return q


def dense_run(N, circuit):
    psi = jnp.zeros((2**N,), jnp.complex128).at[0].set(1.0)
    for m, t in circuit:
        psi = qop.apply_unitary(psi, jnp.asarray(m, jnp.complex128), t)
    return np.asarray(psi)


def test_local_gates_no_communication():
    N = 8
    sv = ShardMapStateVector(N)  # 8 devices -> k=3, local slots 3..7
    circuit = [(qop.H, (4,)), (rand_u(2), (7,)), (rand_u(4), (3, 6))]
    for m, t in circuit:
        sv.apply(m, t)
    np.testing.assert_allclose(sv.to_dense(), dense_run(N, circuit), atol=1e-10)
    assert sv.slot_of == list(range(N))  # no swaps happened


def test_global_gate_triggers_lazy_swap():
    N = 8
    sv = ShardMapStateVector(N)
    circuit = [(qop.H, (0,)), (rand_u(2), (1,)), (qop.H, (0,))]
    for m, t in circuit:
        sv.apply(m, t)
    np.testing.assert_allclose(sv.to_dense(), dense_run(N, circuit), atol=1e-10)
    # qubits 0 and 1 now live in local slots (lazy, not swapped back)
    assert sv.slot_of[0] >= sv.k and sv.slot_of[1] >= sv.k


def test_mixed_circuit_matches_dense():
    N = 9
    sv = ShardMapStateVector(N)
    circuit = [
        (qop.H, (0,)), (rand_u(4), (0, 8)), (qop.CZ, (1, 2)),
        (rand_u(2), (5,)), (rand_u(4), (2, 0)), (qop.CX, (7, 3)),
        (rand_u(4), (1, 6)), (qop.H, (2,)),
    ]
    for m, t in circuit:
        sv.apply(m, t)
    np.testing.assert_allclose(sv.to_dense(), dense_run(N, circuit), atol=1e-10)
    assert np.isclose(float(sv.norm()), 1.0, atol=1e-10)


def test_probabilities_any_layout():
    N = 8
    sv = ShardMapStateVector(N)
    sv.apply(qop.H, (0,))       # global qubit — gets swapped local
    sv.apply(qop.H, (5,))       # local
    for q, want in [(0, [0.5, 0.5]), (5, [0.5, 0.5]), (3, [1.0, 0.0])]:
        p = np.asarray(sv.probabilities(q))
        np.testing.assert_allclose(p, want, atol=1e-10)
    # probability of a qubit still stored globally
    sv2 = ShardMapStateVector(N)
    p = np.asarray(sv2.probabilities(1))  # slot 1 is a device bit
    np.testing.assert_allclose(p, [1.0, 0.0], atol=1e-12)


def test_ghz_across_global_and_local():
    N = 8
    sv = ShardMapStateVector(N)
    sv.apply(qop.H, (0,))
    for t in range(1, N):
        sv.apply(qop.CX, (0, t))
    dense = dense_run(N, [(qop.H, (0,))] + [(qop.CX, (0, t)) for t in range(1, N)])
    np.testing.assert_allclose(sv.to_dense(), dense, atol=1e-10)
