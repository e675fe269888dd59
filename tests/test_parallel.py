"""Sharded statevector tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quantum_computations_tpu.dv import qop
from quantum_computations_tpu.parallel import (
    ShardedStateVector, batched_sweep, data_mesh, qubit_mesh, sharded_sweep,
)


def test_mesh_construction():
    mesh = qubit_mesh(3)
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("q0", "q1", "q2")


def test_sharded_matches_dense_random_circuit():
    """Sharded N=10 run must equal the single-device tensordot engine."""
    rng = np.random.default_rng(0)
    N = 10
    mesh = qubit_mesh(3)
    sv = ShardedStateVector(N, mesh)

    def rand_u(d):
        a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        q, _ = np.linalg.qr(a)
        return q

    # circuit hitting local axes, sharded axes, and cross axes
    circuit = [
        (qop.H, (0,)), (qop.H, (5,)), (rand_u(4), (0, 9)),
        (qop.CZ, (1, 2)), (rand_u(2), (7,)), (rand_u(4), (2, 6)),
        (qop.CX, (0, 1)), (rand_u(4), (8, 3)),
    ]
    for m, t in circuit:
        sv.apply(m, t)

    dense = jnp.zeros((2**N,), dtype=jnp.complex128).at[0].set(1.0)
    for m, t in circuit:
        dense = qop.apply_unitary(dense, jnp.asarray(m, jnp.complex128), t)

    got = np.asarray(sv.state).reshape(-1)
    np.testing.assert_allclose(got, np.asarray(dense), atol=1e-10)
    # verify the state is actually sharded over 8 devices
    assert len(sv.state.sharding.device_set) == 8


def test_run_circuit_single_compile():
    N = 8
    sv = ShardedStateVector(N, qubit_mesh(3))
    circuit = [(qop.H, (i,)) for i in range(N)] + [(qop.CZ, (i, i + 1)) for i in range(N - 1)]
    sv.run_circuit(circuit)
    assert np.isclose(float(sv.norm()), 1.0, atol=1e-10)
    p = np.asarray(sv.probabilities(0))
    np.testing.assert_allclose(p, [0.5, 0.5], atol=1e-10)


def test_sharded_measurement():
    sv = ShardedStateVector(6, qubit_mesh(3))
    sv.apply(qop.H, (0,))
    for t in range(1, 6):
        sv.apply(qop.CX, (0, t))  # GHZ
    s = int(sv.measure(0, jax.random.PRNGKey(1)))
    # after measuring qubit 0, all qubits collapse to the same value
    for qb in range(1, 6):
        p = np.asarray(sv.probabilities(qb))
        assert np.isclose(p[s], 1.0, atol=1e-9)


def test_batched_sweep():
    def traj(key):
        x = jax.random.normal(key, ())
        return x * x

    out = batched_sweep(traj, 100, rng_seed=0)
    assert out.shape == (100,)
    assert 0.5 < float(out.mean()) < 2.0


def test_sharded_sweep_matches_count():
    def traj(key):
        return jax.random.bernoulli(key, 0.5).astype(jnp.float32)

    out = sharded_sweep(traj, 13, rng_seed=1)
    assert out.shape == (13,)
