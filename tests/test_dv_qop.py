"""Golden tests of the DV functional core against brute-force NumPy.

The reference validates DV semantics only informally; here each tensordot-based
operation is checked against the dense kron-expansion it replaces
(reference ``numpy_quantum.py:243-247``).
"""

import numpy as np
import pytest

from quantum_computations_tpu.dv import qop


def dense_expand(gate, N, targets):
    """Independent dense construction via rank-2N tensor transposition."""
    missing = [i for i in range(N) if i not in targets]
    full = gate
    for _ in missing:
        full = np.kron(full, np.identity(2))
    order = list(targets) + missing  # factor k of `full` acts on qubit order[k]
    # Reorder tensor factors so factor j acts on qubit j.
    pos = [order.index(q) for q in range(N)]
    t = full.reshape((2,) * (2 * N))
    t = t.transpose(pos + [N + p for p in pos])
    return t.reshape(2**N, 2**N)


rng = np.random.default_rng(0)


def rand_unitary(d):
    a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, _ = np.linalg.qr(a)
    return q


@pytest.mark.parametrize("N,targets", [(1, (0,)), (3, (1,)), (3, (0, 2)), (4, (2, 0)), (5, (4, 1, 3))])
def test_apply_unitary_matches_dense(N, targets):
    U = rand_unitary(2 ** len(targets))
    psi = rng.normal(size=2**N) + 1j * rng.normal(size=2**N)
    psi /= np.linalg.norm(psi)

    got = np.asarray(qop.apply_unitary(psi, U, targets))
    want = dense_expand(U, N, targets) @ psi
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("N,targets", [(2, (0,)), (3, (2, 0))])
def test_apply_unitary_dm_matches_dense(N, targets):
    U = rand_unitary(2 ** len(targets))
    psi = rng.normal(size=2**N) + 1j * rng.normal(size=2**N)
    rho = np.outer(psi, psi.conj())
    G = dense_expand(U, N, targets)
    got = np.asarray(qop.apply_unitary_dm(rho, U, targets))
    want = G @ rho @ G.conj().T
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_expand_gate_matches_dense():
    U = rand_unitary(4)
    got = np.asarray(qop.expand_gate(U, 3, [2, 0]))
    want = dense_expand(U, 3, (2, 0))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_permute_tensor_product_ket():
    a, b, c = rng.normal(size=2), rng.normal(size=2), rng.normal(size=2)
    abc = np.kron(np.kron(a, b), c)
    # factor k moves to position new_ordering[k]: a->2, b->0, c->1
    got = np.asarray(qop.permute_tensor_product(abc, [2, 0, 1]))
    want = np.kron(np.kron(b, c), a)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_insert_qubit():
    a, b = rng.normal(size=2), rng.normal(size=2)
    new = rng.normal(size=2)
    state = np.kron(a, b)
    got = np.asarray(qop.insert_qubit(state, new, 1))
    want = np.kron(np.kron(a, new), b)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_fidelity_conventions():
    a = qop.normalise(np.array([1.0, 1j]))
    b = qop.normalise(np.array([1.0, -1j]))
    assert np.isclose(float(qop.fidelity(a, a)), 1.0)
    assert np.isclose(float(qop.fidelity(a, b)), 0.0, atol=1e-12)
    rho = np.asarray(qop.ket2dm(a))
    assert np.isclose(float(qop.fidelity(a, rho)), 1.0)
    assert np.isclose(float(qop.fidelity(rho, rho)), 1.0)
    assert np.isclose(float(qop.purity(rho)), 1.0)


def test_add_control():
    got = np.asarray(qop.add_control(np.asarray(qop.X)))
    np.testing.assert_allclose(got, qop.CX, atol=1e-12)


def test_born_and_project():
    psi = qop.normalise(np.array([1.0, 0, 0, 1.0]))  # Bell
    p = float(qop.born_probability(psi, 0, np.array([1.0, 0.0])))
    assert np.isclose(p, 0.5)
    proj = np.asarray(qop.project_qubit(psi, 0, np.array([1.0, 0.0])))
    want = np.array([1.0, 0, 0, 0]) / np.sqrt(2)
    np.testing.assert_allclose(proj, want, atol=1e-12)
