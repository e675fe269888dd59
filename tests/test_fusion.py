"""Window gate fusion: fused application must equal the sequential path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantum_computations_tpu.dv import fusion, qop


def _rand_u(k, rng):
    m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(size=(1 << k, 1 << k))
    q, _ = np.linalg.qr(m)
    return q.astype(np.complex64)


def _rand_circuit(N, n_gates, rng, max_arity=2):
    gates = []
    for _ in range(n_gates):
        k = int(rng.integers(1, max_arity + 1))
        targets = tuple(rng.choice(N, size=k, replace=False).tolist())
        gates.append((_rand_u(k, rng), targets))
    return gates


def _rand_state(N, rng):
    v = rng.normal(size=(1 << N,)) + 1j * rng.normal(size=(1 << N,))
    return (v / np.linalg.norm(v)).astype(np.complex64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_matches_sequential(seed):
    rng = np.random.default_rng(seed)
    N = 9
    gates = _rand_circuit(N, 20, rng)
    state = jnp.asarray(_rand_state(N, rng))

    expected = state
    for mat, tgts in gates:
        expected = qop.apply_unitary(expected, jnp.asarray(mat), tgts)

    windows = fusion.fuse_windows(gates)
    assert len(windows) < len(gates)  # fusion actually fused something
    got = state
    for u, tgts in windows:
        assert list(tgts) == sorted(tgts)
        assert len(tgts) <= fusion.MAX_WINDOW_BITS
        got = fusion.apply_window(got, jnp.asarray(u), tgts, N)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5)


def test_fused_split_real_matches_complex():
    rng = np.random.default_rng(3)
    N = 10
    gates = _rand_circuit(N, 12, rng)
    state = _rand_state(N, rng)

    windows = fusion.fuse_windows(gates)
    zc = jnp.asarray(state)
    re = jnp.asarray(state.real)
    im = jnp.asarray(state.imag)
    for u, tgts in windows:
        zc = fusion.apply_window(zc, jnp.asarray(u), tgts, N)
        re, im = fusion.apply_window_split(
            re, im, jnp.asarray(u.real), jnp.asarray(u.imag), tgts, N)
    np.testing.assert_allclose(np.asarray(re), np.asarray(zc).real, atol=2e-5)
    np.testing.assert_allclose(np.asarray(im), np.asarray(zc).imag, atol=2e-5)


def test_single_qubit_chain_collapses():
    """m 1q gates over q distinct qubits -> ceil(q/7) windows."""
    rng = np.random.default_rng(4)
    N = 16
    bits = [0, 3, 8, 12, 5, 10, 2, 14, 7]  # 9 distinct qubits
    gates = [(_rand_u(1, rng), (b,)) for b in (bits * 3)[:24]]
    windows = fusion.fuse_windows(gates)
    assert len(windows) <= 3  # 24 gates -> at most 3 passes

    state = jnp.asarray(_rand_state(N, rng))
    expected = state
    for mat, tgts in gates:
        expected = qop.apply_unitary(expected, jnp.asarray(mat), tgts)
    got = state
    for u, tgts in windows:
        got = fusion.apply_window(got, jnp.asarray(u), tgts, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5)


def test_same_qubit_order_preserved():
    """Non-commuting gates on the same qubit must compose in program order."""
    H = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2)
    T = np.diag([1, np.exp(1j * np.pi / 4)]).astype(np.complex64)
    gates = [(H, (0,)), (T, (0,))]
    (u, tgts), = fusion.fuse_windows(gates)
    np.testing.assert_allclose(u, T @ H, atol=1e-6)


def test_window_split_respects_max_bits():
    rng = np.random.default_rng(5)
    gates = [(_rand_u(1, rng), (q,)) for q in range(10)]
    windows = fusion.fuse_windows(gates, max_bits=4)
    assert [len(t) for _, t in windows] == [4, 4, 2]
