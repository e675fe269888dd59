"""Pallas gate kernel vs dense reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quantum_computations_tpu.ops import pallas_kernels as pk

rng = np.random.default_rng(0)


def rand_u():
    a = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    q, _ = np.linalg.qr(a)
    return q


@pytest.mark.parametrize("N,qubit", [(10, 0), (10, 2), (12, 4)])
def test_apply_1q_matches_xla(N, qubit):
    u = rand_u()
    psi = rng.normal(size=2**N).astype(np.float32) + 1j * rng.normal(size=2**N).astype(np.float32)
    xr = jnp.asarray(psi.real, jnp.float32)
    xi = jnp.asarray(psi.imag, jnp.float32)

    got_r, got_i = pk.apply_1q(xr, xi, u, qubit, N, interpret=True)
    want_r, want_i = pk.apply_1q_xla(xr, xi, u, qubit, N)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), atol=1e-5)


def test_apply_1q_agrees_with_dense():
    N, qubit = 9, 1
    u = rand_u()
    psi = (rng.normal(size=2**N) + 1j * rng.normal(size=2**N)).astype(np.complex64)
    from quantum_computations_tpu.dv import qop
    want = np.asarray(qop.apply_unitary(jnp.asarray(psi), jnp.asarray(u, jnp.complex64), (qubit,)))
    got_r, got_i = pk.apply_1q(
        jnp.asarray(psi.real), jnp.asarray(psi.imag), u, qubit, N, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_r) + 1j * np.asarray(got_i), want, atol=1e-5)


def test_small_inner_rejected():
    with pytest.raises(ValueError):
        pk.apply_1q(jnp.zeros(2**8), jnp.zeros(2**8), np.eye(2), 7, 8, interpret=True)


@pytest.mark.parametrize("N,qubit", [(10, 0), (12, 3)])
def test_apply_2q_adjacent_matches_dense(N, qubit):
    u4 = rand_u4()
    psi = (rng.normal(size=2**N) + 1j * rng.normal(size=2**N)).astype(np.complex64)
    from quantum_computations_tpu.dv import qop
    want = np.asarray(qop.apply_unitary(
        jnp.asarray(psi), jnp.asarray(u4, jnp.complex64), (qubit, qubit + 1)))
    got_r, got_i = pk.apply_2q_adjacent(
        jnp.asarray(psi.real), jnp.asarray(psi.imag), u4, qubit, N, interpret=True)
    np.testing.assert_allclose(np.asarray(got_r) + 1j * np.asarray(got_i), want, atol=1e-5)


def rand_u4():
    a = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    q, _ = np.linalg.qr(a)
    return q


def test_apply_1q_chain_matches_sequential_xla():
    """k gates fused into one pass == k sequential single-gate passes."""
    N = 14
    bits = pk.fusable_bits(N, c_bits=11, block_rows=4)
    assert bits == (7, 8, 9, 10, 11, 12)
    us = np.stack([rand_u() for _ in bits])
    sr = jnp.asarray(rng.normal(size=1 << N), jnp.float32)
    si = jnp.asarray(rng.normal(size=1 << N), jnp.float32)

    got_r, got_i = pk.apply_1q_chain(sr, si, jnp.asarray(us), bits, N,
                                     c_bits=11, block_rows=4, interpret=True)
    rr, ri = sr, si
    for u, p in zip(us, bits):
        rr, ri = pk.apply_1q_xla(rr, ri, u, N - p - 1, N)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(rr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ri), atol=1e-4)


def test_apply_1q_chain_rejects_unfusable_bits():
    N = 14
    us = jnp.asarray(np.stack([rand_u()]))
    sr = jnp.zeros(1 << N, jnp.float32)
    with pytest.raises(ValueError):
        pk.apply_1q_chain(sr, sr, us, (0,), N, c_bits=11, block_rows=4,
                          interpret=True)


def test_slab_matmul_matches_numpy():
    """Streamed in-place slab matmul (interpret mode) vs numpy."""
    import numpy as np
    import jax.numpy as jnp
    from quantum_computations_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(3)
    R, d = 64, 128
    x = rng.normal(size=(R * d,)).astype(np.float32) + \
        1j * rng.normal(size=(R * d,)).astype(np.float32)
    w = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    q, _ = np.linalg.qr(w)
    w = q.astype(np.complex64)

    out_re, out_im = pk.slab_matmul(
        jnp.asarray(x.real), jnp.asarray(x.imag),
        jnp.asarray(np.ascontiguousarray(w.real.T)),
        jnp.asarray(np.ascontiguousarray(w.imag.T)),
        d, interpret=True)
    want = (x.reshape(R, d) @ w.T).reshape(-1)
    np.testing.assert_allclose(np.asarray(out_re), want.real, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_im), want.imag, atol=2e-4)
