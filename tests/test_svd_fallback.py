"""The TPU SVD fallback (real-embedding eigh) must match a true SVD on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from quantum_computations_tpu.ops.linalg import svd_via_eigh

rng = np.random.default_rng(0)


def check(A, rtol=1e-7):  # absolute floor ~1e-6*scale/n from the degeneracy-splitting perturbation
    A = jnp.asarray(A)
    U, s, Vh = svd_via_eigh(A)
    U, s, Vh = map(np.asarray, (U, s, Vh))
    s_ref = np.linalg.svd(np.asarray(A), compute_uv=False)
    scale = max(s_ref.max(), 1e-30)
    # singular values match
    np.testing.assert_allclose(s, s_ref, rtol=1e-6, atol=scale * rtol)
    # reconstruction
    recon = U * s[None, :] @ Vh
    np.testing.assert_allclose(recon, np.asarray(A), atol=scale * 1e-6)
    # orthonormality of the computed factors — only meaningful for singular
    # values well above the degeneracy-splitting perturbation floor; for the
    # tail, reconstruction is still exact because U_j s_j = A V_j identically.
    keep = s > scale * 1e-4
    Uk = U[:, keep]
    Vk = Vh[keep, :].conj().T
    # V drives truncation error (A - A V_k V_k^H), so it must be tight; U may
    # pick up perturbation leakage amplified by sigma ratios — loose check.
    np.testing.assert_allclose(Vk.conj().T @ Vk, np.eye(keep.sum()), atol=1e-6)
    np.testing.assert_allclose(Uk.conj().T @ Uk, np.eye(keep.sum()), atol=1e-2)


def test_random_tall():
    check(rng.normal(size=(40, 12)) + 1j * rng.normal(size=(40, 12)))


def test_random_wide():
    check(rng.normal(size=(12, 50)) + 1j * rng.normal(size=(12, 50)))


def test_low_rank_with_zero_space():
    A = (rng.normal(size=(30, 4)) + 1j * rng.normal(size=(30, 4))) @ (
        rng.normal(size=(4, 20)) + 1j * rng.normal(size=(4, 20))
    )
    check(A)


def test_exactly_degenerate_singular_values():
    """Kron structure gives exactly repeated singular values — the pair
    selection must still span the full space."""
    q1, _ = np.linalg.qr(rng.normal(size=(6, 6)) + 1j * rng.normal(size=(6, 6)))
    q2, _ = np.linalg.qr(rng.normal(size=(6, 6)) + 1j * rng.normal(size=(6, 6)))
    A = q1 @ np.diag([3.0, 3.0, 3.0, 1.0, 1.0, 1e-3]) @ q2.conj().T
    check(A)


def test_real_input_uses_native():
    from quantum_computations_tpu.ops.linalg import svd_compat
    A = jnp.asarray(rng.normal(size=(10, 6)))
    U, s, Vh = svd_compat(A)
    s_ref = np.linalg.svd(np.asarray(A), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=1e-10)
