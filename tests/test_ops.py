"""Kernel tests: theta series vs mpmath, interpolation vs scipy, SVD truncation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from mpmath import jtheta
from scipy.interpolate import RegularGridInterpolator

from quantum_computations_tpu.ops import interp, linalg, theta


# ---------------------------------------------------------------------------
# theta functions vs mpmath
# ---------------------------------------------------------------------------

def mp_theta(z, tau):
    # independent evaluation in the reference's convention (states.py:97-102)
    q = np.exp(1j * np.pi * tau)
    return complex(jtheta(3, np.pi * z, q))


@pytest.mark.parametrize("eps_db", [5.0, 10.0, 15.0])
def test_theta3_matches_mpmath(eps_db):
    eps = 2.0 * np.arctanh(np.float_power(10.0, -eps_db / 10.0) / 2.0)
    tau = 1j * np.tanh(eps) / 2
    zs = np.linspace(-4.0, 4.0, 17)
    got = np.asarray(theta.theta3(jnp.asarray(zs), tau))
    want = np.array([mp_theta(z, tau) for z in zs])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_modified_theta_matches_reference_formula():
    tau = 0.08j
    a, b = 0.0, 0.5
    zs = np.linspace(-3, 3, 11)
    got = np.asarray(theta.modified_theta(a, b, jnp.asarray(zs), tau))
    want = np.array(
        [np.exp(np.pi * 1j * tau * a**2 + 2j * np.pi * a * (z + b)) * mp_theta(z + a * tau + b, tau)
         for z in zs]
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# interpolation vs scipy
# ---------------------------------------------------------------------------

def test_whittaker_shannon_recovers_bandlimited():
    xs = np.linspace(-10, 10, 201)
    f = lambda x: np.exp(-x**2 / 2) * np.cos(2 * x)
    new_xs = xs + 0.05  # subgrid shift
    got = np.asarray(interp.whittaker_shannon(jnp.asarray(xs), jnp.asarray(f(xs)), jnp.asarray(new_xs)))
    np.testing.assert_allclose(got, f(new_xs), atol=1e-6)


def test_warp_2d_matches_scipy_rgi():
    rng = np.random.default_rng(1)
    d = 40
    qs = np.linspace(-3, 3, d)
    tensor = rng.normal(size=(2, d, d, 3)) + 1j * rng.normal(size=(2, d, d, 3))
    angle = 0.3
    x, y = np.meshgrid(qs, qs, indexing="ij")
    xr, yr = np.cos(angle) * x + np.sin(angle) * y, -np.sin(angle) * x + np.cos(angle) * y

    got = np.asarray(interp.rotate_2d(jnp.asarray(qs), jnp.asarray(tensor), angle))

    want = np.empty_like(tensor)
    for a in range(2):
        for b in range(3):
            rgi = RegularGridInterpolator((qs, qs), tensor[a, :, :, b], method="linear",
                                          bounds_error=False, fill_value=0)
            want[a, :, :, b] = rgi((xr, yr))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_fourier_gate_on_gaussian():
    # vacuum is Fourier-invariant
    qs = np.linspace(-12, 12, 301)
    psi = np.pi**-0.25 * np.exp(-qs**2 / 2)
    got = np.asarray(interp.fourier(jnp.asarray(qs), jnp.asarray(psi.astype(complex))))
    np.testing.assert_allclose(got, psi, atol=1e-6)


def test_cft_momentum_kick():
    # CFT of e^{i p0 q} vacuum is vacuum shifted by p0
    qs = np.linspace(-15, 15, 401)
    p0 = 1.5
    psi = np.pi**-0.25 * np.exp(-qs**2 / 2) * np.exp(1j * p0 * qs)
    ps, f = interp.CFT(jnp.asarray(qs), jnp.asarray(psi))
    ps, f = np.asarray(ps), np.asarray(f)
    peak = ps[np.argmax(np.abs(f))]
    assert abs(peak - p0) < 0.1
    # Parseval with the grid measure
    dq = qs[1] - qs[0]
    dp = ps[1] - ps[0]
    np.testing.assert_allclose(np.sum(np.abs(f) ** 2) * dp, np.sum(np.abs(psi) ** 2) * dq, rtol=1e-6)


# ---------------------------------------------------------------------------
# truncated SVD with static shapes
# ---------------------------------------------------------------------------

def test_tensor_svd_reconstructs():
    rng = np.random.default_rng(2)
    t = rng.normal(size=(3, 8, 8, 2)) + 1j * rng.normal(size=(3, 8, 8, 2))
    m1, m2, rank = linalg.tensor_svd(jnp.asarray(t), (0, 1), (2, 3))
    recon = np.einsum("abj,jcd->abcd", np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(recon, t, atol=1e-10)


def test_tensor_svd_truncation_rule_matches_reference():
    """Kept rank must follow the reversed-cumsum rule of reference mps.py:87-89."""
    rng = np.random.default_rng(3)
    m = rng.normal(size=(30, 30))
    rel_err = 0.05
    u, s, vh = np.linalg.svd(m)
    allowed = s.sum() * rel_err
    want_r = int(np.sum(np.flip(s).cumsum() > allowed))

    m1, m2, rank = linalg.tensor_svd(
        jnp.asarray(m), (0,), (1,), max_bond_dim=25, rel_err=rel_err,
        key=jax.random.PRNGKey(0),
    )
    assert int(rank) == min(want_r, 25)
    # reconstruction error bounded by dropped singular mass
    recon = np.asarray(m1) @ np.asarray(m2)
    dropped = s[int(rank):].sum()
    assert np.linalg.norm(recon - m, ord="fro") <= dropped + 1e-9


def test_tensor_svd_zero_padding_is_inert():
    rng = np.random.default_rng(4)
    t = rng.normal(size=(2, 6, 6, 2))
    m1, m2, rank = linalg.tensor_svd(jnp.asarray(t), (0, 1), (2, 3), max_bond_dim=3,
                                     key=jax.random.PRNGKey(1))
    # columns beyond the kept rank are exactly zero
    m1 = np.asarray(m1).reshape(12, -1)
    m2 = np.asarray(m2).reshape(m2.shape[0], -1)
    r = int(rank)
    assert np.all(m1[:, r:] == 0)
    assert np.all(m2[r:, :] == 0)


def test_randomized_svd_close_to_exact():
    rng = np.random.default_rng(5)
    # low-rank + noise
    A = rng.normal(size=(200, 40)) @ rng.normal(size=(40, 150))
    U, s, Vh = linalg.randomized_truncated_svd(jnp.asarray(A), 40, jax.random.PRNGKey(2))
    s_exact = np.linalg.svd(A, compute_uv=False)[:40]
    np.testing.assert_allclose(np.asarray(s), s_exact, rtol=1e-6)
