"""GKP error-correction validation suite.

Parity with reference ``performance_analysis_.../numerical_tests.ipynb``
as runnable code (the reference validates against StrawberryFields, which is
not available here; the framework's own grid projectors serve as the fast
path and the analytic formulas as the oracle):

- :func:`gaussian_product_identity_check` — Monte-Carlo check of the
  Gaussian-product identity ("Lemma 2 App. A", cell 2).
- :func:`steane_ec_width_test` — Steane-type EC on a finite-energy GKP state,
  fitting a sum of lattice Gaussians and comparing the output width to the
  analytic eps_ancilla*(1+2x)/(1+x) (q) and eps_ancilla*(1+x)/(2+x) (p)
  formulas (cells 4-7).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import curve_fit

import jax.numpy as jnp

from .gkp_ec import fourier, gkp_project_asym, gkp_sym, normalise


def gaussian_product_identity_check(samples: int = 100, seed: int = 1,
                                    grid_points: int = 1000) -> int:
    """Check the 1D x 2D Gaussian integral identity on random cases.

    Returns the number of failed cases (0 expected).
    """
    def G1(q, mu, Q):
        return np.exp(-(q - mu) ** 2 / 2 * Q)

    def G2(q, mu, Q):
        return np.exp(
            -((q[0] - mu[0]) ** 2 * Q[0, 0] + (q[1] - mu[1]) ** 2 * Q[1, 1]
              + 2 * (q[0] - mu[0]) * (q[1] - mu[1]) * Q[0, 1]) / 2
        )

    qs = np.linspace(-10, 10, grid_points)
    rng = np.random.default_rng(seed)
    failed = 0
    for _ in range(samples):
        mu = (rng.random() - 0.5) * 6
        q = 1 / (rng.random() * 2)
        mu_vec = (rng.random(2) - 0.5) * 6
        Q = np.diag(1 / (rng.random(2) * 2))
        theta = rng.random() * 2 * np.pi
        O = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
        Q = O.T @ Q @ O

        g1 = G1(qs, mu, q)
        g2 = G2(np.meshgrid(qs, qs, indexing="ij"), mu_vec, Q)
        integrand = np.einsum("i,ij->ij", g1, g2)
        I_numeric = np.trapezoid(integrand, qs, axis=0) / np.sqrt(2 * np.pi)

        detQ = np.linalg.det(Q)
        n = np.sqrt(q + Q[0, 0])
        rho_sqrd = 1 / q + Q[1, 1] / detQ
        nu = mu_vec[1] + q * Q[0, 1] / (detQ + q * Q[1, 1]) * (mu_vec[0] - mu)
        sigma_sqrd = (Q[0, 0] + q) / (detQ + q * Q[1, 1])
        I_analytic = (
            1 / n * G1(mu_vec[0] - mu, 0, 1 / rho_sqrd) * G1(qs, nu, 1 / sigma_sqrd)
        )
        if not np.allclose(I_numeric, I_analytic):
            failed += 1
    return failed


def _gaussian(x, mu, sigma):
    return np.exp(-((x - mu) ** 2) / (2 * sigma**2)) / (np.sqrt(2 * np.pi) * sigma)


def _sum_of_gaussians(x, *params):
    n = len(params) // 2
    a, sigma = params[:n], params[n:]
    mu = (np.arange(n) - (n - 1) // 2) * np.sqrt(np.pi)
    y = np.zeros_like(x)
    for i in range(n):
        y += a[i] * _gaussian(x, mu[i], sigma[i])
    return y


def fit_lattice_gaussians(qs: np.ndarray, amplitude: np.ndarray,
                          n_gaussians: int = 9, sigma0: float = 0.3) -> float:
    """Fit |psi| as a sum of Gaussians on the sqrt(pi) lattice; returns the
    weight-filtered mean squared width."""
    p0 = np.hstack([np.ones(n_gaussians), np.ones(n_gaussians) * sigma0])
    popt, _ = curve_fit(_sum_of_gaussians, qs, np.abs(amplitude), p0=p0, maxfev=20000)
    weights, sigmas = popt[:n_gaussians], popt[n_gaussians:]
    filtered = [s for s, w in zip(sigmas, weights) if w > 0.05]
    return float(np.mean(filtered) ** 2)


def steane_ec_width_test(epsilon_in: float = 0.1, epsilon_ancilla: float = 0.08,
                         grid_points: int = 1000) -> dict:
    """Steane-type EC on a GKP |H> state; returns numerical vs analytic widths.

    Analytic output widths (reference cell 7):
      q: eps_ancilla * (1 + 2x) / (1 + x),  x = eps_in / eps_ancilla
      p: eps_ancilla * (1 + x) / (2 + x)
    """
    qs = np.linspace(-20, 20, grid_points)
    jqs = jnp.asarray(qs)
    zero = np.asarray(normalise(jqs, gkp_sym(jqs, epsilon_ancilla, (1, 0))))
    state_in = np.asarray(normalise(
        jqs, gkp_sym(jqs, epsilon_in, (np.cos(np.pi / 8), np.sin(np.pi / 8)))
    ))
    state_q = np.asarray(normalise(jqs, gkp_project_asym(jqs, jnp.asarray(state_in), jnp.asarray(zero))))
    state_p = np.asarray(fourier(jqs, jnp.asarray(state_q)))

    x = epsilon_in / epsilon_ancilla
    out = {
        "epsilon_in": epsilon_in,
        "epsilon_ancilla": epsilon_ancilla,
        "analytic_q": epsilon_ancilla * (1 + 2 * x) / (1 + x),
        "analytic_p": epsilon_ancilla * (1 + x) / (2 + x),
        "numeric_q": fit_lattice_gaussians(qs, state_q, sigma0=epsilon_ancilla**0.5),
        "numeric_p": fit_lattice_gaussians(qs, state_p, sigma0=epsilon_ancilla**0.5),
    }
    return out


if __name__ == "__main__":
    failed = gaussian_product_identity_check()
    print(f"Gaussian-product identity: {failed} failed cases")
    res = steane_ec_width_test()
    print("Steane EC width test:")
    for k, v in res.items():
        print(f"  {k}: {v:.5f}")
