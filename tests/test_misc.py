"""Wigner function, colours, explorer regime maps."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from quantum_computations_tpu.ops.interp import wigner
from quantum_computations_tpu.utils.colour import Colour
from quantum_computations_tpu.distill.explorer import load_rate_surfaces, regime_map, save_rate_surfaces


def test_wigner_vacuum():
    # Vacuum Wigner: W(q,p) = exp(-(q^2+p^2)) / pi  (hbar=1, psi = pi^-1/4 e^{-q^2/2})
    qs = np.linspace(-8, 8, 321)
    psi = np.pi**-0.25 * np.exp(-qs**2 / 2)
    ps, W = wigner(jnp.asarray(qs), jnp.asarray(psi.astype(complex)))
    W = np.asarray(W)
    want = np.exp(-(qs[:, None] ** 2 + np.asarray(ps)[None, :] ** 2)) / np.pi
    np.testing.assert_allclose(W, want, atol=2e-3)
    # normalisation: integral of W over phase space = 1
    dq = qs[1] - qs[0]
    dp = float(ps[1] - ps[0])
    assert abs(W.sum() * dq * dp - 1.0) < 1e-2


def test_wigner_cat_state_negativity():
    qs = np.linspace(-10, 10, 401)
    alpha = 2.0
    psi = np.exp(-((qs - alpha * np.sqrt(2)) ** 2) / 2) + np.exp(-((qs + alpha * np.sqrt(2)) ** 2) / 2)
    psi = psi / np.sqrt((np.abs(psi) ** 2).sum() * (qs[1] - qs[0]))
    _, W = wigner(jnp.asarray(qs), jnp.asarray(psi.astype(complex)))
    assert float(np.asarray(W).min()) < -0.05  # interference fringes go negative


def test_colour_wrap():
    s = Colour.wrap("hi", Colour.RED, Colour.BOLD)
    assert s.startswith(Colour.RED) and s.endswith(Colour.RESET)


def test_rate_surface_roundtrip(tmp_path):
    x = np.logspace(-2, 0, 5)
    y = np.arange(1000, 6000, 1000)
    r1 = np.random.default_rng(0).random((5, 5))
    r2 = np.zeros((5, 5))
    path = tmp_path / "plot.dat"
    save_rate_surfaces(path, x, y, [r1, r2], ["A", "B"])
    x2, y2, rs, labels = load_rate_surfaces(path)
    np.testing.assert_allclose(x2, x)
    assert labels == ["A", "B"]
    Z, ids = regime_map(rs)
    assert set(np.unique(ids)) <= {0, 1, -1}
    assert np.all(ids[r1 > 0] == 0)
