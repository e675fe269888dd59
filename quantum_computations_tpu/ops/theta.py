"""Jittable Jacobi theta functions.

Replaces the reference's ``np.vectorize(mpmath.jtheta)`` (documented-slow,
``simulators/cv_simulator/states.py:97-102``) with a truncated series — on the
finite grids used here (|q| < 1 with q = exp(i pi tau), Im(tau) > 0) a fixed
number of terms reaches float64 accuracy because terms decay like q^(n^2).

theta3(z, tau) = 1 + 2 * sum_{n>=1} q^(n^2) cos(2 n z)   [wiki convention
with z -> pi z applied by callers, matching the reference wrapper].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Term count: q^(n^2) < 1e-40 for the smallest Im(tau) in practice
# (eps ~ 0.02 -> |q| ~ e^{-0.03}: n ~ 55). 64 covers all pipeline settings.
DEFAULT_TERMS = 64


def theta3(z, tau, terms: int = DEFAULT_TERMS):
    """Jacobi theta_3 with the *wiki* convention used by the reference wrapper:
    reference ``theta(z, tau)`` computes jtheta(3, pi*z, exp(i pi tau)).
    Here `z` is the reference's (pre-pi-scaled) argument.
    """
    z = jnp.asarray(z)
    n = jnp.arange(1, terms + 1)
    # q^(n^2) = exp(i pi tau n^2)
    qn = jnp.exp(1j * jnp.pi * jnp.asarray(tau) * n**2)
    cos = jnp.cos(2 * jnp.pi * z[..., None] * n)
    return 1.0 + 2.0 * jnp.sum(qn * cos, axis=-1)


def modified_theta(a, b, z, tau, terms: int = DEFAULT_TERMS):
    """exp(pi i tau a^2 + 2 pi i a (z+b)) * theta3(z + a tau + b, tau)
    — reference ``states.py:104-105``."""
    z = jnp.asarray(z)
    pre = jnp.exp(jnp.pi * 1j * tau * a**2 + 2j * jnp.pi * a * (z + b))
    return pre * theta3(z + a * tau + b, tau, terms=terms)


def gaussians(s, delta_sq, alpha: float = 2 * np.sqrt(np.pi), terms: int = DEFAULT_TERMS):
    """Equally spaced normalised Gaussians of variance `delta_sq` at alpha*n
    — reference ``states.py:107-110``."""
    return theta3(s / alpha, 2j * jnp.pi * delta_sq / alpha**2, terms=terms) / alpha
