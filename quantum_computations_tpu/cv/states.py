"""CV mode states on the position grid.

Parity with reference ``simulators/cv_simulator/states.py``: named states
(:9-67), analytic wavefunctions (:83-93) and finite-energy GKP states via
theta functions (:97-121) — but fully jittable (truncated theta series from
:mod:`..ops.theta` instead of vectorized mpmath; validated against mpmath in
tests).
"""

from __future__ import annotations

from enum import Enum, auto

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import factorial

from ..config import complex_dtype
from ..ops.theta import modified_theta, theta3

PI = np.pi
SQPI = np.sqrt(np.pi)


# ---------------------------------------------------------------------------
# Analytic wavefunctions (jittable; q may be an array)
# ---------------------------------------------------------------------------

def rotated_eigenstate(q, x, theta):
    return (2 * PI * jnp.abs(jnp.sin(theta))) ** -0.5 * jnp.exp(
        -1j * (jnp.cos(theta) * (q * q + x * x) / 2 - x * q) / jnp.sin(theta)
    )


def momentum_eigenstate(q, p):
    return jnp.exp(-1j * q * p) / SQPI


def _delta_theta(delta, theta):
    return jnp.sqrt((jnp.cos(theta) * delta) ** 2 + (jnp.sin(theta) / delta) ** 2)


def squeezed_coherent(q, alpha, r, theta):
    alpha = jnp.asarray(alpha, dtype=complex_dtype())
    d = _delta_theta(jnp.exp(r), theta)
    return (PI * d**2) ** (-1 / 4) * jnp.exp(
        -0.5 * ((q - alpha.real) / d) ** 2 * (1 - 1j * jnp.sinh(2 * r) * jnp.sin(2 * theta))
        + 1j * alpha.imag * q
    )


def vacuum(q):
    return squeezed_coherent(q, 0.0, 0.0, 0.0)


def coherent(q, alpha):
    return squeezed_coherent(q, alpha, 0.0, 0.0)


def squeezed_vac(q, r):
    return squeezed_coherent(q, 0.0, r, 0.0)


def fock_state(q, n: int):
    """n-th Fock state via the Hermite recurrence (host-precomputable)."""
    q = jnp.asarray(q)
    h_prev = jnp.ones_like(q)
    h = 2 * q
    if n == 0:
        h = h_prev
    else:
        for k in range(1, n):
            h, h_prev = 2 * q * h - 2 * k * h_prev, h
    return h * jnp.exp(-(q**2) / 2) * (2**n * float(factorial(n)) * SQPI) ** -0.5


# ---------------------------------------------------------------------------
# GKP states (Matsuura et al. symmetric approximation; reference states.py:112-121)
# ---------------------------------------------------------------------------

def gkp(q, kappa, delta, state=(1, 0)):
    env = jnp.exp(-(q**2) / 2 / ((1 + delta**2 * kappa**2) / kappa**2))
    tau = 0.5j * delta**2 / (1 + kappa**2 * delta**2)
    tot = 0.0
    for mu, c in enumerate(state):
        tot = tot + c * modified_theta(0, mu / 2, -q / (2 * SQPI * (1 + kappa**2 * delta**2)), tau)
    return env * tot


def gkp_sym(q, epsilon, state=(1, 0)):
    env = jnp.exp(-jnp.tanh(epsilon) * q**2 / 2)
    tau = 1j * jnp.tanh(epsilon) / 2
    tot = 0.0
    for mu, c in enumerate(state):
        tot = tot + c * modified_theta(0, mu / 2, -q / (2 * SQPI * jnp.cosh(epsilon)), tau)
    return env * tot


def comb(q, kappa, delta, alpha):
    env = jnp.exp(-(q**2) / 2 / ((1 + delta**2 * kappa**2) / kappa**2))
    return env * modified_theta(
        0, 0, -q / (alpha * (1 + kappa**2 * delta**2)), 1j * delta**2 / (1 + kappa**2 * delta**2)
    )


def comb_sym(q, epsilon, alpha):
    env = jnp.exp(-jnp.tanh(epsilon) * q**2 / 2)
    return env * modified_theta(0, 0, -q / (alpha * jnp.cosh(epsilon)), 1j * jnp.tanh(epsilon))


def qunaught(q, epsilon):
    return comb_sym(q, epsilon, np.sqrt(2 * PI))


def _grid_normalise(qs, result):
    dq = jnp.abs(qs[-1] - qs[0]) / (qs.shape[0] - 1)
    norm_sq = jnp.sum(result * jnp.conjugate(result)).real * dq
    return result / jnp.sqrt(norm_sq)


def eval_gkp_state(qs, epsilon, coefficients):
    """Grid-normalised finite-energy GKP state with logical coefficients."""
    return _grid_normalise(qs, gkp_sym(qs, epsilon, coefficients)).astype(complex_dtype())


class State(Enum):
    GKP_ZERO = auto()
    GKP_ONE = auto()
    GKP_PLUS = auto()
    GKP_MINUS = auto()
    GKP_T = auto()
    GKP_TDG = auto()
    GKP_H = auto()
    VACUUM = auto()
    QUNAUGHT = auto()

    def __repr__(self):
        return self.name

    def __str__(self):
        return self.name

    def gkp_coefficients(self):
        match self:
            case State.GKP_ZERO:
                return (1, 0)
            case State.GKP_ONE:
                return (0, 1)
            case State.GKP_PLUS:
                return (1, 1)
            case State.GKP_MINUS:
                return (1, -1)
            case State.GKP_T:
                return (1, np.exp(1j * PI / 4))
            case State.GKP_TDG:
                return (1, np.exp(-1j * PI / 4))
            case State.GKP_H:
                return (np.cos(PI / 8), np.sin(PI / 8))
            case _:
                return None

    def eval(self, qs, gkp_epsilon: float | None = None) -> jax.Array:
        """Grid-normalised wavefunction of this state on `qs`.

        Jittable in (qs, gkp_epsilon); host-side validation only happens for
        concrete numpy input.
        """
        if isinstance(qs, np.ndarray):
            if qs.ndim != 1:
                raise TypeError("qs must be a 1D array.")
            if not np.allclose(np.diff(qs, 2), 0, atol=np.finfo(qs.dtype).eps**0.5):
                raise ValueError("qs is not an arithmetic progression.")
        if gkp_epsilon is not None and not isinstance(gkp_epsilon, jax.Array) and gkp_epsilon <= 0:
            raise ValueError("epsilon must be a positive real number")
        qs = jnp.asarray(qs)

        coeffs = self.gkp_coefficients()
        if coeffs is not None:
            if gkp_epsilon is None:
                raise ValueError("Evaluating gkp states require a gkp_epsilon.")
            result = gkp_sym(qs, gkp_epsilon, coeffs)
        elif self is State.VACUUM:
            result = vacuum(qs)
        elif self is State.QUNAUGHT:
            if gkp_epsilon is None:
                raise ValueError("Evaluating qunaught states require a gkp_epsilon.")
            result = comb_sym(qs, gkp_epsilon, np.sqrt(2 * PI))
        else:
            raise NotImplementedError(self)

        return _grid_normalise(qs, result).astype(complex_dtype())
