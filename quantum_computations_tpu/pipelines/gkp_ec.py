"""GKP error-correction performance analysis.

Parity with reference ``performance_analysis_of_gkp_error_correction/utils.py``:
the Steane-type projector via convolution (:47-56), the symmetric
(Knill/teleportation) Bell-kernel projector (:58-64), the dense-grid logical
density matrix (:66-113, fixed 10-term operator sum) and ``logical_fidelity``
(:115-118). All jittable JAX; the fftconvolve becomes an FFT product.
"""

from __future__ import annotations

from itertools import product as iprod

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PRECISION, complex_dtype
from ..cv.states import gkp_sym, comb_sym  # re-export surface for this project
from ..ops.interp import whittaker_shannon

PI = np.pi
SQPI = np.sqrt(np.pi)


def normalise(qs, state):
    norm = jnp.sqrt(jnp.trapezoid((state * jnp.conj(state)).real, jnp.asarray(qs)))
    return state / norm


def fourier(qs, state):
    """Single-axis continuous FT evaluated back on `qs` (reference :29-45)."""
    qs = jnp.asarray(qs)
    N = state.shape[0]
    T = (qs[-1] - qs[0]) * N / (N - 1)
    ps = jnp.fft.fftshift(jnp.fft.fftfreq(N, d=T / (N * 2 * PI)))
    fs = jnp.fft.fftshift(jnp.fft.fft(state))
    phase = T / (N * jnp.sqrt(2 * PI)) * jnp.exp(-1j * ps * qs[0])
    fs = fs * phase
    new_ps = (qs - ps[-1]) % (ps[-1] - ps[0]) + ps[0]
    return whittaker_shannon(ps, fs, new_ps)


def gkp_project_asym(qs, state, zero, axis: int = 0):
    """Steane-type EC projector: multiply by <+| on the ancilla quadrature and
    convolve with the |0> comb (reference fftconvolve :47-56, here an FFT
    product — exactly scipy's 'same'-mode linear convolution)."""
    qs = jnp.asarray(qs)
    dq = (qs[-1] - qs[0]) / qs.shape[0]
    plus = fourier(qs, zero)
    state = jnp.moveaxis(state, axis, 0)
    state = state * plus.reshape((-1,) + (1,) * (state.ndim - 1))

    n = state.shape[0]
    full = 2 * n - 1
    fft_len = int(2 ** np.ceil(np.log2(full)))
    sf = jnp.fft.fft(state, n=fft_len, axis=0)
    zf = jnp.fft.fft(zero, n=fft_len).reshape((-1,) + (1,) * (state.ndim - 1))
    conv = jnp.fft.ifft(sf * zf, axis=0)[: full]
    start = (full - n) // 2
    state = jax.lax.slice_in_dim(conv, start, start + n, axis=0) * dq
    return jnp.moveaxis(state, 0, axis)


def gkp_project_sym(qs, state, zero, one, axis: int = 0):
    """Symmetric (Knill/teleportation) projector via the Bell kernel."""
    qs = jnp.asarray(qs)
    dq = (qs[-1] - qs[0]) / qs.shape[0]
    bell = (jnp.outer(zero, zero) + jnp.outer(one, one)) * 2**-0.5
    state = jnp.tensordot(bell, state, axes=(1, axis), precision=PRECISION) * dq / jnp.sqrt(2 * PI)
    return jnp.moveaxis(state, 0, axis)


def _measurement_operators(qs: np.ndarray, n_terms: int = 10):
    """[I, X, Y, Z] measurement operators with the reference's fixed 10-term
    sum (range(1, 20, 2), reference :77)."""
    qs = np.asarray(qs)
    d = len(qs)
    dq = (qs[-1] - qs[0]) / d
    qd = qs[:, None] - qs[None, :]
    Im = np.identity(d)
    Xm = np.zeros((d, d))
    Zm = np.zeros((d, d))
    for n, m in enumerate(range(1, 2 * n_terms, 2)):
        coeff = (-1) ** (n % 2) * 2 / (m * PI)
        Xm += coeff * (np.sinc((qd - m * SQPI) / dq) + np.sinc((qd + m * SQPI) / dq))
        Zm += coeff * np.diag(2 * np.cos(SQPI * m * qs))
    Ym = 1j * Xm @ Zm
    return [Im, Xm, Ym, Zm]


def full_logical_density(qs, state) -> jax.Array:
    """Dense-grid logical density matrix of an N-mode state tensor."""
    qs = np.asarray(qs)
    dq = (qs[-1] - qs[0]) / len(qs)
    Pms = [jnp.asarray(p, dtype=complex_dtype()) for p in _measurement_operators(qs)]
    Ps = [np.eye(2), np.array([[0, 1], [1, 0]]),
          np.array([[0, -1j], [1j, 0]]), np.array([[1, 0], [0, -1]])]

    state = jnp.asarray(state, dtype=complex_dtype())
    N = state.ndim
    result = jnp.zeros((2**N, 2**N), dtype=complex_dtype())
    bra = jnp.conj(state)
    for index in iprod(*[[0, 1, 2, 3]] * N):
        ket = state
        for i in range(N):
            ket = jnp.tensordot(ket, Pms[index[i]], axes=((0,), (1,)), precision=PRECISION)
        coeff = (dq / 2) ** N * jnp.tensordot(bra, ket, axes=N, precision=PRECISION)
        pauli = 1
        for i in index:
            pauli = np.kron(pauli, Ps[i])
        result = result + coeff * jnp.asarray(pauli, dtype=complex_dtype())
    return result


def logical_fidelity(qs, state) -> float:
    rho = full_logical_density(qs, state)
    rho = rho / jnp.trace(rho)
    return float(jnp.trace(rho @ rho).real)
