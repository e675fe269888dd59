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


# -- plotting helpers (reference utils.py:123-209) ---------------------------

def get_tickmarks(lo, hi, alt_labels: bool = False):
    """sqrt(pi)-lattice tick positions and labels for phase-space plots."""
    ns = np.arange(round(lo / SQPI), round(hi / SQPI) + 1, 1)
    ticks = ns * SQPI
    if alt_labels:
        labels = np.array([str(n) for n in ns], dtype=object)
    else:
        labels = []
        for n in ns:
            if n == 0:
                labels.append(r"$0$")
                continue
            prefix = {-1: "-", 1: ""}.get(n, str(n))
            labels.append("$" + prefix + r"\sqrt{\pi}$")
        labels = np.array(labels, dtype=object)
    labels[ns % 2 == 1] = ""
    return ticks, list(labels)


def plot_single_mode(xs, state):
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(8, 3))
    ax.plot(xs, np.real(state), "k-", label=r"$\mathrm{Re}(\psi(q))$")
    ax.plot(xs, np.imag(state), "r--", label=r"$\mathrm{Im}(\psi(q))$")
    ax.set_xticks(*get_tickmarks(min(xs), max(xs), True))
    ax.set_xlabel(r"$q/\sqrt{\pi}$")
    ax.legend()
    fig.tight_layout()
    return fig, ax


def plot_two_mode(x, y, state, projections: bool = False):
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    state = np.asarray(state)
    if projections:
        gs = fig.add_gridspec(2, 2, width_ratios=(4, 1), height_ratios=(1, 4),
                              left=0.1, right=0.9, bottom=0.1, top=0.9,
                              wspace=0.05, hspace=0.05)
        ax = fig.add_subplot(gs[1, 0])
        ax_x = fig.add_subplot(gs[0, 0], sharex=ax)
        ax_y = fig.add_subplot(gs[1, 1], sharey=ax)
        dx = (x[-1] - x[0]) / len(x)
        dy = (y[-1] - y[0]) / len(y)
        y_int = np.einsum("ij,ij->i", state, state.conj()).real * dy
        x_int = np.einsum("ij,ij->j", state, state.conj()).real * dx
        span = (min(x_int.min(), y_int.min()), max(x_int.max(), y_int.max()))
        width = span[1] - span[0]
        lims = (span[0] - width / 10, span[1] + width / 10)
        ax_x.plot(x, y_int, "k-")
        ax_x.grid(axis="x")
        ax_x.tick_params(axis="x", labelbottom=False)
        ax_x.set_ylim(*lims)
        ax_y.plot(x_int, y, "k-")
        ax_y.grid(axis="y")
        ax_y.tick_params(axis="y", labelleft=False)
        ax_y.set_xlim(*lims)
        axs = [ax, ax_x, ax_y]
    else:
        ax = fig.add_subplot(1, 1, 1)
        axs = ax

    ax.contour(*np.meshgrid(x, y, indexing="ij"), np.abs(state), 10, colors="Black")
    ax.set_xticks(*get_tickmarks(min(x), max(x), True))
    ax.set_xlabel(r"$q_1/\sqrt{\pi}$")
    ax.set_yticks(*get_tickmarks(min(y), max(y), True))
    ax.set_ylabel(r"$q_2/\sqrt{\pi}$")
    ax.grid()
    return fig, axs
