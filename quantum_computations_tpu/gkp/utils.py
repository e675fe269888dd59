"""GKP logical readout and squeezing-unit helpers.

Parity with reference ``simulators/gkp_simulator/utils.py``: dB↔epsilon
conversions (:11-15), measurement decomposition (:17-29), syndrome-correction
operator (:31-40) and the Shaw-et-al. logical density matrix (:42-106,
arXiv:2403.02396 App. D).

TPU-native redesign of ``full_logical_density_mps``: instead of re-contracting
the chain for each of the 4^N Pauli strings (reference :84-91), we build one
(4, chi^2, chi^2) transfer tensor per mode and sweep the chain once,
accumulating a (4, ..., 4) coefficient tensor — O(N · chi^4 d) instead of
O(4^N · N · chi^4 d), and a single jittable XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PRECISION, complex_dtype
from ..dv import qop
from ..cv.mps import MPS, tensor_svd

PI = np.pi
SQPI = np.sqrt(np.pi)


def eps2db(epsilon: float) -> float:
    return -10.0 * np.log10(2.0 * np.tanh(np.asarray(epsilon) / 2.0))


def db2eps(db_squeezing: float) -> float:
    return 2.0 * np.arctanh(np.float_power(10.0, -np.asarray(db_squeezing) / 10.0) / 2.0)


def decomp_result(s):
    """n, r such that s = (n + r) sqrt(pi)."""
    n = np.round(np.asarray(s) / SQPI).astype(int)
    r = np.asarray(s) / SQPI - n
    return n, r


def format_result(s, dec: int = 4) -> str:
    n, r = decomp_result(float(s) * 2**0.5)
    return f"({n}{r:+.{dec}f})√π"


def cv2dv_information(s) -> bool:
    """Parity of the closest multiple of sqrt(pi)."""
    return bool(np.round(float(s) / SQPI) % 2 == 1)


def syndrome_matrix(syndromes: list[tuple[int, int]]) -> jax.Array:
    """Pauli correction operator ⨂_i X^x Z^z for syndrome bits (x, z)."""
    ms = []
    for x, z in syndromes:
        m = np.identity(2)
        if x:
            m = qop.X @ m
        if z:
            m = qop.Z @ m
        ms.append(m)
    return qop.tensor(*ms)


def pauli_measurement_operators(qs: np.ndarray) -> jax.Array:
    """Grid-sampled GKP Pauli *measurement* operators, stacked (4, d, d):
    [I, X, Y, Z] — Shaw et al. operator sums (reference utils.py:50-69).

    Precompute once per (qs,); contraction-ready for the transfer sweep.
    """
    qs = np.asarray(qs)
    d = len(qs)
    dq = (qs[-1] - qs[0]) / d  # reference convention (utils.py:47)
    q_diff = qs[:, None] - qs[None, :]

    Im = np.identity(d)
    Xm = np.zeros((d, d))
    Zm = np.zeros((d, d))
    max_m = int((qs[-1] - qs[0]) / SQPI) + 1
    for n, m in enumerate(range(1, max_m, 2)):
        coeff = (-1) ** (n % 2) * 2 / (m * PI)
        # sinc-interpolated displacement by ±m sqrt(pi)
        Xm += coeff * (np.sinc((q_diff - m * SQPI) / dq) + np.sinc((q_diff + m * SQPI) / dq))
        # linear phases combined into a cosine diagonal
        Zm += coeff * np.diag(2 * np.cos(SQPI * m * qs))
    Ym = 1j * Xm @ Zm
    return jnp.asarray(np.stack([Im, Xm, Ym, Zm]), dtype=complex_dtype())


_LOGICAL_PAULIS = np.stack([
    np.array([[1, 0], [0, 1]], dtype=complex),
    np.array([[0, 1], [1, 0]], dtype=complex),
    np.array([[0, -1j], [1j, 0]], dtype=complex),
    np.array([[1, 0], [0, -1]], dtype=complex),
])


def full_logical_density_mps(mps: MPS, normalised: bool = False) -> jax.Array:
    """Logical density matrix of an N-mode GKP MPS (Shaw et al. App. D)."""
    qs = np.asarray(mps.domain)
    dq = (qs[-1] - qs[0]) / len(qs)  # reference convention
    Pms = pauli_measurement_operators(qs)

    N = len(mps)
    # Transfer sweep: C has axes (p_1, ..., p_k, e) with e = (i, j) bond pair.
    C = jnp.ones((1, 1), dtype=complex_dtype()).reshape(1)  # e-dim flattened (1*1,)
    for m in mps:
        a, d, b = m.shape
        # E[p, (a b), (i j)] = sum_{c,d'} m[a,c,i] conj(m)[b,d',j] Pms[p,d',c]
        tmp = jnp.einsum("aci,pdc->padi", m, Pms, precision=PRECISION)
        E = jnp.einsum("padi,bdj->pabij", tmp, jnp.conj(m), precision=PRECISION)
        E = E.reshape(4, a * a, b * b)
        C = jnp.einsum("...e,pef->...pf", C, E, precision=PRECISION)
    C = C.reshape((4,) * N) * (dq / 2) ** N

    # rho = sum_p C[p] kron_k Ps[p_k]
    Ps = jnp.asarray(_LOGICAL_PAULIS, dtype=complex_dtype())
    rho = C
    for _ in range(N):
        # contract leading Pauli-string axis into matrix factors
        rho = jnp.tensordot(rho, Ps, axes=((0,), (0,)), precision=PRECISION)
    # rho now has axes (i_1, j_1, ..., i_N, j_N); interleave into (2^N, 2^N)
    perm = list(range(0, 2 * N, 2)) + list(range(1, 2 * N, 2))
    rho = jnp.transpose(rho, perm).reshape(2**N, 2**N)
    if normalised:
        rho = rho / jnp.trace(rho)
    return rho


def full_logical_density(qs, state, normalised: bool = False) -> jax.Array:
    """Dense-grid variant: SVD-factorise the dense N-mode state into an MPS
    first (reference utils.py:98-106)."""
    state = jnp.asarray(state)
    tensors = []
    state = state.reshape(1, *state.shape, 1)
    while state.ndim > 3:
        m, state, _ = tensor_svd(state, (0, 1), tuple(range(2, state.ndim)))
        tensors.append(m)
    tensors.append(state)
    return full_logical_density_mps(MPS(qs, tensors), normalised=normalised)
