"""Quantum process tomography toolbox.

Parity with reference ``impact_.../tomography.py``: Kraus-channel builder
(:14-41), state/pure-ket/Pauli operator bases (:44-71), least-squares
superoperator via pseudo-inverse (:78-106), chi matrix from the inverted
Lambda tensor (:109-142), Kraus extraction by eigendecomposition (:145-156)
and the full CPTP-checked ``process_tomography`` (:187-215).
"""

from __future__ import annotations

from itertools import product as iprod
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..dv import qop

Channel = Callable


def quantum_channel(Ks, *, ket_input: bool = False, return_input: bool = False,
                    normalise: bool = False):
    """Channel rho -> sum_i K_i rho K_i^dagger from Kraus operators.

    Ks may be a plain list or (weights, operators) tuple.
    """
    if isinstance(Ks, tuple) and len(Ks) == 2 and isinstance(Ks[1], list):
        c1 = lambda rho: sum(d * K @ rho @ np.conj(K.T) for d, K in zip(*Ks))
    else:
        c1 = lambda rho: sum(K @ rho @ np.conj(K.T) for K in Ks)
    c2 = (lambda rho: c1(rho) / np.trace(c1(rho))) if normalise else c1
    c3 = (lambda rho: (rho, c2(rho))) if return_input else c2
    if ket_input:
        return lambda ket: c3(np.outer(ket, np.conj(ket)))
    return c3


def state_basis(N: int) -> list[np.ndarray]:
    kets = [np.asarray(qop.tensor(*k)) for k in iprod(*[[qop.ZERO, qop.ONE]] * N)]
    return [np.outer(n, m) for n, m in iprod(kets, kets)]


def pure_state_basis_kets(N: int) -> list[np.ndarray]:
    kets = [np.asarray(qop.tensor(*k)) for k in iprod(*[[qop.ZERO, qop.ONE]] * N)]
    basis = [k.astype(complex) for k in kets]
    for i, n in enumerate(kets):
        for m in kets[i + 1:]:
            basis.append((n + m) * 2**-0.5)
            basis.append((n + 1j * m) * 2**-0.5)
    return basis


def operator_basis(N: int) -> list[np.ndarray]:
    paulis = [qop.IDTY / np.sqrt(2), qop.X / np.sqrt(2), qop.Y / np.sqrt(2),
              qop.Z / np.sqrt(2)]
    return [np.asarray(qop.tensor(*ops)) for ops in iprod(*[paulis] * N)]


def process_matrix(inputs: list[np.ndarray], outputs: list[np.ndarray]) -> np.ndarray:
    """Least-squares superoperator fit B = M A (pinv with numpy's cutoff)."""
    if len(inputs) != len(outputs):
        raise ValueError("Inconsistent number of inputs to outputs.")
    A = np.array([np.asarray(rho).flatten() for rho in inputs]).T
    B = np.array([np.asarray(rho).flatten() for rho in outputs]).T

    U, S, Vh = np.linalg.svd(A, full_matrices=False)
    cutoff = max(A.shape) * np.finfo(A.dtype).eps * max(S)
    nonzero = S > cutoff
    if np.sum(nonzero) < A.shape[1]:
        raise ValueError("Insufficiently sampled input set.")
    S_inv = np.zeros_like(S)
    S_inv[nonzero] = 1.0 / S[nonzero]
    A_pinv = Vh.conj().T @ np.diag(S_inv) @ U.conj().T
    return B @ A_pinv


def lambda_inv(N: int) -> np.ndarray:
    d = 4**N
    Lambda = np.zeros((d,) * 4, dtype=complex)
    for i, e in enumerate(state_basis(N)):
        for m, E1 in enumerate(operator_basis(N)):
            for n, E2 in enumerate(operator_basis(N)):
                Lambda[i, :, m, n] = (E1 @ e @ E2).flatten()
    Linv = np.linalg.pinv(np.reshape(Lambda, (d**2, d**2)))
    return np.reshape(Linv, (d,) * 4)


def chi_matrix(process_mat: np.ndarray, N: int, *, strict: bool = False) -> np.ndarray:
    chi = np.einsum("mnij,ij->mn", lambda_inv(N), process_mat)
    if strict:
        if not np.allclose(chi, chi.conj().T):
            raise ValueError("Chi matrix not completely positive (CP)")
        basis = operator_basis(N)
        test = sum(chi[n, m] * Pm @ Pn for n, Pn in enumerate(basis)
                   for m, Pm in enumerate(basis))
        if not np.allclose(test, np.identity(test.shape[0])):
            raise ValueError("Chi matrix not trace preserving (TP)")
    return chi


def kraus_operators(chi: np.ndarray, N: int) -> tuple[np.ndarray, list[np.ndarray]]:
    D, U = np.linalg.eigh(chi)
    Ks = []
    for eigvec in U.T:
        Ks.append(sum(oper * val for oper, val in zip(operator_basis(N), eigvec)))
    return D, Ks


# Spelling alias for reference parity (the reference spells it "krauss").
krauss_operators = kraus_operators


def eval_process(process, N: int, ket_input: bool):
    inputs = pure_state_basis_kets(N)
    outputs = []
    for i, ket in enumerate(inputs):
        inp, out = process(ket) if ket_input else process(np.outer(ket, np.conj(ket)))
        inputs[i] = inp
        outputs.append(out)
    return inputs, outputs


def process_tomography(process, N: int, *, ket_input: bool = True,
                       normalised: bool = False, full_output: bool = False,
                       strict: bool = False, cutoff: float = 1e-12):
    """Kraus operators {K_i} with process(rho) = sum K_i rho K_i^dagger."""
    M = process_matrix(*eval_process(process, N, ket_input))
    chi = chi_matrix(M, N, strict=strict)
    if not np.allclose(chi, np.conj(chi.T)):
        raise ValueError("Process is not a CPTP map!")
    D, Ks = kraus_operators(chi, N)
    if not full_output:
        keep = D > cutoff
        D = D[keep]
        Ks = [K for K, f in zip(Ks, keep) if f]
    if normalised:
        return D, Ks
    return [np.sqrt(d) * K for d, K in zip(D, Ks)]
