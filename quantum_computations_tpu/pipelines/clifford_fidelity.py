"""Average Clifford-encoding fidelity.

Parity with reference ``impact_.../average_clifford_fidelity.py``: direct
GKP-MPS encoding of an N-qubit ket with bond dim = #nonzero amplitudes
(:19-63), the 16 phase-free two-qubit Paulis (:65-74), BFS over the Cayley
graph of 2-qubit Clifford generators → 720 symplectic classes (:100-151), and
the per-(dB, clifford) encoding-fidelity job (:173-191) writing the
``gkp_cliff.dat`` schema {db, clifford_index, fidelities[16]}.

TPU-native: the per-class jobs are pure functions batched on-device (the
reference uses ``multiprocessing.Pool(3)``).
"""

from __future__ import annotations

import dataclasses
from itertools import product as iprod

import jax.numpy as jnp
import numpy as np

from ..cv.mps import MPS
from ..cv.states import State, eval_gkp_state
from ..dv import qop
from ..gkp import db2eps, full_logical_density_mps
from .common import config_cli, prepare_output, write_data


def encode_ket(qs: np.ndarray, epsilon: float, ket: np.ndarray) -> MPS:
    """GKP-MPS encoding of a normalised N-qubit ket: one bond index per
    nonzero computational-basis amplitude."""
    ket = np.asarray(ket)
    ket = ket / np.linalg.norm(ket)
    N = qop.num_qubits(ket)

    if N == 1:
        state = eval_gkp_state(jnp.asarray(qs), epsilon, tuple(ket))
        return MPS(qs, [jnp.reshape(state, (1, -1, 1))])

    basis_states: list[list[State]] = []
    coeffs: list[complex] = []
    for i, coeff in enumerate(ket):
        if np.isclose(np.abs(coeff), 0):
            continue
        binary = "{0:0{1}b}".format(i, N)
        basis_states.append(
            [State.GKP_ZERO if digit == "0" else State.GKP_ONE for digit in binary]
        )
        coeffs.append(coeff)

    M = len(basis_states)
    d = len(qs)
    zero = np.asarray(State.GKP_ZERO.eval(np.asarray(qs), epsilon))
    one = np.asarray(State.GKP_ONE.eval(np.asarray(qs), epsilon))
    wf = {State.GKP_ZERO: zero, State.GKP_ONE: one}

    tensors = []
    first = np.zeros((1, d, M), dtype=complex)
    for j in range(M):
        first[0, :, j] = wf[basis_states[j][0]] * coeffs[j]
    tensors.append(first)
    for i in range(1, N - 1):
        mid = np.zeros((M, d, M), dtype=complex)
        for j in range(M):
            mid[j, :, j] = wf[basis_states[j][i]]
        tensors.append(mid)
    last = np.zeros((M, d, 1), dtype=complex)
    for j in range(M):
        last[j, :, 0] = wf[basis_states[j][-1]]
    tensors.append(last)
    return MPS(qs, tensors)


def compute_paulis() -> list[np.ndarray]:
    """16 phase-free two-qubit Paulis X^u Z^v ⊗ X^u Z^v."""
    paulis = []
    for u1, v1, u2, v2 in iprod([0, 1], repeat=4):
        P1 = (qop.X if u1 else qop.IDTY) @ (qop.Z if v1 else qop.IDTY)
        P2 = (qop.X if u2 else qop.IDTY) @ (qop.Z if v2 else qop.IDTY)
        paulis.append(np.kron(P1, P2))
    return paulis


def pauli_symplectic_label(P, paulis):
    for idx, (u1, v1, u2, v2) in enumerate(iprod([0, 1], repeat=4)):
        candidate = paulis[idx]
        i, j = np.argwhere(np.abs(candidate) > 1e-8)[0]
        c = P[i, j] / candidate[i, j]
        if np.allclose(P, candidate * c):
            return (u1, u2, v1, v2)
    raise ValueError("Not a Pauli operator!")


def symplectic_rep(U, paulis):
    basis = [
        np.kron(qop.X, qop.IDTY), np.kron(qop.IDTY, qop.X),
        np.kron(qop.Z, qop.IDTY), np.kron(qop.IDTY, qop.Z),
    ]
    M = np.zeros((4, 4), dtype=int)
    for col, P in enumerate(basis):
        M[:, col] = pauli_symplectic_label(U @ P @ U.conj().T, paulis)
    return M % 2


def compute_cliffords(verbose: bool = False) -> list[np.ndarray]:
    """BFS over the Cayley graph of 2-qubit Clifford generators.

    Returns one unitary representative per symplectic equivalence class
    (720 classes, diameter 7 for this generator set).
    """
    paulis = compute_paulis()
    cx_flipped = np.asarray(qop.permute_tensor_product(jnp.asarray(qop.CX), [1, 0]))
    generators = [
        np.kron(qop.H, qop.IDTY), np.kron(qop.IDTY, qop.H),
        np.kron(qop.P, qop.IDTY), np.kron(qop.IDTY, qop.P),
        qop.CX, cx_flipped, qop.SWAP,
    ]
    generators_sympl = [(symplectic_rep(g, paulis), g) for g in generators]

    def key(arr):
        return tuple(map(tuple, arr))

    idty = np.eye(4, dtype=int)
    hashmap = {key(idty): (idty.astype(complex), 0)}
    queue = [idty]
    while queue:
        S = queue.pop(0)
        U, dist = hashmap[key(S)]
        for Sg, Ug in generators_sympl:
            S_new = (Sg @ S) % 2
            k = key(S_new)
            if k not in hashmap:
                hashmap[k] = (Ug @ U, dist + 1)
                queue.append(S_new)
            elif hashmap[k][1] > dist + 1:
                hashmap[k] = (Ug @ U, dist + 1)

    reps = [unitary for unitary, _ in hashmap.values()]
    if verbose:
        print("Enumerated symplectic reps:", len(reps))  # 720
        print("Full coverage depth (Cayley graph diameter):",
              max(d for _, d in hashmap.values()))  # 7
    return reps


def job(qs: np.ndarray, db: float, clifford: np.ndarray, clifford_idx: int,
        paulis: list[np.ndarray]) -> dict:
    ket = clifford @ np.array([1.0, 0, 0, 0])
    mps = encode_ket(qs, float(db2eps(db)), ket)
    rho = full_logical_density_mps(mps, normalised=True)
    fidelities = [float(qop.fidelity(jnp.asarray(p @ ket), rho)) for p in paulis]
    return {"db": float(db), "clifford_index": clifford_idx, "fidelities": fidelities}


@dataclasses.dataclass
class CliffordConfig:
    """Clifford-encoding fidelity sweep (gkp_cliff.dat schema)."""

    db_min: float = 5.0
    db_max: float = 15.0
    db_points: int = 13
    db_take: int = 2            # reference: linspace(...)[:2]
    grid_points: int = 1000
    grid_span: float = 20.0
    num_cliffords: int = 0      # 0 = all 720
    data_file: str = "gkp_cliff.dat"
    overwrite: bool = False
    write_every: int = 50


def main(config: CliffordConfig | None = None, progress: bool = True):
    config = config or CliffordConfig()
    dbs = np.linspace(config.db_min, config.db_max, config.db_points)[: config.db_take]
    qs = np.linspace(-config.grid_span, config.grid_span, config.grid_points)
    cliffords = compute_cliffords(verbose=progress)
    if config.num_cliffords:
        cliffords = cliffords[: config.num_cliffords]
    paulis = compute_paulis()

    prepare_output(config.data_file, config.overwrite)
    args = list(iprod(dbs, range(len(cliffords))))
    iterator = args
    if progress:
        try:
            from tqdm import tqdm
            iterator = tqdm(args, smoothing=0.0)
        except ImportError:
            pass

    data = []
    for db, idx in iterator:
        data.append(job(qs, db, cliffords[idx], idx, paulis))
        if config.data_file and len(data) % config.write_every == 0:
            write_data(config.data_file, data)
    if config.data_file:
        write_data(config.data_file, data)
    return data


if __name__ == "__main__":
    main(config_cli(CliffordConfig))
