"""Qubit operator/state toolbox (JAX).

Functional parity with the reference ``simulators/dv_simulator/numpy_quantum.py``
(constants :5-25, Pauli parsing :32-73, state constructors :76-97, rotations
:104-109, ket/dm conversions :112-128, fidelity :148-161, tensor :169-170,
permutation :212-240, gate expansion :243-251), but gate application is done
with tensordot on rank-N state tensors (`apply_unitary`) instead of building
the dense ``2^N x 2^N`` operator — the standard Schrödinger-style update that
XLA tiles onto the MXU.

Constants are NumPy (host-side, used to build circuits); functions accept and
return ``jax.Array`` and are jittable.
"""

from __future__ import annotations

from functools import reduce

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PRECISION, complex_dtype

# ---------------------------------------------------------------------------
# Constants (host-side NumPy; cast to jnp at the point of use)
# ---------------------------------------------------------------------------

ZERO, ONE = np.array([1.0, 0.0]), np.array([0.0, 1.0])
PLUS, MINUS = np.array([1.0, 1.0]) / np.sqrt(2), np.array([1.0, -1.0]) / np.sqrt(2)
IPLUS, IMINUS = np.array([1, 1j]) / np.sqrt(2), np.array([1, -1j]) / np.sqrt(2)

IDTY = np.identity(2)
X = np.array([[0.0, 1.0], [1.0, 0.0]])
Y = np.array([[0, -1j], [1j, 0]])
Z = np.array([[1.0, 0.0], [0.0, -1.0]])
PAULIS = [X, Y, Z]

H = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2)

CZ = np.diag([1.0, 1.0, 1.0, -1.0])
CX = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=float)
SWAP = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=float)

P = np.diag([1.0, 1.0j])
T = np.diag([1.0, np.exp(1.0j * np.pi / 4.0)])


class PauliError(ValueError):
    pass


_PAULI_NUMBERS = {
    "i": 0, "I": 0, 0: 0,
    "x": 1, "X": 1, 1: 1, (1, 0, 0): 1,
    "y": 2, "Y": 2, 2: 2, (0, 1, 0): 2,
    "z": 3, "Z": 3, 3: 3, (0, 0, 1): 3,
    "-x": -1, "-X": -1, -1: -1, (-1, 0, 0): -1,
    "-y": -2, "-Y": -2, -2: -2, (0, -1, 0): -2,
    "-z": -3, "-Z": -3, -3: -3, (0, 0, -1): -3,
}


def get_pauli_number(pauli_identifier) -> int:
    key = tuple(pauli_identifier) if isinstance(pauli_identifier, (list, np.ndarray)) else pauli_identifier
    try:
        return _PAULI_NUMBERS[key]
    except (KeyError, TypeError):
        raise PauliError(f'"{pauli_identifier}" could not be interpreted as a Pauli operator')


def get_pauli_identifier(pauli_identifier) -> str:
    return ["-Z", "-Y", "-X", "I", "X", "Y", "Z"][get_pauli_number(pauli_identifier) + 3]


def is_pauli(case) -> bool:
    try:
        get_pauli_number(case)
        return True
    except PauliError:
        return False


def get_pauli_operator(pauli_identifier) -> np.ndarray:
    return PAULIS[get_pauli_number(pauli_identifier) - 1]


def get_pauli_states(pauli_identifier):
    return [[PLUS, MINUS], [IPLUS, IMINUS], [ZERO, ONE]][get_pauli_number(pauli_identifier) - 1]


def get_pauli_state(pauli_identifier, state_index: int) -> np.ndarray:
    return get_pauli_states(pauli_identifier)[state_index]


# ---------------------------------------------------------------------------
# State constructors
# ---------------------------------------------------------------------------

def basis_state(identifier, N: int | None = None) -> np.ndarray:
    """Computational basis state; identifier may be int, bitstring or bit list."""
    if isinstance(identifier, (list, tuple)):
        return basis_state("".join(str(b) for b in identifier))
    if isinstance(identifier, str):
        return basis_state(int(identifier, 2), len(identifier))
    if isinstance(identifier, (int, np.integer)):
        if N is None:
            raise TypeError("N is required when identifier is an int")
        state = np.zeros(2**N)
        state[identifier] = 1.0
        return state
    raise NotImplementedError(
        f"Could not generate basis state from identifier of type {type(identifier)}"
    )


def qubit_from_polar(theta: float, phi: float) -> np.ndarray:
    return np.cos(theta / 2) * ZERO + np.exp(1j * phi) * np.sin(theta / 2) * ONE


def qubit_from_axis(axis) -> np.ndarray:
    theta = np.arccos(axis[-1] / np.sqrt(sum(a**2 for a in axis)))
    phi = np.arctan2(axis[1], axis[0])
    return qubit_from_polar(theta, phi)


def phase_gate(theta: float) -> np.ndarray:
    return np.array([[1, 0], [0, np.exp(1j * theta)]])


def axis_rotation(theta: float, axis) -> np.ndarray:
    return IDTY * np.cos(theta / 2) - 1j * sum(
        axis[i] * PAULIS[i] for i in range(3)
    ) * np.sin(theta / 2)


def euler_rotation(theta1, theta2, theta3) -> np.ndarray:
    return (
        axis_rotation(theta3, [1, 0, 0])
        @ axis_rotation(theta2, [0, 0, 1])
        @ axis_rotation(theta1, [1, 0, 0])
    )


def rand_ket(d: int = 2, key: jax.Array | None = None):
    if key is None:
        return normalise(np.random.rand(d) + 1j * np.random.rand(d))
    kr, ki = jax.random.split(key)
    ket = jax.random.uniform(kr, (d,)) + 1j * jax.random.uniform(ki, (d,))
    return normalise(ket)


# ---------------------------------------------------------------------------
# Structure predicates (host-side)
# ---------------------------------------------------------------------------

def is_power_of_two(n: int) -> bool:
    return (n & (n - 1) == 0) and n != 0


def is_qubit_operator(oper) -> bool:
    return oper.ndim == 2 and oper.shape[0] == oper.shape[1] and is_power_of_two(oper.shape[0])


def is_qubit_state(state) -> bool:
    return state.ndim == 1 and is_power_of_two(state.shape[0])


def num_qubits(arr) -> int:
    n = arr if isinstance(arr, int) else arr.shape[0]
    return int(round(np.log2(n)))


# ---------------------------------------------------------------------------
# jnp functions
# ---------------------------------------------------------------------------

def dagger(array):
    return jnp.conjugate(jnp.swapaxes(array, -1, -2))


def is_hermitian(oper) -> bool:
    return bool(jnp.allclose(dagger(oper), oper))


def ket2dm(ket):
    if ket.ndim != 1:
        raise TypeError("state is not a ket")
    return jnp.outer(ket, jnp.conjugate(ket))


def dm2ket(dm, strict: bool = True):
    """Largest-eigenvector extraction; errors if dm is not (close to) pure."""
    if not is_hermitian(dm):
        raise TypeError("input is not a density matrix")
    eigvals, eigvecs = jnp.linalg.eigh(dm)
    if strict and not jnp.allclose(eigvals[:-1], 0, atol=1e-6):
        raise TypeError("density matrix does not represent a pure state")
    return normalise(eigvecs[:, -1])


def norm(ket):
    return jnp.linalg.norm(ket)


def normalise(state):
    if state.ndim == 1:
        return state / jnp.linalg.norm(state)
    if state.ndim == 2:
        return state / jnp.trace(state)
    raise ValueError("State not ket nor density matrix.")


def compare_kets(a, b) -> bool:
    return bool(jnp.allclose(ket2dm(normalise(a)), ket2dm(normalise(b)), atol=1e-6))


def fidelity(a, b):
    """Fidelity for any ket/density-matrix combination.

    Matches reference ``numpy_quantum.py:148-161`` including the
    ``(tr sqrt(a@b))^2`` convention in the dm/dm case.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim == 1 and b.ndim == 1:
        return jnp.abs(jnp.vdot(a, b)).real ** 2
    if a.ndim == 1:
        return (jnp.conj(a) @ b @ a).real
    if b.ndim == 1:
        return (jnp.conj(b) @ a @ b).real
    eigvals = jnp.linalg.eigvals(a @ b)
    eigvals = jnp.clip(eigvals.real, 0.0, None)
    return jnp.sum(jnp.sqrt(eigvals)) ** 2


def purity(rho):
    return jnp.trace(rho @ rho).real


def expect(oper, state):
    if not is_qubit_operator(oper) or not is_qubit_state(state) or oper.shape[0] != state.shape[0]:
        raise TypeError("incompatible operator and state vector")
    return jnp.conjugate(state) @ oper @ state


def expecth(oper, state):
    return expect(oper, state).real


def tensor(*arrays):
    """Kronecker product of any number of arrays (kets or operators)."""
    arrays = [jnp.asarray(a) for a in arrays]
    return reduce(jnp.kron, arrays, jnp.asarray(1.0))


# ---------------------------------------------------------------------------
# Tensor-product permutation and gate application (the TPU-native core)
# ---------------------------------------------------------------------------

def _permutation_inverse(perm):
    res = [0] * len(perm)
    for i, p in enumerate(perm):
        res[p] = i
    return res


def permute_tensor_product(array, new_ordering):
    """Reorder the qubit tensor factors of a state vector or operator.

    Qubit at old position ``new_ordering[k]`` moves to position ``k`` of the
    output — same convention as the reference (``numpy_quantum.py:227-240``).
    """
    n = array.shape[0]
    if not is_power_of_two(n):
        raise ValueError("Given array is not a qubit state nor operator")
    N = num_qubits(array)
    if set(new_ordering) != set(range(N)):
        raise ValueError("new_ordering must be a permutation of all qubits")
    inv = _permutation_inverse(list(new_ordering))

    if array.ndim == 1:
        res = array.reshape((2,) * N).transpose(inv)
        return res.reshape(-1)
    if array.ndim == 2:
        res = array.reshape((2,) * (2 * N))
        perm = inv + [N + p for p in inv]
        return res.transpose(perm).reshape(n, n)
    raise ValueError("array must be a ket or an operator")


def expand_gate(gate, N: int, targets):
    """Dense ``2^N x 2^N`` expansion — provided for parity/tests only.

    Production paths use :func:`apply_unitary` instead (reference builds this
    dense operator for every gate at ``numpy_quantum.py:243-247``).
    """
    missing = [i for i in range(N) if i not in targets]
    result = tensor(gate, *[jnp.asarray(IDTY)] * len(missing))
    return permute_tensor_product(result, list(targets) + missing)


def add_control(gate):
    gate = jnp.asarray(gate)
    d = gate.shape[0]
    return tensor(jnp.asarray(np.outer(ZERO, ZERO)), jnp.identity(d)) + tensor(
        jnp.asarray(np.outer(ONE, ONE)), gate
    )


def apply_unitary(state, matrix, targets: tuple[int, ...]):
    """Apply a k-qubit operator to qubits `targets` of a state vector.

    ``state``: shape (2**N,) (or any rank-N (2,)*N tensor reshaped therefrom).
    ``matrix``: (2**k, 2**k).
    Contraction runs as reshape → tensordot → transpose, which XLA lowers to a
    single MXU matmul per gate with no O(4^N) operator materialisation.
    """
    N = num_qubits(state)
    k = len(targets)
    psi = state.reshape((2,) * N)
    op = jnp.asarray(matrix, dtype=state.dtype).reshape((2,) * (2 * k))
    # out axes: the k target axes come first, then the untouched axes in order.
    psi = jnp.tensordot(op, psi, axes=(tuple(range(k, 2 * k)), tuple(targets)),
                        precision=PRECISION)
    untouched = [i for i in range(N) if i not in targets]
    current = list(targets) + untouched  # qubit id at each axis of psi now
    perm = [current.index(i) for i in range(N)]
    return psi.transpose(perm).reshape(-1)


def apply_unitary_grouped(state, matrix, targets: tuple[int, ...]):
    """Gate application via axis-GROUPED reshapes (rank <= 5 tensors).

    Equivalent to :func:`apply_unitary` but scalable to large N: the rank-N
    (2,)*N view used there makes XLA's shape analysis explode past ~20 qubits
    (the TPU compile helper OOMs); this variant reshapes the state to
    (outer, 2, mid, 2, inner) style groups instead. Supports k in {1, 2}.
    """
    N = num_qubits(state)
    k = len(targets)
    op = jnp.asarray(matrix, dtype=state.dtype)
    if k == 1:
        q = targets[0]
        outer, inner = 1 << q, 1 << (N - q - 1)
        psi = state.reshape(outer, 2, inner)
        psi = jnp.einsum("bc,acj->abj", op, psi, precision=PRECISION)
        return psi.reshape(-1)
    if k == 2:
        q1, q2 = targets
        swap = q1 > q2
        lo, hi = sorted(targets)
        # op axes ordered (t1, t2); if q1 > q2 the tensor factors must swap.
        u = op.reshape(2, 2, 2, 2)
        if swap:
            u = jnp.permute_dims(u, (1, 0, 3, 2))
        outer = 1 << lo
        mid = 1 << (hi - lo - 1)
        inner = 1 << (N - hi - 1)
        psi = state.reshape(outer, 2, mid, 2, inner)
        # out[o,x,m,y,i] = sum_{c,e} u[x,y,c,e] psi[o,c,m,e,i]
        psi = jnp.einsum("xyce,ocmei->oxmyi", u, psi, precision=PRECISION)
        return psi.reshape(-1)
    raise NotImplementedError("grouped application supports 1- and 2-qubit gates")


def apply_unitary_dm(rho, matrix, targets: tuple[int, ...]):
    """Apply a k-qubit unitary to a density matrix: U rho U^dagger."""
    N = num_qubits(rho)
    n = 2**N
    # Apply to columns: treat rho as a batch of kets along axis 1.
    rho = jax.vmap(lambda col: apply_unitary(col, matrix, targets), in_axes=1, out_axes=1)(rho)
    # Apply conj to rows.
    rho = jax.vmap(lambda row: apply_unitary(row, jnp.conj(matrix), targets), in_axes=0, out_axes=0)(rho)
    return rho.reshape(n, n)


def insert_qubit(state, ket1, index: int):
    """Tensor a fresh qubit in state `ket1` into position `index`.

    Matches the reference ``Insert`` gate semantics (``dv gates.py:145-153``).
    """
    N = num_qubits(state)
    psi = jnp.kron(state, jnp.asarray(ket1, dtype=state.dtype))
    # New qubit currently last (position N); move it to `index`.
    ordering = list(range(index)) + list(range(index + 1, N + 1)) + [index]
    return permute_tensor_product(psi, ordering)


def born_probability(state, index: int, eigvec):
    """Probability of projecting qubit `index` onto single-qubit state eigvec."""
    N = num_qubits(state)
    psi = state.reshape((2,) * N)
    proj = jnp.tensordot(jnp.conj(jnp.asarray(eigvec, dtype=state.dtype)), psi,
                         axes=((0,), (index,)), precision=PRECISION)
    return jnp.sum(jnp.abs(proj) ** 2)


def project_qubit(state, index: int, eigvec):
    """Project qubit `index` onto eigvec (keeping the qubit, unnormalised).

    Returns the projected full state vector: |e><e|_i applied to state.
    """
    N = num_qubits(state)
    psi = state.reshape((2,) * N)
    e = jnp.asarray(eigvec, dtype=state.dtype)
    amp = jnp.tensordot(jnp.conj(e), psi, axes=((0,), (index,)), precision=PRECISION)
    psi = jnp.tensordot(e, amp, axes=0)  # prepend qubit axis back
    current = [index] + [i for i in range(N) if i != index]
    perm = [current.index(i) for i in range(N)]
    return psi.transpose(perm).reshape(-1)
