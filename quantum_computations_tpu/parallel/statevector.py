"""Mesh-sharded DV state vector (the ≥30-qubit engine).

The reference DV simulator builds dense 2^N x 2^N operators per gate
(``numpy_quantum.py:243-247``) and cannot scale past ~14 qubits. Here the
state is a rank-N tensor of shape (2,)*N whose first k axes are sharded over a
(2,)*k device mesh (one binary mesh axis per sharded qubit). Gates are applied
with the same reshape→tensordot→transpose contraction as the single-chip
engine; the XLA SPMD partitioner inserts the ICI collectives (all-to-alls /
collective-permutes) required when a gate touches a sharded axis.

Design notes:
- Gates on LOCAL qubit axes (index >= k) compile to pure local contractions.
- Gates on SHARDED axes are still written identically; GSPMD reshards. For
  deep circuits prefer placing hot qubits on local axes (or pre-permute).
- The state is created shard-wise inside jit (never materialised on host).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PRECISION, complex_dtype
from ..dv import qop


def state_spec(mesh: Mesh, N: int) -> NamedSharding:
    """PartitionSpec sharding the first k qubit axes over the mesh axes."""
    k = len(mesh.axis_names)
    if k > N:
        raise ValueError(f"Mesh has {k} axes but state only {N} qubits.")
    return NamedSharding(mesh, P(*mesh.axis_names, *([None] * (N - k))))


def _apply(state: jax.Array, matrix: jax.Array, targets: tuple[int, ...]) -> jax.Array:
    """k-qubit unitary contraction on a rank-N state tensor.

    For 1- and 2-qubit gates on large states the axis-grouped path is used
    (rank <= 5 intermediates — the rank-N tensordot path makes XLA's shape
    analysis explode past ~20 qubits).
    """
    N = state.ndim
    kk = len(targets)
    if kk <= 2 and N > 14:
        flat = qop.apply_unitary_grouped(state.reshape(-1), matrix, targets)
        return flat.reshape(state.shape)
    op = matrix.reshape((2,) * (2 * kk)).astype(state.dtype)
    psi = jnp.tensordot(op, state, axes=(tuple(range(kk, 2 * kk)), targets),
                        precision=PRECISION)
    untouched = [i for i in range(N) if i not in targets]
    current = list(targets) + untouched
    perm = [current.index(i) for i in range(N)]
    return psi.transpose(perm)


@partial(jax.jit, static_argnums=(2, 3), donate_argnums=(0,))
def apply_gate_sharded(state: jax.Array, matrix: jax.Array, targets: tuple[int, ...],
                       sharding: NamedSharding | None = None) -> jax.Array:
    """Jitted gate application preserving the given sharding."""
    out = _apply(state, matrix, targets)
    if sharding is not None:
        out = jax.lax.with_sharding_constraint(out, sharding)
    return out


class ShardedStateVector:
    """N-qubit state vector distributed over a qubit mesh.

    >>> mesh = qubit_mesh(3)          # 8 devices
    >>> sv = ShardedStateVector(30, mesh)
    >>> sv.apply(qop.H, (29,))        # local axis: no communication
    >>> sv.apply(qop.CZ, (0, 29))     # sharded axis: XLA inserts collectives
    """

    def __init__(self, N: int, mesh: Mesh, state: jax.Array | None = None):
        self.N = N
        self.mesh = mesh
        self.sharding = state_spec(mesh, N)
        if state is None:
            @partial(jax.jit, out_shardings=self.sharding)
            def init():
                flat = jnp.zeros((2**N,), dtype=complex_dtype()).at[0].set(1.0)
                return flat.reshape((2,) * N)
            state = init()
        self.state = state

    # -- gates --------------------------------------------------------------
    def apply(self, matrix, targets: tuple[int, ...]) -> "ShardedStateVector":
        matrix = jnp.asarray(matrix, dtype=complex_dtype())
        self.state = apply_gate_sharded(self.state, matrix, tuple(targets), self.sharding)
        return self

    def run_circuit(self, circuit: list[tuple[np.ndarray, tuple[int, ...]]]):
        """Jit the whole gate sequence into one XLA program (one compile)."""
        gates = [(jnp.asarray(m, dtype=complex_dtype()), tuple(t)) for m, t in circuit]

        @partial(jax.jit, donate_argnums=(0,))
        def fn(state):
            for m, t in gates:
                state = _apply(state, m, t)
            return jax.lax.with_sharding_constraint(state, self.sharding)

        self.state = fn(self.state)
        return self

    # -- observables --------------------------------------------------------
    def probabilities(self, qubit: int) -> jax.Array:
        """Marginal (p0, p1) of one qubit."""
        axes = tuple(i for i in range(self.N) if i != qubit)
        p = jnp.sum(jnp.abs(self.state) ** 2, axis=axes)
        return p

    def norm(self) -> jax.Array:
        return jnp.sqrt(jnp.sum(jnp.abs(self.state) ** 2))

    def expectation_z(self, qubit: int) -> jax.Array:
        p = self.probabilities(qubit)
        return p[0] - p[1]

    def amplitude(self, bits) -> jax.Array:
        return self.state[tuple(bits)]

    def measure(self, qubit: int, key: jax.Array):
        """Sample a Z measurement and collapse (jit-compatible)."""
        p = self.probabilities(qubit)
        s = jax.random.bernoulli(key, p[1] / (p[0] + p[1])).astype(jnp.int32)
        e = jnp.stack([1 - s, s]).astype(self.state.dtype)  # |0> or |1>
        psi = jnp.tensordot(e, jnp.moveaxis(self.state, qubit, 0), axes=1,
                            precision=PRECISION)
        psi = jnp.tensordot(e, psi, axes=0)
        psi = jnp.moveaxis(psi, 0, qubit) / jnp.sqrt(jnp.where(s == 0, p[0], p[1]))
        self.state = jax.lax.with_sharding_constraint(psi, self.sharding)
        return s
