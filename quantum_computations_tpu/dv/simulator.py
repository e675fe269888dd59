"""DV circuit engine.

Parity with reference ``simulators/dv_simulator/simulator.py`` (sequential gate
loop, ``ClassicalControl`` gating on prior measurement outcomes, ``results``
accumulation), redesigned so an entire circuit — measurements and classical
feed-forward included — traces into ONE jittable function of
``(initial_state, key)``.  Classical control is resolved with `jnp.where` on
the gate matrix, keeping control flow static for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import qop
from .gates import Gate, Insert, M
from .states import State
from ..config import complex_dtype


class ClassicalControl:
    """Apply `gate` iff all positive-index results are 1 and negative are 0.

    Indices address the ``results`` list accumulated so far (negative Python
    indexing allowed, as in the reference ``dv simulator.py:6-17``).
    """

    def __init__(self, gate: Gate, positive_indices: list[int] = [], negative_indices: list[int] = []):
        self.gate = gate
        self.indices = gate.indices
        self._pos = positive_indices
        self._neg = negative_indices

    def __repr__(self):
        return f"Classical control: {self.gate}"

    def eval(self, observables: list) -> jax.Array:
        cond = jnp.asarray(True)
        for i in self._pos:
            cond = jnp.logical_and(cond, jnp.asarray(observables[i]) != 0)
        for i in self._neg:
            cond = jnp.logical_and(cond, jnp.asarray(observables[i]) == 0)
        return cond


def parse_state(state) -> jax.Array:
    if state is None:
        return jnp.ones((1,), dtype=complex_dtype())
    if isinstance(state, (np.ndarray, jax.Array)):
        return jnp.asarray(state, dtype=complex_dtype())
    if isinstance(state, list) and all(isinstance(item, State) for item in state):
        return jnp.asarray(qop.tensor(*(s.get() for s in state)), dtype=complex_dtype())
    raise TypeError("Unsupported input type")


class Simulator:
    """Sequential circuit simulator.

    ``run`` executes the circuit (optionally under jit via :meth:`as_fn`);
    measurement outcomes are stored in ``self.results`` as 0/1 ints.
    """

    def __init__(self, circuit: list[Gate], rng_seed: int | None = None):
        self.circuit = circuit
        self.results: list | None = None
        self._seed = rng_seed if rng_seed is not None else np.random.SeedSequence().entropy % (2**31)

    def _execute(self, state: jax.Array, key: jax.Array):
        results = []
        n_qubits = int(np.log2(state.shape[-1]))
        for gate in self.circuit:
            inner = gate.gate if isinstance(gate, ClassicalControl) else gate
            if isinstance(inner, Insert):
                if inner.indices[0] > n_qubits:
                    raise ValueError(
                        f"{inner} inserts past the end of the "
                        f"{n_qubits}-qubit register")
                n_qubits += 1
            else:
                bad = [i for i in inner.indices
                       if i < 0 or i >= n_qubits]
                if bad:
                    raise ValueError(
                        f"{inner} addresses qubit(s) {bad} outside the "
                        f"{n_qubits}-qubit register")
        for gate in self.circuit:
            if isinstance(gate, ClassicalControl):
                cond = gate.eval(results)
                inner = gate.gate
                if inner.matrix is None:
                    raise ValueError("ClassicalControl over non-unitary gates is not supported.")
                n = inner.matrix.shape[0]
                eye = np.identity(n)
                matrix = jnp.where(cond, jnp.asarray(inner.matrix, dtype=state.dtype),
                                   jnp.asarray(eye, dtype=state.dtype))
                state = qop.apply_unitary(state, matrix, tuple(inner.indices))
                continue
            if isinstance(gate, M):
                key, sub = jax.random.split(key)
                state, s = gate.apply(state, key=sub)
                results.append(s)
            else:
                state = gate.apply(state)
        return state, results

    def as_fn(self):
        """Pure function ``(initial_state, key) -> (final_state, results)``.

        Jittable and vmappable over batches of keys for Monte-Carlo sampling.
        """
        def fn(initial_state, key):
            state, results = self._execute(initial_state, key)
            results = jnp.asarray(results) if results else jnp.zeros((0,), jnp.int32)
            return state, results
        return fn

    def run(self, initial_state=None, *, jit: bool = False) -> jax.Array:
        state = parse_state(initial_state)
        key = jax.random.PRNGKey(self._seed)
        fn = self.as_fn()
        if jit:
            fn = jax.jit(fn)
        state, results = fn(state, key)
        self.results = [int(r) for r in np.asarray(results)]
        return state
