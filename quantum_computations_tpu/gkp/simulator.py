"""Measurement-based GKP circuit engine.

Parity with reference ``simulators/gkp_simulator/simulator.py``: Pauli-frame
commutation rules (:26-55), per-gate transpile→compile→nested-CV-run (:89-94),
layered execution with a two-layer syndrome window feeding the
classically-controlled T correction (:101-153) and ``SimulatorAlt`` (:156-165).

This is the *eager* engine (concrete measurement outcomes, host-side classical
control) — semantically closest to the reference. The fully-jitted batched
trajectory engine lives in :mod:`.compiled`.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from timeit import default_timer as timer

import jax
import numpy as np

from ..config import SVDOptions
from ..utils import as_key
from ..cv.gate_abc import MeasurementResult
from ..cv.gates import F as FourierGate
from ..cv.mps import MPS
from ..cv.simulator import Simulator as CVSimulator, format_time
from ..dv import gates as dv_gates
from ..dv.gates import Gate as DVGate
from .transpiler import ClassicalControl, MBGKPCircuit, gate_transpile
from .gates import MeasurementBased, Syndrome
from .utils import format_result

logger = logging.getLogger(__name__)


def measurement_formatter(result: MeasurementResult) -> str:
    return format_result(result.result)


def commute(gate: DVGate, paulis: list[Syndrome]) -> tuple[list[Syndrome], DVGate]:
    """Commute `gate` through `paulis` such that gate * paulis = paulis' * gate'."""
    paulis = [list(p) for p in paulis]
    t = type(gate)
    if t is dv_gates.I:
        pass
    elif t is dv_gates.T:
        idx = gate.indices[0]
        if paulis[idx][0] == 1:
            gate = dv_gates.Tdg(*gate.indices)
    elif t is dv_gates.Tdg:
        idx = gate.indices[0]
        if paulis[idx][0] == 1:
            gate = dv_gates.T(*gate.indices)
    elif t is dv_gates.H:
        idx = gate.indices[0]
        paulis[idx][0], paulis[idx][1] = paulis[idx][1], paulis[idx][0]
    elif t in (dv_gates.P, dv_gates.Pdg):
        idx = gate.indices[0]
        paulis[idx][1] ^= paulis[idx][0]
    elif t is dv_gates.CZ:
        idx1, idx2 = gate.indices
        paulis[idx1][1] ^= paulis[idx2][0]
        paulis[idx2][1] ^= paulis[idx1][0]
    elif t is dv_gates.SWAP:
        idx1, idx2 = gate.indices
        paulis[idx1], paulis[idx2] = paulis[idx2], paulis[idx1]
    else:
        raise NotImplementedError(f"Commutator logic for gate: {gate} not implemented.")
    return [tuple(p) for p in paulis], gate


class Simulator(CVSimulator):
    """Runs an :class:`MBGKPCircuit` by expanding each DV gate into its MB
    gadget and executing the compiled CV gates with a nested CV engine."""

    def __init__(
        self,
        circuit: MBGKPCircuit,
        ancilla_epsilon: float,
        *,
        rng_seed=None,
        svd_options: SVDOptions | dict | None = None,
        debug_info: Callable | None = None,
    ):
        self._circuit = circuit
        self._N = circuit._N
        self._key = as_key(rng_seed)
        self._epsilon = ancilla_epsilon
        self._state: MPS | None = None
        self.pauli_syndrome: list[Syndrome] | None = None
        if isinstance(svd_options, dict):
            svd_options = SVDOptions(**svd_options)
        self._svd_options = svd_options or SVDOptions()
        self.debug_info = debug_info or (lambda _: None)

    def apply_gate(self, dv_gate: DVGate) -> tuple[list[Syndrome], list[int]]:
        gate: MeasurementBased = gate_transpile(dv_gate, epsilon=self._epsilon)
        self._key, sub = jax.random.split(self._key)
        sim = CVSimulator(
            gate.compile(), rng_seed=sub,
            measurement_formatter=measurement_formatter,
            svd_options=self._svd_options,
        )
        self._state = sim.run(self._state)
        results = [r.result for r in sim.results]
        return gate.compute_syndrome(results)

    def apply_paulis(self, paulis: list[Syndrome]):
        for i in range(len(self.pauli_syndrome)):
            s1, s2 = self.pauli_syndrome[i], paulis[i]
            self.pauli_syndrome[i] = (s1[0] ^ s2[0], s1[1] ^ s2[1])

    def run(self, initial_state: MPS) -> tuple[MPS, list[Syndrome]]:
        initial_state.validate()
        self._state = initial_state
        self.pauli_syndrome = [(0, 0) for _ in range(self._N)]
        gate_syndromes: list[list[Syndrome]] = [[(0, 0)] * self._N] * 2

        circ_start = timer()
        num_layers = len(self._circuit._layers)
        logger.info(
            f"Total number of MB gates: {self._circuit.count()} in a total of {num_layers} layers."
        )
        for li, layer in enumerate(self._circuit._layers):
            logger.info(f"Layer {li+1} of {num_layers}.")
            gate_syndromes.pop(0)
            gate_syndromes.append([(0, 0)] * self._N)
            for gate in layer.gates:
                if isinstance(gate, ClassicalControl):
                    # T-teleportation correction keyed on the X syndrome of the
                    # gadget two layers back (reference simulator.py:121-126).
                    if int(gate_syndromes[-2][gate.indices[0]][0]):
                        gate = gate.gate
                    else:
                        gate = dv_gates.I(*gate.indices)

                self.pauli_syndrome, gate = commute(gate, self.pauli_syndrome)

                logger.info(f"MB gate: {gate}")
                syndromes, indices = self.apply_gate(gate)
                syndromes = [(int(x), int(z)) for x, z in syndromes]
                logger.info(f"Gate syndrome: {syndromes}")
                for i, s in zip(indices, syndromes, strict=True):
                    gate_syndromes[-1][i] = s

            logger.info(f"Applying syndrome correction: {gate_syndromes[-1]}")
            self.apply_paulis(gate_syndromes[-1])
            logger.info(f"Applying Pauli operators: {layer.paulis}")
            self.apply_paulis(layer.paulis)
            logger.info(f"Final Pauli syndrome: {self.pauli_syndrome}")
            if logger.isEnabledFor(logging.DEBUG):
                self.debug_info(self)

        logger.info("Finished MB GKP simulation!")
        logger.info("Total time: " + format_time(timer() - circ_start))
        return self._state, [tuple(s) for s in self.pauli_syndrome]


class SimulatorAlt(Simulator):
    """Variant applying H as an exact Fourier with no error correction."""

    def apply_gate(self, dv_gate) -> tuple[list[Syndrome], list[int]]:
        t = type(dv_gate)
        if t is dv_gates.I:
            return [(0, 0)], dv_gate.indices
        if t is dv_gates.H:
            FourierGate(dv_gate.indices[0]).apply(self._state)
            return [(0, 0)], dv_gate.indices
        return super().apply_gate(dv_gate)
