"""Qubit state-vector engine (TPU-native).

Capability parity with the reference ``simulators/dv_simulator`` package
(``numpy_quantum.py``, ``gates.py``, ``states.py``, ``simulator.py``) but with
an idiomatic JAX design: states are rank-N tensors of shape ``(2,)*N``, k-qubit
unitaries are applied by tensordot + transpose (never by building the dense
``2^N x 2^N`` operator), and whole circuits trace into single jitted programs.
"""

from . import qop
from .states import State
from .gates import (
    Gate, I, X, Y, Z, H, RZ, P, Pdg, T, Tdg, CX, CZ, SWAP, Insert, M, MZ, MX,
)
from .simulator import Simulator, ClassicalControl, parse_state
from .fast_sv import FastStatevector

__all__ = [
    "qop", "State", "Gate", "I", "X", "Y", "Z", "H", "RZ", "P", "Pdg", "T",
    "Tdg", "CX", "CZ", "SWAP", "Insert", "M", "MZ", "MX", "Simulator",
    "ClassicalControl", "parse_state", "FastStatevector",
]
