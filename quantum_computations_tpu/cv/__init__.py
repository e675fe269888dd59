"""Continuous-variable functional-MPS simulator on a discretized position grid.

Capability parity with reference ``simulators/cv_simulator``: the state is an
MPS whose modes are wavefunctions sampled on an equidistant grid ``qs``; gates
act by contraction + truncated SVD. TPU-native redesign: every bond dimension
is padded to a static capacity with truncation expressed as zero-masking, so
gate applications (and entire circuits) jit-compile once.
"""

from .mps import MPS, tensor_svd
from .states import State, eval_gkp_state
from .simulator import Simulator
from . import gates

__all__ = ["MPS", "tensor_svd", "State", "eval_gkp_state", "Simulator", "gates"]
