"""Measurement-based GKP gate gadgets.

Parity with reference ``simulators/gkp_simulator/gates.py``: homodyne-angle
tables (:14-49), the ``MeasurementBased`` ABC with ``compile`` /
``compute_syndrome`` (:51-87), Walshe-style single-mode teleportation gadget
(:89-127), macronode two-mode gadget (:130-200) and the concrete gates
MBI/MBF/MBP/MBSWAP/MBCZ/MBT (:203-258).

Syndrome arithmetic is jnp-friendly: results may be traced scalars, so whole
gadget trajectories jit-compile (see :mod:`.compiled`).
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from enum import Enum, auto

import jax.numpy as jnp
import numpy as np

from ..config import SVDOptions
from ..cv.gates import BS, Homodyne
from ..cv.gate_abc import Gate
from .bell import GKPBellState, InsertBell

logger = logging.getLogger(__name__)

PI = np.pi
SQPI = np.sqrt(np.pi)

Syndrome = tuple  # (x, z) bits; ints or traced scalars


class MBType(Enum):
    I = auto()
    F = auto()
    P = auto()

    def angles(self):
        match self:
            case MBType.I:
                return [0.0, PI / 2]
            case MBType.F:
                return [PI / 4, -PI / 4]
            case MBType.P:
                return [0.0, float(np.arctan(2))]


class MB2Type(Enum):
    II = auto()
    FF = auto()
    PP = auto()
    PPdg = auto()
    CZ = auto()
    SWAP = auto()

    def angles(self):
        a2 = float(np.arctan(2))
        match self:
            case MB2Type.II:
                return [0.0, 0.0, PI / 2, PI / 2]
            case MB2Type.FF:
                return [PI / 4, PI / 4, -PI / 4, -PI / 4]
            case MB2Type.PP:
                return [0.0, 0.0, a2, a2]
            case MB2Type.PPdg:
                return [0.0, 0.0, a2, -a2]
            case MB2Type.CZ:
                return [0.0, 0.0, a2, -a2]
            case MB2Type.SWAP:
                return [-PI / 2, 0.0, 0.0, -PI / 2]


class MeasurementBased(ABC):
    """Abstract base class for MB GKP gates."""

    def __init__(self, indices: list[int], type: MBType | MB2Type, epsilon=None, *,
                 dagger: bool = False, svd_options: SVDOptions | None = None, **kwargs):
        self.indices = indices
        self.epsilon = epsilon
        self.type = type
        self.dagger = dagger
        fields = {k: kwargs.pop(k) for k in ("max_bond_dim", "abs_err", "rel_err") if k in kwargs}
        self.svd_options = svd_options if svd_options is not None else (
            SVDOptions(**fields) if fields else None
        )
        if kwargs:
            logger.warning(
                f"{type(self).__name__} received unexpected keyword arguments: {kwargs.keys()}"
            )

    def __repr__(self):
        return f"{type(self).__name__}_{','.join(map(str, self.indices))}"

    def angles(self) -> np.ndarray:
        return np.array(self.type.angles()) * (-1) ** self.dagger

    def _gate_kwargs(self) -> dict:
        return {"svd_options": self.svd_options} if self.svd_options else {}

    @abstractmethod
    def compile(self) -> list[Gate]:
        """Compile into a sequence of executable CV gates."""

    @abstractmethod
    def compute_syndrome(self, results: list) -> tuple[list[Syndrome], list[int]]:
        """(syndromes, mode indices) from homodyne results, ordered as produced
        by the measurements in :meth:`compile`."""


def _byproduct_syndrome(ta, tb, ma, mb):
    """Logical syndrome from the teleportation byproduct displacement.

    mu = i (ma e^{i tb} + mb e^{i ta}) / sin(ta - tb), quadrature vector
    scaled by sqrt(2); syndrome = round(mu / sqrt(pi)) mod 2
    (reference gates.py:114-127). jnp arithmetic so results may be traced.
    """
    mu = 1j * (ma * jnp.exp(1j * tb) + mb * jnp.exp(1j * ta)) / jnp.sin(ta - tb)
    mu_vec = jnp.array([mu.real, mu.imag]) * 2**0.5
    syndrome = jnp.round(mu_vec / SQPI).astype(jnp.int32) % 2
    return (syndrome[0], syndrome[1])


class MBSingleMode(MeasurementBased):
    """Error-corrected single-mode Gaussian gadget (Walshe et al.,
    PhysRevA.102.062411): Bell insertion + BS + two homodynes."""

    def __init__(self, index: int, type: MBType, epsilon=None, *,
                 results=None, **kwargs):
        super().__init__([index], type, epsilon, **kwargs)
        self.results = results if results is not None else (None, None)
        if len(self.results) != 2:
            raise ValueError("Results list must have exactly 2 elements.")

    def bell_state(self) -> GKPBellState:
        return GKPBellState.PLUS

    def compile(self):
        idx = self.indices[0]
        angles = self.angles()
        kw = self._gate_kwargs()
        return [
            InsertBell(idx + 1, self.bell_state(), gkp_epsilon=self.epsilon, **kw),
            BS(idx, idx + 1, **kw),
            Homodyne(idx, angles[0], result=self.results[0]),
            Homodyne(idx, angles[1], result=self.results[1]),
        ]

    def compute_syndrome(self, results: list) -> tuple[list[Syndrome], list[int]]:
        """Syndrome (n, m), to be fixed by X(n sqrt(pi)) Z(m sqrt(pi))."""
        if len(results) != 2:
            raise ValueError("Exactly two measurement results are needed.")
        ta, tb = self.angles()
        ma, mb = results
        return [_byproduct_syndrome(ta, tb, ma, mb)], self.indices


class MBTwoMode(MeasurementBased):
    """Error-corrected two-mode Gaussian gadget (Walshe et al.,
    arXiv:2109.04668 macronode cluster): 2 Bell pairs + 3 BS + 4 homodynes.

    Ordering of angles/results is [a, c, b, d] as in the paper; `a` is the
    measurement on the left-most input index.
    """

    def __init__(self, index1: int, index2: int, type: MB2Type, epsilon=None, *,
                 results=None, **kwargs):
        if abs(index1 - index2) != 1:
            raise ValueError(
                f"{type!r} two-mode gadgets apply to neighbours, got {(index1, index2)}."
            )
        results = results if results is not None else (None, None, None, None)
        if len(results) != 4:
            raise ValueError("Results list must have exactly 4 elements.")
        super().__init__(sorted([index1, index2]), type, epsilon, **kwargs)
        self.results = results

    def compile(self):
        idx = min(self.indices)
        ta, tc, tb, td = self.angles()
        ma, mc, mb, md = self.results
        kw = self._gate_kwargs()
        return [
            InsertBell(idx, gkp_epsilon=self.epsilon, **kw),
            InsertBell(idx + 4, gkp_epsilon=self.epsilon, **kw),
            BS(idx + 2, idx + 1, **kw),
            BS(idx + 3, idx + 4, **kw),
            BS(idx + 2, idx + 3, **kw),
            Homodyne(idx + 2, ta, result=ma),
            Homodyne(idx + 2, tc, result=mc),
            BS(idx + 1, idx + 2, **kw),
            Homodyne(idx + 1, tb, result=mb),
            Homodyne(idx + 1, td, result=md),
        ]

    def compute_syndrome(self, results: list) -> tuple[list[Syndrome], list[int]]:
        if len(results) != 4:
            raise ValueError("Exactly four measurement results are needed.")
        ta, tc, tb, td = self.angles()
        ma, mc, mb, md = results
        mu_ab = 1j * (ma * jnp.exp(1j * tb) + mb * jnp.exp(1j * ta)) / jnp.sin(ta - tb)
        mu_cd = 1j * (mc * jnp.exp(1j * td) + md * jnp.exp(1j * tc)) / jnp.sin(tc - td)
        # constant 1/sqrt(2) cancels against the sqrt(2) quadrature scaling
        mu1 = mu_cd + mu_ab
        mu2 = mu_cd - mu_ab
        out = []
        for mu in (mu1, mu2):
            vec = jnp.array([mu.real, mu.imag])
            s = jnp.round(vec / SQPI).astype(jnp.int32) % 2
            out.append((s[0], s[1]))
        return out, self.indices


class MBI(MBSingleMode):
    """Error correction using the Knill method."""

    def __init__(self, index, epsilon=None, *, results=None, **kwargs):
        super().__init__(index, MBType.I, epsilon=epsilon, results=results, **kwargs)


GKPEC = MBI  # alias, reference gates.py:211


class MBF(MBSingleMode):
    """Error-corrected Fourier gate."""

    def __init__(self, index, epsilon=None, *, results=None, **kwargs):
        super().__init__(index, MBType.F, epsilon=epsilon, results=results, **kwargs)


class MBP(MBSingleMode):
    """Error-corrected P gate."""

    def __init__(self, index, epsilon=None, *, results=None, **kwargs):
        super().__init__(index, MBType.P, epsilon=epsilon, results=results, **kwargs)


class MBSWAP(MBTwoMode):
    """Error-corrected SWAP gate."""

    def __init__(self, index1, index2, epsilon=None, *, results=None, **kwargs):
        super().__init__(index1, index2, MB2Type.SWAP, epsilon=epsilon, results=results, **kwargs)


class MBCZ(MBTwoMode):
    """Error-corrected controlled-Z gate."""

    def __init__(self, index1, index2, epsilon=None, *, results=None, **kwargs):
        super().__init__(index1, index2, MB2Type.CZ, epsilon=epsilon, results=results, **kwargs)


class MBT(MBSingleMode):
    """Non-Clifford T gate via a magic GKP Bell state."""

    def __init__(self, index, epsilon=None, *, results=None, **kwargs):
        super().__init__(index, MBType.I, epsilon=epsilon, results=results, **kwargs)

    def bell_state(self) -> GKPBellState:
        return GKPBellState.T if not self.dagger else GKPBellState.Tdg

    def compile(self):
        idx = self.indices[0]
        angles = MBType.I.angles()  # T uses the identity-gadget angles
        kw = self._gate_kwargs()
        return [
            InsertBell(idx + 1, self.bell_state(), gkp_epsilon=self.epsilon, **kw),
            BS(idx, idx + 1, **kw),
            Homodyne(idx, angles[0], result=self.results[0]),
            Homodyne(idx, angles[1], result=self.results[1]),
        ]
