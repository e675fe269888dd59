"""CV circuit snippets.

Parity with reference ``impact_.../cv_circuits.py``: qunaught / quadrature /
Steane error-correction gate lists and Bell-preparation circuits (:5-45).
"""

from __future__ import annotations

from ..cv.gates import BS, CZ, F, Insert, Mp, Mq
from ..cv.states import State
from ..gkp.gates import MBCZ


def qunaught_error_correction(eps: float):
    return [
        Insert(1, State.QUNAUGHT, gkp_epsilon=eps),
        Insert(2, State.QUNAUGHT, gkp_epsilon=eps),
        BS(2, 1),
        BS(1, 0),
        Mq(0),
        Mp(0),
        # Syndrome correction tracked virtually by the caller
    ]


def quadrature_correction(eps: float):
    return [
        Insert(1, State.GKP_ZERO, gkp_epsilon=eps),
        CZ(0, 1),
        Mp(1),
    ]


def steane_error_correction(eps: float):
    return [
        *quadrature_correction(eps),
        F(0, dagger=True),
        *quadrature_correction(eps),
        F(0),
    ]


def bell_standard(eps: float):
    return [
        Insert(0, State.GKP_T, gkp_epsilon=eps),
        Insert(1, State.GKP_PLUS, gkp_epsilon=eps),
        *MBCZ(0, 1, epsilon=eps).compile(),
        F(1),
    ]


def bell_qunaught(eps: float):
    return [
        Insert(0, State.QUNAUGHT, gkp_epsilon=eps),
        Insert(1, State.QUNAUGHT, gkp_epsilon=eps),
        BS(0, 1),
    ]
