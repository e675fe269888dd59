"""GKP Bell states inserted directly as bond-2 MPS segments.

Parity with reference ``simulators/gkp_simulator/insert_bell.py``: the
qunaught Bell state BS|ø>|ø> is prepared analytically as a two-tensor MPS with
internal bond 2 (coeff |0>|0> + coeff |1>|1>, :44-51), avoiding a beamsplitter.
``InsertBell`` splices it into the chain EXACTLY and SVD-free (the reference
uses two truncated SVDs, :61-97): a product segment passes the chain bond
through on an identity-kron — see :func:`splice_product_segment`.
"""

from __future__ import annotations

import logging
from enum import Enum

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SVDOptions, complex_dtype
from ..cv.gates import Insert
from ..cv.mps import MPS
from ..cv.states import State

logger = logging.getLogger(__name__)

PI = np.pi
SQPI = np.sqrt(np.pi)


class GKPBellState(Enum):
    PLUS = 1
    T = 2
    Tdg = 3

    def __repr__(self):
        return "GKP_BELL_" + self.name

    def __str__(self):
        return self.__repr__()

    def coefficients(self):
        match self:
            case GKPBellState.PLUS:
                return (1.0, 1.0)
            case GKPBellState.T:
                return (1.0, np.exp(1j * PI / 8))
            case GKPBellState.Tdg:
                return (1.0, np.exp(-1j * PI / 8))

    def eval(self, qs, gkp_epsilon=None) -> MPS:
        if isinstance(qs, np.ndarray):
            if qs.ndim != 1:
                raise TypeError("qs must be a 1D array.")
            if not np.allclose(np.diff(qs, 2), 0, atol=np.finfo(qs.dtype).eps**0.5):
                raise ValueError("qs is not an arithmetic progression.")
        if gkp_epsilon is not None and not isinstance(gkp_epsilon, jax.Array) and gkp_epsilon <= 0:
            raise ValueError("epsilon must be a positive real number")

        c0, c1 = self.coefficients()
        zero = State.GKP_ZERO.eval(jnp.asarray(qs), gkp_epsilon)
        one = State.GKP_ONE.eval(jnp.asarray(qs), gkp_epsilon)
        bell = jnp.stack(
            [2 ** (-1 / 4) * c0 * zero, 2 ** (-1 / 4) * c1 * one], axis=-1
        ).astype(complex_dtype())  # (d, 2)
        bell_tensor = bell[None, :, :]  # (1, d, 2)
        return MPS(qs, [bell_tensor, jnp.permute_dims(bell_tensor, (2, 1, 0))])


def splice_product_segment(t1, b1, b2):
    """Exact SVD-free insertion tensors for a product two-tensor segment.

    A Bell pair is a PRODUCT state w.r.t. the rest of the chain, so inserting
    it between two tensors needs no re-factorisation at all: the existing
    chain bond r passes through the new tensors on an identity, the segment's
    internal bond 2 rides alongside (identity-kron), giving bonds r | 2r | r:

        b1'[beta, x, (beta', c)] = delta(beta, beta') b1[x, c]
        b2'[(beta, c), y, beta'] = delta(beta, beta') b2[c, y]

    This replaces the reference's two truncated SVDs (insert_bell.py:61-97)
    — exact, cheaper, and free of large degenerate Gram eigendecompositions
    (whose f32 device eigh is untrustworthy on the TPU backend). The 2r bond
    is truncated back by the next two-mode gate's SVD split.
    """
    r = t1.shape[-1]
    d = b1.shape[0]
    eye = jnp.eye(r, dtype=t1.dtype)
    b1_t = (eye[:, None, :, None] * b1[None, :, None, :]).reshape(r, d, 2 * r)
    b2_t = (eye[:, None, None, :] * b2[None, :, :, None]).reshape(2 * r, d, r)
    return b1_t, b2_t


class InsertBell(Insert):
    """Insert a two-mode GKP Bell state at `index`."""

    def __init__(self, index, state: GKPBellState = GKPBellState.PLUS, *, gkp_epsilon=None, **kwargs):
        if not isinstance(state, GKPBellState):
            raise TypeError(f"Expected GKPBellState obj but found {type(state)}")
        super().__init__(index, state, gkp_epsilon=gkp_epsilon, **kwargs)

    def apply(self, mps: MPS, *, key=None, svd_options: SVDOptions | None = None, **_):
        idx = self.index
        bell = self.arg.eval(mps.domain, self.gkp_epsilon)

        if idx < 0 or idx > len(mps):
            raise IndexError(f"Cannot insert mode at index {idx} for MPS of length {len(mps)}")
        if idx == 0:
            mps.tensors = bell.tensors + mps.tensors
            return
        if idx == len(mps):
            mps.tensors = mps.tensors + bell.tensors
            return

        # Chain ... t1 | (b1 - b2) | t2 ... : the Bell pair is a product
        # segment, so the splice is exact and SVD-free (identity-kron; the
        # transient 2r bond is re-truncated by the next two-mode gate).
        t1 = mps[idx - 1]
        b1, b2 = bell[0][0, :, :], bell[1][:, :, 0]  # (d, 2), (2, d)
        b1_t, b2_t = splice_product_segment(t1, b1, b2)
        mps.tensors.insert(idx, b1_t)
        mps.tensors.insert(idx + 1, b2_t)
