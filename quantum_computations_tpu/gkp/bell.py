"""GKP Bell states inserted directly as bond-2 MPS segments.

Parity with reference ``simulators/gkp_simulator/insert_bell.py``: the
qunaught Bell state BS|ø>|ø> is prepared analytically as a two-tensor MPS with
internal bond 2 (coeff |0>|0> + coeff |1>|1>, :44-51), avoiding a beamsplitter;
``InsertBell`` splices it into the chain with two truncated SVDs (:61-97).
"""

from __future__ import annotations

import logging
from enum import Enum

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SVDOptions, complex_dtype
from ..cv.gates import Insert
from ..cv.mps import MPS, tensor_svd
from ..ops.linalg import trim_split
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

        opts = self.effective_svd_options(svd_options)
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)

        # Chain ... t1 | (b1 - b2) | t2 ... : tensor b1 into t1's right edge,
        # b2 into t2's left edge, restoring MPS form with truncated SVDs.
        t1, t2 = mps[idx - 1], mps[idx]
        b1, b2 = bell[0][0, :, :], bell[1][:, :, 0]  # (d, 2), (2, d)

        tb = jnp.einsum("aib,kd->aikbd", t1, b1)
        tb = tb.reshape(tb.shape[:-2] + (-1,))
        t1, b1_t, rank = tensor_svd(
            tb, (0, 1), (2, 3), max_bond_dim=opts.max_bond_dim,
            abs_err=opts.abs_err, rel_err=opts.rel_err, key=k1,
            svd_method=opts.svd_method,
        )
        t1, b1_t = trim_split(t1, b1_t, rank)

        tb = jnp.einsum("dl,bjc->bdljc", b2, t2)
        tb = tb.reshape((-1,) + tb.shape[2:])
        b2_t, t2, rank = tensor_svd(
            tb, (0, 1), (2, 3), max_bond_dim=opts.max_bond_dim,
            abs_err=opts.abs_err, rel_err=opts.rel_err, key=k2,
            svd_method=opts.svd_method,
        )
        b2_t, t2 = trim_split(b2_t, t2, rank)

        mps[idx - 1] = t1
        mps.tensors.insert(idx, b1_t)
        mps.tensors.insert(idx + 1, b2_t)
        mps[idx + 2] = t2
