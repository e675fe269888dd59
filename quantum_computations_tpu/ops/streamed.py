"""Streamed two-mode contraction + transform + randomized SVD.

Every two-mode CV gate acts by contracting neighbour tensors into
A[a, i, j, b] = W(t1 . t2) — W a grid transform from the
:func:`..ops.interp.affine_warp` menu (BS rotation, CX shear, CZ phase,
SWAP transpose) — then SVD-splitting the (a d, d b) matrix. At production
bond dimensions the matrix alone is tens of GB — the reference materialises
it in host RAM (cv gates.py:73-84); HBM cannot.

This module computes the randomized SVD WITHOUT materialising A: the
transform acts independently on row blocks over the `a` bond, so every
matmul of the Halko sketch (A O, A^H Q, Q^H A) streams over row blocks
recomputed on the fly inside a `fori_loop` — recompute-over-memory, the
classic accelerator trade. Peak memory is one row block plus the tall-skinny
factors.

The block transform is gather-free by construction (FFT shears / elementwise
phases / transposes — see interp.py): the earlier bilinear-gather warp was
pathologically slow at production grids on this TPU backend and could fault
the worker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import PRECISION
from .interp import affine_warp
from .linalg import OVERSAMPLE, orthonormalize, svd_compat, truncation_rank_mask

# target row-block footprint (elements of the complex transformed block)
_BLOCK_ELEMENTS = 1 << 25


def _pick_chunk(a: int, d: int, b: int) -> int:
    """Largest divisor `ac` of `a` with ac*d*d*b <= _BLOCK_ELEMENTS."""
    best = 1
    for ac in range(1, a + 1):
        if a % ac == 0 and ac * d * d * b <= _BLOCK_ELEMENTS:
            best = ac
    return best


def streamed_pair_svd(t1: jax.Array, t2: jax.Array, qs: jax.Array,
                      warp_params: tuple, *,
                      max_bond_dim: int, abs_err: float, rel_err: float,
                      key: jax.Array, power_iters: int = 4):
    """SVD-split of affine_warp(t1 . t2, warp_params) viewed as an
    (a d, d b) matrix.

    t1: (a, d, k), t2: (k, d, b); returns (m1 (a, d, cap), m2 (cap, d, b),
    rank) with the same truncation semantics as :func:`..linalg.tensor_svd`
    (zero-masked static cap = max_bond_dim).
    """
    a, d, k = t1.shape
    _, _, b = t2.shape
    rows, cols = a * d, d * b
    cap = min(max_bond_dim, rows, cols)
    l = min(cap + OVERSAMPLE, rows, cols)
    ac = _pick_chunk(a, d, b)
    n_chunks = a // ac
    dtype = t1.dtype

    def block(ci):
        """Transformed row block: (ac*d, d*b)."""
        t1c = jax.lax.dynamic_slice_in_dim(t1, ci * ac, ac, axis=0)
        Tc = jnp.einsum("aik,kjb->aijb", t1c, t2, precision=PRECISION)
        Wc = affine_warp(qs, Tc, warp_params).astype(dtype)
        return Wc.reshape(ac * d, cols)

    def matmul_A(O):
        """A @ O, streamed over row blocks. O: (cols, l) -> (rows, l)."""
        def body(ci, Y):
            return jax.lax.dynamic_update_slice_in_dim(
                Y, block(ci) @ O, ci * ac * d, axis=0)
        return jax.lax.fori_loop(0, n_chunks, body,
                                 jnp.zeros((rows, O.shape[1]), dtype))

    def matmul_AH(Q):
        """A^H @ Q, streamed. Q: (rows, l) -> (cols, l)."""
        def body(ci, Z):
            Qc = jax.lax.dynamic_slice_in_dim(Q, ci * ac * d, ac * d, axis=0)
            return Z + block(ci).T.conj() @ Qc
        return jax.lax.fori_loop(0, n_chunks, body,
                                 jnp.zeros((cols, Q.shape[1]), dtype))

    # Halko sketch with CholeskyQR2 orthonormalization (matmuls only).
    O = jax.random.normal(key, (cols, l), dtype=t1.real.dtype).astype(dtype)
    Q = orthonormalize(matmul_A(O))

    def power_body(_, Q):
        Q1 = orthonormalize(matmul_AH(Q))
        return orthonormalize(matmul_A(Q1))

    Q = jax.lax.fori_loop(0, power_iters, power_body, Q)

    B = matmul_AH(Q).T.conj()  # (l, cols) = Q^H A
    U_b, s, Vh = svd_compat(B, full_matrices=False)
    U_b, s, Vh = U_b[:, :cap], s[:cap], Vh[:cap, :]

    rank, mask = truncation_rank_mask(s, cap, abs_err, rel_err)
    sqrt_s = jnp.sqrt(s) * mask

    U = Q @ U_b  # (rows, cap)
    m1 = (U * sqrt_s[None, :]).reshape(a, d, cap)
    m2 = (sqrt_s[:, None] * Vh).reshape(cap, d, b)
    return m1, m2, rank
