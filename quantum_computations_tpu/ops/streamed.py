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


def _divisors_desc(n: int):
    return [x for x in range(n, 0, -1) if n % x == 0]


def _pick_chunks(a: int, d: int, b: int) -> tuple[int, int]:
    """(ac, bc): divisors of a and b with ac*d*d*bc <= _BLOCK_ELEMENTS.

    The grid axes can never be chunked (the FFT shears need them whole), but
    both bond axes can: the a-bond splits the matrix rows, the b-bond splits
    (strided) columns. Prefer keeping b whole, then shrink it."""
    for bc in _divisors_desc(b):
        for ac in _divisors_desc(a):
            if ac * d * d * bc <= _BLOCK_ELEMENTS:
                return ac, bc
    return 1, 1


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
    ac, bc = _pick_chunks(a, d, b)
    n_a, n_b = a // ac, b // bc
    dtype = t1.dtype

    def block(ci, bi):
        """Transformed (row, col) block: (ac*d, d*bc).

        Grid axes stay whole (the FFT shears act along them); both bond axes
        chunk. The transform commutes with bond slicing — it acts per
        (a, b) index on the grid plane."""
        t1c = jax.lax.dynamic_slice_in_dim(t1, ci * ac, ac, axis=0)
        t2c = jax.lax.dynamic_slice_in_dim(t2, bi * bc, bc, axis=2)
        Tc = jnp.einsum("aik,kjb->aijb", t1c, t2c, precision=PRECISION)
        Wc = affine_warp(qs, Tc, warp_params).astype(dtype)
        return Wc.reshape(ac * d, d * bc)

    # Column index layout: cols = (grid j, bond b), j-major — a b-chunk is a
    # strided column set, resolved by viewing (cols, l) factors as (d, b, l).
    def matmul_A(O3):
        """A @ O, streamed over (row, col) blocks. O3: (d, b, l) -> (rows, l)."""
        def body(idx, Y):
            ci, bi = idx // n_b, idx % n_b
            Oc = jax.lax.dynamic_slice_in_dim(O3, bi * bc, bc, axis=1)
            Yc = block(ci, bi) @ Oc.reshape(d * bc, -1)
            cur = jax.lax.dynamic_slice_in_dim(Y, ci * ac * d, ac * d, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                Y, cur + Yc, ci * ac * d, axis=0)

        return jax.lax.fori_loop(0, n_a * n_b, body,
                                 jnp.zeros((rows, O3.shape[2]), dtype))

    def matmul_AH(Q):
        """A^H @ Q, streamed. Q: (rows, l) -> (d, b, l)."""
        def body(idx, Z3):
            ci, bi = idx // n_b, idx % n_b
            Qc = jax.lax.dynamic_slice_in_dim(Q, ci * ac * d, ac * d, axis=0)
            Zc = (block(ci, bi).T.conj() @ Qc).reshape(d, bc, -1)
            cur = jax.lax.dynamic_slice_in_dim(Z3, bi * bc, bc, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(
                Z3, cur + Zc, bi * bc, axis=1)

        return jax.lax.fori_loop(0, n_a * n_b, body,
                                 jnp.zeros((d, b, Q.shape[1]), dtype))

    # Randomized subspace iteration, restructured so ONE loop body holds one
    # A-sweep and one A^H-sweep (the remote XLA compile cost scales with the
    # number of distinct block-loop bodies, and each block inlines the full
    # contraction+transform chain — the classic Halko layout with separate
    # init/final sweeps compiles 4-5 bodies and blows the compile budget):
    #   X_0 = Omega;  Q_t = orth(A orth(X_t));  X_{t+1} = A^H Q_t
    # After q+1 rounds Q spans range((A A^H)^q A Omega) — the standard
    # power-iteration accuracy — and B = Q^H A = X_final^H falls out of the
    # carry with no extra sweep. Orthonormalizing a COPY of X before the
    # A-sweep preserves B (range(A X R^-1) == range(A X)).
    X0 = jax.random.normal(key, (d, b, l), dtype=t1.real.dtype).astype(dtype)
    Q0 = jnp.zeros((rows, l), dtype)

    def round_body(_, carry):
        X, _ = carry
        Xo = orthonormalize(X.reshape(cols, l), method="ns").reshape(d, b, l)
        Q = orthonormalize(matmul_A(Xo), method="ns")
        return matmul_AH(Q), Q

    X, Q = jax.lax.fori_loop(0, power_iters + 1, round_body, (X0, Q0))

    B = X.reshape(cols, l).T.conj()  # (l, cols) = Q^H A
    U_b, s, Vh = svd_compat(B, full_matrices=False)
    U_b, s, Vh = U_b[:, :cap], s[:cap], Vh[:cap, :]

    rank, mask = truncation_rank_mask(s, cap, abs_err, rel_err)
    sqrt_s = jnp.sqrt(s) * mask

    U = Q @ U_b  # (rows, cap)
    m1 = (U * sqrt_s[None, :]).reshape(a, d, cap)
    m2 = (sqrt_s[:, None] * Vh).reshape(cap, d, b)
    return m1, m2, rank
