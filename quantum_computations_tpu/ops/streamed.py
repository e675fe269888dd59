"""Streamed two-mode contraction + transform + randomized SVD.

Every two-mode CV gate acts by contracting neighbour tensors into
A[a, i, j, b] = W(t1 . t2) — W a grid transform from the
:func:`..ops.interp.affine_warp` menu (BS rotation, CX shear, CZ phase,
SWAP transpose) — then SVD-splitting the (a d, d b) matrix. At production
bond dimensions the matrix alone is tens of GB — the reference materialises
it in host RAM (cv gates.py:73-84); HBM cannot.

This module computes the randomized SVD WITHOUT materialising A: the
transform acts independently on row blocks over the `a` bond, so every
matmul of the sketch (A O, A^H Q, Q^H A) streams over row blocks recomputed
on the fly inside a `fori_loop` — recompute-over-memory, the classic
accelerator trade. Peak memory is one row block plus the tall-skinny factors.

Two execution layouts with identical math:

- **traced** (:func:`_streamed_traced`): one program holding the whole
  subspace iteration — used when the inputs are tracers (the caller is
  already inside jit, e.g. the whole-gadget engines at sub-production
  sizes) and on CPU where compiles are cheap.
- **program driver** (:func:`_streamed_driver`): the iteration is split
  into FIVE small jitted programs (init / orth / A-sweep / A^H-sweep /
  finalize) driven by a host loop. The remote-compiled TPU backend kills
  XLA compiles after ~15-20 min and a single program inlining A-sweep +
  A^H-sweep + eigh exceeds that; each split program compiles in minutes
  and is cached (in-process and persistently) keyed by shape signature,
  so deep circuits and sweeps reuse them. The host loop performs NO eager
  jnp ops — eager dispatch of complex-constant ops is UNIMPLEMENTED on
  the tunnelled backend and poisons the runtime session.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PRECISION
from .interp import affine_warp
from .linalg import OVERSAMPLE, orthonormalize, svd_compat, truncation_rank_mask

# target row-block footprint (elements of the complex transformed block,
# including any batch axis)
_BLOCK_ELEMENTS = 1 << 25

# How the concrete (program-driver) path splits a BS rotation:
# "cz" (default) = three Fourier-conjugated CZ splits — the elementwise cz
# block transform is ~18x cheaper per sweep than the 3-FFT-shear rot warp on
# the remote TPU backend; "rot" = one split with the direct rot warp.
import os as _os
_BS_DECOMP = _os.environ.get("QCT_BS_DECOMP", "cz")

# Power-iteration count used by the streamed splits. Default q=2: the
# physical gate spectra decay fast enough that two power rounds are ample
# at production tolerances (rel_err=1e-2) and each saved iteration removes
# two full streaming sweeps. Adjudicated on-chip (round 3 queue14):
# q=2 = 0.268 traj/s vs heuristic 0.231 (+16%), RB anchor cell parity
# z=-0.37 vs the reference's 1980-sample mean (benchmarks/rb_q2_anchor.dat).
# That validation covered SHALLOW circuits (depth <= 20): once truncation
# binds hard (bond ranks saturated at max_bond_dim, deep circuits), the
# singular spectrum at the cutoff is flat and a q=2 sketch keeps measurably
# less weight per split than the reference's own q=7 randomized SVD
# (reference mps.py:25-50), compounding over layers — the round-5 depth-30
# discriminator (benchmarks/q_discriminator_ab.json).
# QCT_STREAM_POWER_ITERS=<int> overrides; "ref" restores the reference
# heuristic q = 7 or 4 (mps.py:29) that call sites pass in; "auto" uses the
# reference heuristic when the call site reports the split's operands
# rank-SATURATED and q=2 otherwise (call sites without rank knowledge get
# the reference heuristic — correctness first).
_POWER_ITERS_ENV = _os.environ.get("QCT_STREAM_POWER_ITERS")
_DEFAULT_POWER_ITERS = 2

# Precision of the sketch (power-round) sweeps in the mixed-precision
# iterate; the final factor-producing round runs at the resolved final
# precision — QCT_STREAM_FINAL_PREC env default, overridable per call via
# the public entries' final_prec kwarg (part of the program-cache key)
# (default: config.PRECISION = HIGHEST, i.e. 6-pass bf16 per real matmul —
# 24 MXU passes per complex matmul). QCT_STREAM_FINAL_PREC=high halves
# that (3-pass bf16, ~1e-6 relative on these contraction depths — four
# orders below the production rel_err=1e-2 truncation): the round-4
# roofline showed the streamed split at 7.3% of bf16 peak with the final
# HIGHEST round the largest single compute term, so this is the scoped
# compute-side lever. Accuracy/speed adjudicated on-chip before any
# default flip (benchmarks/streamed_final_prec.py).
_SKETCH_PRECISION = jax.lax.Precision.DEFAULT
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
_FINAL_PREC_NAME = _os.environ.get("QCT_STREAM_FINAL_PREC", "highest").lower()

# Where the (l x l) Gram eigendecomposition runs. "host" (default) fetches
# the Gram and eigendecomposes in numpy between the iterate and assemble
# programs — two dispatches + one device->host sync per split. "device"
# inlines a realified-Gram eigh into ONE fused program: no fetch at all.
# The device eigh costs a long one-time remote compile per Gram shape, but
# at production the cap is pinned (l = chi + OVERSAMPLE), so the persistent
# compile cache amortises it; the round-3 attribution showed the Gram fetch
# sync alone at ~34% of trajectory time.
_EIGH_MODE = _os.environ.get("QCT_STREAM_EIGH", "host")


def effective_power_iters(q: int, saturated: bool | None = None) -> int:
    """Resolve the streamed-split power-iteration count.

    ``q`` is the reference heuristic the call site computed (7 or 4,
    reference mps.py:29); the default returns ``_DEFAULT_POWER_ITERS``
    unless QCT_STREAM_POWER_ITERS pins an integer, "ref", or "auto".
    ``saturated``: call-site knowledge that the split's operand bonds sit
    at max_bond_dim (truncation binding -> flat cutoff spectrum, where the
    cheap sketch loses weight); None means unknown. "auto" returns the
    reference heuristic when saturated is True or unknown, and the fast
    default only when the caller positively reports headroom."""
    if _POWER_ITERS_ENV:
        if _POWER_ITERS_ENV == "ref":
            return q
        if _POWER_ITERS_ENV == "auto":
            return q if saturated is not False else _DEFAULT_POWER_ITERS
        return int(_POWER_ITERS_ENV)
    return _DEFAULT_POWER_ITERS


def _divisors_desc(n: int):
    return [x for x in range(n, 0, -1) if n % x == 0]


def _pick_chunks(a: int, d: int, b: int, budget: int | None = None) -> tuple[int, int]:
    """(ac, bc): divisors of a and b with ac*d*d*bc <= budget
    (default: the module's ``_BLOCK_ELEMENTS``, read at call time).

    The grid axes can never be chunked (the FFT shears need them whole), but
    both bond axes can: the a-bond splits the matrix rows, the b-bond splits
    (strided) columns. Prefer keeping b whole, then shrink it."""
    if budget is None:
        budget = _BLOCK_ELEMENTS
    for bc in _divisors_desc(b):
        for ac in _divisors_desc(a):
            if ac * d * d * bc <= budget:
                return ac, bc
    return 1, 1


def _sweep_fns(qs, warp_params, shapes, chunks, dtype, precision=None):
    """Block-streamed A@O and A^H@Q for one (shape, warp) signature.

    Column index layout: cols = (grid j, bond b), j-major — a b-chunk is a
    strided column set, resolved by viewing (cols, l) factors as (d, b, l).

    `precision` overrides the block-contraction einsum precision (the power
    rounds of the subspace iteration only need a good sketch, so they run at
    the MXU's native bf16 rate; the final round that produces the factors
    runs at the configured high precision).
    """
    a, d, k, b = shapes
    ac, bc = chunks
    n_a, n_b = a // ac, b // bc
    rows = a * d
    prec = PRECISION if precision is None else precision

    def block(t1, t2, ci, bi):
        """Transformed (row, col) block: (ac*d, d*bc).

        Grid axes stay whole (the FFT shears act along them); both bond axes
        chunk. The transform commutes with bond slicing — it acts per
        (a, b) index on the grid plane."""
        t1c = jax.lax.dynamic_slice_in_dim(t1, ci * ac, ac, axis=0)
        t2c = jax.lax.dynamic_slice_in_dim(t2, bi * bc, bc, axis=2)
        Tc = jnp.einsum("aik,kjb->aijb", t1c, t2c, precision=prec)
        Wc = affine_warp(qs, Tc, warp_params).astype(dtype)
        return Wc.reshape(ac * d, d * bc)

    def matmul_A(t1, t2, O3):
        """A @ O, streamed over (row, col) blocks. O3: (d, b, l) -> (rows, l)."""
        def body(idx, Y):
            ci, bi = idx // n_b, idx % n_b
            Oc = jax.lax.dynamic_slice_in_dim(O3, bi * bc, bc, axis=1)
            Yc = jnp.matmul(block(t1, t2, ci, bi), Oc.reshape(d * bc, -1),
                            precision=prec)
            cur = jax.lax.dynamic_slice_in_dim(Y, ci * ac * d, ac * d, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                Y, cur + Yc, ci * ac * d, axis=0)

        return jax.lax.fori_loop(0, n_a * n_b, body,
                                 jnp.zeros((rows, O3.shape[2]), dtype))

    def matmul_AH(t1, t2, Q):
        """A^H @ Q, streamed. Q: (rows, l) -> (d, b, l)."""
        def body(idx, Z3):
            ci, bi = idx // n_b, idx % n_b
            Qc = jax.lax.dynamic_slice_in_dim(Q, ci * ac * d, ac * d, axis=0)
            Zc = jnp.matmul(block(t1, t2, ci, bi).T.conj(), Qc,
                            precision=prec).reshape(d, bc, -1)
            cur = jax.lax.dynamic_slice_in_dim(Z3, bi * bc, bc, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(
                Z3, cur + Zc, bi * bc, axis=1)

        return jax.lax.fori_loop(0, n_a * n_b, body,
                                 jnp.zeros((d, b, Q.shape[1]), dtype))

    return matmul_A, matmul_AH


def _cz_sweep_fns(qs, gain, shapes, dtype, precision=None):
    """Dense-kernel A@O and A^H@Q for the CZ phase warp — NO block streaming.

    The cz transform is elementwise, A[(a,i),(j,b)] = P[i,j] sum_k t1 t2 with
    P = exp(i g q q^T), so the products factor through the bond:
        (A O)[a,i,l]  = sum_k t1[a,i,k] (P @ (t2 . O))[k,i,l]
    Every intermediate is a (k, d, l) tall sliver (~90 MB at production) and
    the dominant op is ONE dense (d x d) @ (d x k l) MXU matmul — the
    block-streamed form materialises every (row, col) block in HBM and is
    bandwidth-bound (~3x slower measured at chi=100, d=1024).
    """
    a, d, k, b = shapes
    rows = a * d
    prec = PRECISION if precision is None else precision

    def phase():
        return jnp.exp(1j * gain * jnp.outer(qs, qs)).astype(dtype)

    def matmul_A(t1, t2, O3):
        P = phase()
        W1 = jnp.einsum("kjb,jbl->kjl", t2, O3, precision=prec)
        V = jnp.einsum("ij,kjl->kil", P, W1, precision=prec)
        Y = jnp.einsum("aik,kil->ail", t1, V, precision=prec)
        return Y.reshape(rows, -1)

    def matmul_AH(t1, t2, Q):
        P = phase()
        Qr = Q.reshape(a, d, -1)
        U1 = jnp.einsum("aik,ail->ikl", jnp.conj(t1), Qr, precision=prec)
        U2 = jnp.einsum("ij,ikl->jkl", jnp.conj(P), U1, precision=prec)
        return jnp.einsum("kjb,jkl->jbl", jnp.conj(t2), U2, precision=prec)

    return matmul_A, matmul_AH


def _pick_sweep_fns(qs, warp_params, shapes, chunks, dtype, precision=None):
    if warp_params[0] == "cz":
        return _cz_sweep_fns(qs, warp_params[1], shapes, dtype, precision)
    return _sweep_fns(qs, warp_params, shapes, chunks, dtype, precision)


def _finalize_fn(shapes, l, cap, mbd, abs_err, rel_err):
    """B = Q^H A = X^H -> SVD -> masked split factors (m1, m2, rank)."""
    a, d, k, b = shapes
    cols = d * b

    def finalize(X, Q):
        B = X.reshape(cols, l).T.conj()
        U_b, s, Vh = svd_compat(B, full_matrices=False)
        U_b, s, Vh = U_b[:, :cap], s[:cap], Vh[:cap, :]
        rank, mask = truncation_rank_mask(s, mbd, abs_err, rel_err)
        sqrt_s = jnp.sqrt(s) * mask
        U = Q @ U_b  # (rows, cap)
        m1 = (U * sqrt_s[None, :]).reshape(a, d, cap)
        m2 = (sqrt_s[:, None] * Vh).reshape(cap, d, b)
        return m1, m2, rank

    return finalize


# ---------------------------------------------------------------------------
# Traced layout: one program holds the whole subspace iteration.
# ---------------------------------------------------------------------------

def _streamed_traced(t1, t2, qs, warp_params, *, max_bond_dim, abs_err,
                     rel_err, key, power_iters):
    a, d, k = t1.shape
    b = t2.shape[-1]
    rows, cols = a * d, d * b
    cap = min(max_bond_dim, rows, cols)
    l = min(cap + OVERSAMPLE, rows, cols)
    chunks = _pick_chunks(a, d, b, _BLOCK_ELEMENTS)
    dtype = t1.dtype

    matmul_A, matmul_AH = _pick_sweep_fns(qs, warp_params, (a, d, k, b), chunks, dtype)
    finalize = _finalize_fn((a, d, k, b), l, cap, max_bond_dim, abs_err, rel_err)

    # Randomized subspace iteration, restructured so ONE loop body holds one
    # A-sweep and one A^H-sweep (compile cost scales with the number of
    # distinct block-loop bodies):
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
        Q = orthonormalize(matmul_A(t1, t2, Xo), method="ns")
        return matmul_AH(t1, t2, Q), Q

    X, Q = jax.lax.fori_loop(0, power_iters + 1, round_body, (X0, Q0))
    return finalize(X, Q)


# ---------------------------------------------------------------------------
# Program-driver layout: five small jitted programs + a host loop.
# ---------------------------------------------------------------------------

_PROGRAMS: dict[tuple, tuple] = {}


def _get_programs(sig):
    """Two jitted programs per signature: `iterate` (pre-Fourier + init +
    subspace iteration + small Gram) and `assemble` (factor assembly +
    post-Fourier). The eigendecomposition of the (l x l) Gram runs on the
    HOST between them — it is milliseconds of numpy, while a device eigh
    costs ~500 s of remote XLA compile per shape signature (and adaptive
    rank trimming produces many signatures)."""
    progs = _PROGRAMS.get(sig)
    if progs is not None:
        return progs
    (a, d, k, b, batch, dtype_str, warp_params, l, cap,
     ac, bc, power_iters, f_pre, f_post, final_prec_name) = sig
    final_prec = _PRECISIONS[final_prec_name]
    dtype = jnp.dtype(dtype_str)
    rdtype = {jnp.dtype(jnp.complex64): jnp.float32,
              jnp.dtype(jnp.complex128): jnp.float64}.get(jnp.dtype(dtype), dtype)
    shapes = (a, d, k, b)
    rows, cols = a * d, d * b
    from .interp import fourier

    def iterate_fn(t1, t2, qs, key):
        """Pre-Fourier, init and the whole subspace iteration in ONE program
        (the tunnelled backend pays ~0.1-0.5 s per program round-trip).

        Mixed precision: the `power_iters` sketch rounds only steer the
        subspace, so their sweeps run at the MXU's fast default (bf16
        passes); the final round — whose A-sweep produces Q and whose
        A^H-sweep produces B^H, i.e. the actual factors — runs at the
        configured high precision."""
        if f_pre[0] is not None:
            t1 = fourier(qs, t1, axis=1, inv=f_pre[0])
        if f_pre[1] is not None:
            t2 = fourier(qs, t2, axis=1, inv=f_pre[1])
        mmA_lo, mmAH_lo = _pick_sweep_fns(qs, warp_params, shapes, (ac, bc),
                                          dtype, precision=_SKETCH_PRECISION)
        mmA_hi, mmAH_hi = _pick_sweep_fns(qs, warp_params, shapes, (ac, bc),
                                          dtype, precision=final_prec)

        def round_with(mmA, mmAH, X):
            Xo = orthonormalize(X.reshape(cols, l), method="ns").reshape(d, b, l)
            Q = orthonormalize(mmA(t1, t2, Xo), method="ns")
            return mmAH(t1, t2, Q), Q

        def round_body(_, carry):
            return round_with(mmA_lo, mmAH_lo, carry[0])

        X0 = jax.random.normal(key, (d, b, l), dtype=rdtype).astype(dtype)
        Q0 = jnp.zeros((rows, l), dtype)
        X, _ = jax.lax.fori_loop(0, power_iters, round_body, (X0, Q0))
        X, Q = round_with(mmA_hi, mmAH_hi, X)
        Xm = X.reshape(cols, l)
        G = jnp.matmul(Xm.T.conj(), Xm, precision=PRECISION)  # = B B^H (l x l)
        return X, Q, jnp.stack([G.real, G.imag]).astype(rdtype)

    def assemble_fn(X, Q, qs, ub, sqm, ism):
        """(X, Q) + host eigen-factors -> masked split factors + post-Fourier.

        ub: (2, l, cap) real pair of the top Gram eigenvectors; sqm =
        sqrt(s)*mask; ism = mask/sqrt(s). m1 = (Q U_b) diag(sqm);
        m2 = diag(ism) (Xm U_b)^H  [since B = Xm^H and Vh = diag(1/s) U_b^H B].
        """
        U_b = (ub[0] + 1j * ub[1]).astype(dtype)
        Xm = X.reshape(cols, l)
        W = jnp.matmul(Xm, U_b, precision=PRECISION)          # (cols, cap)
        m1 = jnp.matmul(Q, U_b, precision=PRECISION) * sqm[None, :].astype(rdtype)
        m2 = ism[:, None].astype(rdtype) * W.T.conj()
        m1 = m1.reshape(a, d, cap)
        m2 = m2.reshape(cap, d, b)
        if f_post[0] is not None:
            m1 = fourier(qs, m1, axis=1, inv=f_post[0])
        if f_post[1] is not None:
            m2 = fourier(qs, m2, axis=1, inv=f_post[1])
        return m1, m2

    if batch:
        progs = (
            jax.jit(jax.vmap(iterate_fn, in_axes=(0, 0, None, 0))),
            jax.jit(jax.vmap(assemble_fn, in_axes=(0, 0, None, 0, 0, 0))),
        )
    else:
        progs = (jax.jit(iterate_fn), jax.jit(assemble_fn))
    _PROGRAMS[sig] = progs
    return progs


_FUSED_PROGRAMS: dict[tuple, object] = {}


def _get_fused_program(sig):
    """One jitted program per signature holding iterate + realified-Gram eigh
    + truncation + assembly — the QCT_STREAM_EIGH=device layout. Truncation
    parameters are traced arguments, so one compile serves every tolerance."""
    prog = _FUSED_PROGRAMS.get(sig)
    if prog is not None:
        return prog
    (a, d, k, b, batch, dtype_str, warp_params, l, cap,
     ac, bc, power_iters, f_pre, f_post, final_prec_name) = sig
    final_prec = _PRECISIONS[final_prec_name]
    dtype = jnp.dtype(dtype_str)
    rdtype = {jnp.dtype(jnp.complex64): jnp.float32,
              jnp.dtype(jnp.complex128): jnp.float64}.get(jnp.dtype(dtype), dtype)
    shapes = (a, d, k, b)
    rows, cols = a * d, d * b
    from .interp import fourier

    def fused_fn(t1, t2, qs, key, mbd, abs_err, rel_err):
        if f_pre[0] is not None:
            t1 = fourier(qs, t1, axis=1, inv=f_pre[0])
        if f_pre[1] is not None:
            t2 = fourier(qs, t2, axis=1, inv=f_pre[1])
        mmA_lo, mmAH_lo = _pick_sweep_fns(qs, warp_params, shapes, (ac, bc),
                                          dtype, precision=_SKETCH_PRECISION)
        mmA_hi, mmAH_hi = _pick_sweep_fns(qs, warp_params, shapes, (ac, bc),
                                          dtype, precision=final_prec)

        def round_with(mmA, mmAH, X):
            Xo = orthonormalize(X.reshape(cols, l), method="ns").reshape(d, b, l)
            Q = orthonormalize(mmA(t1, t2, Xo), method="ns")
            return mmAH(t1, t2, Q), Q

        def round_body(_, carry):
            return round_with(mmA_lo, mmAH_lo, carry[0])

        X0 = jax.random.normal(key, (d, b, l), dtype=rdtype).astype(dtype)
        Q0 = jnp.zeros((rows, l), dtype)
        X, _ = jax.lax.fori_loop(0, power_iters, round_body, (X0, Q0))
        X, Q = round_with(mmA_hi, mmAH_hi, X)
        Xm = X.reshape(cols, l)
        G = jnp.matmul(Xm.T.conj(), Xm, precision=PRECISION)  # = B B^H (l x l)

        # realified-Gram eigendecomposition (mirrors _host_factor; see
        # linalg.svd_via_eigh for the pair-extraction argument)
        n = G.shape[0]
        G = (G + G.T.conj()) / 2
        split = 1e-4 if rdtype == jnp.float32 else 1e-9
        scale = jnp.trace(G).real / max(n, 1)
        G = G + (split * scale / max(n, 1)) * jnp.diag(
            jnp.arange(n, dtype=rdtype))
        M = jnp.block([[G.real, -G.imag], [G.imag, G.real]])
        w, U2 = jnp.linalg.eigh(M)
        w = w[::-1]
        U2 = U2[:, ::-1]
        V = (U2[:n, ::2] + 1j * U2[n:, ::2]).astype(dtype)
        norms = jnp.linalg.norm(V, axis=0)
        V = V / jnp.where(norms > 0, norms, 1.0)[None, :]
        s = jnp.sqrt(jnp.clip(w[::2], 0.0, None))[:cap].astype(rdtype)
        U_b = V[:, :cap]

        allowed = jnp.maximum(abs_err, jnp.sum(s) * rel_err).astype(rdtype)
        tail = jnp.cumsum(s[::-1])[::-1]
        keep = jnp.logical_and(tail > allowed, jnp.arange(cap) < mbd)
        rank = jnp.sum(keep).astype(jnp.int32)
        mask = keep.astype(rdtype)
        sq = jnp.sqrt(s)
        sqm = sq * mask
        ism = jnp.where(s > 0, mask / jnp.where(s > 0, sq, 1.0), 0.0)

        W = jnp.matmul(Xm, U_b, precision=PRECISION)          # (cols, cap)
        m1 = jnp.matmul(Q, U_b, precision=PRECISION) * sqm[None, :]
        m2 = ism[:, None] * W.T.conj()
        m1 = m1.reshape(a, d, cap)
        m2 = m2.reshape(cap, d, b)
        if f_post[0] is not None:
            m1 = fourier(qs, m1, axis=1, inv=f_post[0])
        if f_post[1] is not None:
            m2 = fourier(qs, m2, axis=1, inv=f_post[1])
        return m1, m2, rank

    if batch:
        prog = jax.jit(jax.vmap(fused_fn,
                                in_axes=(0, 0, None, 0, None, None, None)))
    else:
        prog = jax.jit(fused_fn)
    _FUSED_PROGRAMS[sig] = prog
    return prog


def _host_factor(Gr, cap, mbd, abs_err, rel_err):
    """Host-side eigendecomposition + truncation of one (2, l, l) real-pair
    Gram. Returns (ub (2, l, cap), sqm (cap,), ism (cap,), rank) with the
    reference truncation rule (mps.py:87-89) applied to the capped spectrum
    exactly as the on-device finalize did."""
    G = (Gr[0] + 1j * Gr[1]).astype(np.complex128)
    w, U = np.linalg.eigh((G + G.T.conj()) / 2.0)
    w = np.clip(w[::-1], 0.0, None)
    U = U[:, ::-1]
    s = np.sqrt(w)[:cap]
    U = U[:, :cap]
    allowed = max(abs_err, s.sum() * rel_err)
    tail = np.cumsum(s[::-1])[::-1]
    keep = (tail > allowed) & (np.arange(s.shape[0]) < mbd)
    rank = int(keep.sum())
    mask = keep.astype(np.float64)
    sq = np.sqrt(s)
    sqm = sq * mask
    ism = np.where(s > 0, mask / np.where(s > 0, sq, 1.0), 0.0)
    ub = np.stack([U.real, U.imag])
    return ub, sqm, ism, rank


def _warp_sig(warp_params: tuple) -> tuple:
    """Hashable, concrete warp descriptor (floats forced to Python floats)."""
    out = []
    for p in warp_params:
        if isinstance(p, (bool, str)):
            out.append(p)
        elif isinstance(p, (int, float, np.floating, np.integer)):
            out.append(float(p))
        elif isinstance(p, (jax.Array, np.ndarray)) and not isinstance(p, jax.core.Tracer) and np.ndim(p) == 0:
            out.append(float(p))
        else:
            raise TypeError(
                f"streamed program driver needs concrete warp params, got {p!r}")
    return tuple(out)


def _streamed_driver(t1, t2, qs, warp_params, *, max_bond_dim, abs_err,
                     rel_err, key, power_iters, batched: bool,
                     f_pre=(None, None), f_post=(None, None),
                     final_prec: str | None = None):
    if batched:
        _, a, d, k = t1.shape
        b = t2.shape[-1]
        batch = t1.shape[0]
    else:
        a, d, k = t1.shape
        b = t2.shape[-1]
        batch = 0
    rows, cols = a * d, d * b
    cap = min(max_bond_dim, rows, cols)
    l = min(cap + OVERSAMPLE, rows, cols)
    ac, bc = _pick_chunks(a, d, b, _BLOCK_ELEMENTS // max(1, batch))
    warp_params = tuple(warp_params[:1]) + _warp_sig(tuple(warp_params[1:]))

    # NOTE: truncation params (max_bond_dim, abs_err, rel_err) are host-side
    # and deliberately NOT in the signature — sweeps at different tolerances
    # reuse the same compiled programs.
    sig = (a, d, k, b, batch, str(jnp.dtype(t1.dtype)), warp_params, l, cap,
           ac, bc, int(power_iters), tuple(f_pre), tuple(f_post),
           (final_prec or _FINAL_PREC_NAME))

    from ..utils.profiling import span as _span

    rdtype = np.float32 if t1.dtype == jnp.complex64 else np.float64
    qs = np.asarray(qs, dtype=rdtype)

    if _EIGH_MODE == "device":
        fused = _get_fused_program(sig)
        with _span("streamed:fused"):
            return fused(t1, t2, qs, key, np.int32(max_bond_dim),
                         rdtype(abs_err), rdtype(rel_err))

    iterate, assemble = _get_programs(sig)
    with _span("streamed:iterate"):
        X, Q, Gr = iterate(t1, t2, qs, key)
    with _span("streamed:gram_fetch"):
        Grn = np.asarray(Gr)

    mbd = int(max_bond_dim)
    with _span("streamed:host_eigh"):
        if batched:
            facs = [_host_factor(Grn[i], cap, mbd, abs_err, rel_err)
                    for i in range(batch)]
            ub = np.stack([f[0] for f in facs]).astype(rdtype)
            sqm = np.stack([f[1] for f in facs]).astype(rdtype)
            ism = np.stack([f[2] for f in facs]).astype(rdtype)
            rank = np.asarray([f[3] for f in facs], dtype=np.int32)
        else:
            ub, sqm, ism, rank = _host_factor(Grn, cap, mbd, abs_err, rel_err)
            ub, sqm, ism = (x.astype(rdtype) for x in (ub, sqm, ism))
    with _span("streamed:assemble"):
        m1, m2 = assemble(X, Q, qs, ub, sqm, ism)
    return m1, m2, rank


# ---------------------------------------------------------------------------
# BS-rotation as three Fourier-conjugated CZ gates.
# ---------------------------------------------------------------------------
#
# The rot warp needs 3 FFT shears (6 grid FFTs) inside EVERY streamed block —
# measured ~18x the cost of the elementwise CZ phase per sweep on the remote
# TPU backend. The metaplectic identity
#     BS(theta) = CXa(tan(theta/2)) CXb(-sin(theta)) CXa(tan(theta/2)),
#     CXa(g) = F1 . exp(i g x1 x2) . F1^-1   (F = single-mode Fourier gate)
# (the classic rotation-by-three-shears, with each shear written as a
# Fourier-conjugated CZ) replaces one rot-warped SVD by three cz-warped SVDs
# plus six SINGLE-TENSOR Fourier gates (no SVD, no bond growth — F acts on
# one grid axis). Validated to machine precision against rotate_fft.

def _streamed_rot_via_cz(t1, t2, qs, angle, *, max_bond_dim, abs_err, rel_err,
                         key, power_iters, batched, final_prec=None):
    """Streamed BS(angle) split via the 3-CZ decomposition (concrete inputs).

    Application order (rightmost factor first):
      F1^-1 | cz(t) | F1 | F2^-1 | cz(m) | F2 | F1^-1 | cz(t) | F1
    with t = tan(angle/2), m = -sin(angle); each cz is one streamed split
    whose program absorbs the surrounding Fourier gates (f_pre/f_post —
    True = F^-1, False = F, None = none), so a BS costs exactly six device
    dispatches + three host eigendecompositions.
    """
    t_g = float(np.tan(angle / 2.0))
    m_g = float(-np.sin(angle))
    if batched:
        karr = jnp.asarray(key)
        ks = jax.vmap(lambda kk: jax.random.split(kk, 3))(karr)
        keys = [ks[:, i, :] for i in range(3)]
    else:
        keys = list(jax.random.split(jnp.asarray(key), 3))

    def split(a, b, g, kk, f_pre, f_post):
        return _streamed_driver(a, b, qs, ("cz", g),
                                max_bond_dim=max_bond_dim, abs_err=abs_err,
                                rel_err=rel_err, key=kk,
                                power_iters=power_iters, batched=batched,
                                f_pre=f_pre, f_post=f_post,
                                final_prec=final_prec)

    m1, m2, _ = split(t1, t2, t_g, keys[0], (True, None), (False, True))
    m1, m2, _ = split(m1, m2, m_g, keys[1], (None, None), (True, False))
    m1, m2, rank = split(m1, m2, t_g, keys[2], (None, None), (False, None))
    return m1, m2, rank


def _streamed_shear_via_cz(t1, t2, qs, gain, control_left, *, max_bond_dim,
                           abs_err, rel_err, key, power_iters, batched,
                           final_prec=None):
    """Streamed CX (shear) split as a single Fourier-conjugated CZ split:
    ("shear", g, True) = F2 . cz(-g) . F2^-1, ("shear", g, False) mirrors on
    mode 1 (validated to machine precision against the FFT shear warp)."""
    gain = float(gain)
    if control_left:
        f_pre, f_post = (None, True), (None, False)
    else:
        f_pre, f_post = (True, None), (False, None)
    return _streamed_driver(t1, t2, qs, ("cz", -gain),
                            max_bond_dim=max_bond_dim,
                            abs_err=abs_err, rel_err=rel_err, key=key,
                            power_iters=power_iters, batched=batched,
                            f_pre=f_pre, f_post=f_post,
                            final_prec=final_prec)


def _dispatch_concrete(t1, t2, qs, warp_params, *, max_bond_dim, abs_err,
                       rel_err, key, power_iters, batched, final_prec=None):
    """Concrete-input dispatch: route rot/shear through the cz kernel
    (QCT_BS_DECOMP=cz default), everything else through the direct driver."""
    kw = dict(max_bond_dim=max_bond_dim, abs_err=abs_err, rel_err=rel_err,
              key=key, power_iters=power_iters, batched=batched,
              final_prec=final_prec)
    if _BS_DECOMP == "cz":
        if warp_params[0] == "rot":
            return _streamed_rot_via_cz(t1, t2, qs, float(warp_params[1]), **kw)
        if warp_params[0] == "shear":
            return _streamed_shear_via_cz(t1, t2, qs, warp_params[1],
                                          warp_params[2], **kw)
    return _streamed_driver(t1, t2, qs, warp_params, **kw)


def streamed_pair_svd(t1: jax.Array, t2: jax.Array, qs: jax.Array,
                      warp_params: tuple, *,
                      max_bond_dim: int, abs_err: float, rel_err: float,
                      key: jax.Array, power_iters: int = 4,
                      final_prec: str | None = None):
    """SVD-split of affine_warp(t1 . t2, warp_params) viewed as an
    (a d, d b) matrix.

    t1: (a, d, k), t2: (k, d, b); returns (m1 (a, d, cap), m2 (cap, d, b),
    rank) with the same truncation semantics as :func:`..linalg.tensor_svd`
    (zero-masked static cap = max_bond_dim).

    Concrete inputs run through the split-program driver (compile-budget
    friendly on the remote TPU backend); traced inputs inline the whole
    iteration into the enclosing program.
    """
    if any(isinstance(x, jax.core.Tracer) for x in (t1, t2, qs)):
        return _streamed_traced(t1, t2, qs, warp_params,
                                max_bond_dim=max_bond_dim, abs_err=abs_err,
                                rel_err=rel_err, key=key,
                                power_iters=power_iters)
    return _dispatch_concrete(t1, t2, qs, warp_params,
                              max_bond_dim=max_bond_dim, abs_err=abs_err,
                              rel_err=rel_err, key=key,
                              power_iters=power_iters, batched=False,
                              final_prec=final_prec)


def streamed_pair_svd_batched(t1: jax.Array, t2: jax.Array, qs: jax.Array,
                              warp_params: tuple, *,
                              max_bond_dim: int, abs_err: float,
                              rel_err: float, keys: jax.Array,
                              power_iters: int = 4,
                              final_prec: str | None = None):
    """Batched :func:`streamed_pair_svd`: t1 (B, a, d, k), t2 (B, k, d, b),
    keys (B, 2). Returns (m1 (B, a, d, cap), m2 (B, cap, d, b), rank (B,)).

    Only callable with concrete arrays (it drives split jitted programs from
    the host — the layout the remote TPU backend's compile budget requires).
    """
    if any(isinstance(x, jax.core.Tracer) for x in (t1, t2, qs, keys)):
        raise TypeError("streamed_pair_svd_batched drives host-side programs "
                        "and cannot be traced; call it outside jit")
    return _dispatch_concrete(t1, t2, qs, warp_params,
                              max_bond_dim=max_bond_dim, abs_err=abs_err,
                              rel_err=rel_err, key=keys,
                              power_iters=power_iters, batched=True,
                              final_prec=final_prec)
