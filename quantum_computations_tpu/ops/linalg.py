"""Truncated SVD kernels with static output shapes.

Functional parity with reference ``simulators/cv_simulator/mps.py``:
``randomized_range_finder`` (:6-23, Halko et al.), ``randomized_truncated_svd``
(:25-50, oversampling p=10, auto power iterations, transpose optimisation) and
``tensor_svd`` (:52-97, truncation rule via reversed cumulative sum).

TPU-native redesign: output bond dimensions are STATIC. ``tensor_svd`` returns
factors padded to a fixed capacity with truncated singular directions
**zero-masked** instead of sliced away. A zero-padded bond column is
mathematically inert in every downstream contraction, so results equal the
reference's dynamically-shaped truncation while keeping all shapes known to
XLA — whole circuits jit-compile once and vmap over trajectory batches.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..config import PRECISION

# Fixed oversampling for the randomized SVD (reference mps.py:28).
OVERSAMPLE = 10


def svd_via_eigh(A: jax.Array):
    """SVD of a complex matrix using only real eigh + matmuls.

    The TPU backend lowers neither complex SVD nor complex eigh (both
    UNIMPLEMENTED at run time); real eigh and complex matmul/QR work. So the
    Hermitian product B = A^H A is embedded as the real symmetric
    M = [[Re B, -Im B], [Im B, Re B]] whose spectrum is that of B with every
    eigenvalue doubled: a real eigenvector [p; q] of eigenvalue λ maps to the
    complex eigenvector p + iq, and the two members of each pair map to the
    same complex vector up to phase, so taking every other (descending-sorted)
    column yields an orthonormal complex eigenbasis. A tiny deterministic
    diagonal perturbation splits accidentally-degenerate eigenvalues so pairs
    never mix across eigenspaces. Squares the condition number — ample for
    bond-truncation decisions (rel_err >= 1e-6 in float32).
    """
    m, n = A.shape
    if m < n:
        U, s, Vh = svd_via_eigh(A.T.conj())
        return Vh.T.conj(), s, U.T.conj()
    B = A.T.conj() @ A
    # Split exact degeneracies (e.g. symmetric states): the realified pair
    # extraction below needs eigenvalue pairs separated by more than eigh's
    # resolution (~eps * lambda_max), else pairs interleave. The perturbation
    # scale therefore tracks the dtype.
    split = 1e-4 if B.real.dtype == jnp.float32 else 1e-6
    scale = jnp.trace(B).real / max(n, 1)
    B = B + (split * scale / max(n, 1)) * jnp.diag(jnp.arange(n, dtype=B.real.dtype))
    M = jnp.block([[B.real, -B.imag], [B.imag, B.real]])
    w, U2 = jnp.linalg.eigh(M)  # ascending, eigenvalues doubled
    w = w[::-1]
    U2 = U2[:, ::-1]
    V = (U2[:n, ::2] + 1j * U2[n:, ::2]).astype(A.dtype)  # one per pair
    # In a degenerate eigenspace the extracted complex combinations can have
    # norms far from 1 (the real basis mixes conjugate pairs); renormalise so
    # ||A v|| below measures a direction, not a scaled one. NOTE the accuracy
    # of this whole routine is bounded by the backend's eigh — the tunnelled
    # TPU's f32 eigh degrades badly on large degenerate spectra (fabricated
    # ~1e-3*lambda_max tails measured at n=2000), which is why the production
    # paths avoid large device Grams entirely (exact Bell splices; host-eigh
    # streamed two-mode splits above cv.gates._EIGH_SAFE_SIDE).
    norms = jnp.linalg.norm(V, axis=0)
    V = V / jnp.where(norms > 0, norms, 1.0)[None, :]
    AV = A @ V
    s = jnp.linalg.norm(AV, axis=0)  # exact singular values for exact eigvecs
    U = AV / jnp.where(s > 0, s, 1.0)[None, :]
    return U, s, V.T.conj()


def svd_compat(A: jax.Array, full_matrices: bool = False):
    """Backend-dispatching thin SVD: native on CPU/GPU, real-eigh-based on TPU."""
    assert not full_matrices
    if jax.default_backend() == "cpu" or not jnp.iscomplexobj(A):
        return jnp.linalg.svd(A, full_matrices=False)
    return svd_via_eigh(A)


def bucket(n: int) -> int:
    """Round a bond capacity up to a small set of sizes to bound the number of
    distinct compiled shapes (powers of two)."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def trim_split(m1: jax.Array, m2: jax.Array, rank):
    """Slice a zero-padded SVD split down to its (bucketed) true rank.

    Only possible when `rank` is concrete (eager mode): truncated directions
    are exact zeros, so slicing them away is lossless and restores the
    reference's dynamic-rank memory behaviour. Under jit (rank traced) this is
    a no-op and the static caps stand.

    m1's LAST axis and m2's FIRST axis are the shared bond.
    """
    if isinstance(rank, jax.core.Tracer):
        return m1, m2
    r = bucket(max(1, int(rank)))
    if r < m1.shape[-1]:
        m1 = m1[..., :r]
        m2 = m2[:r, ...]
    return m1, m2


def _hermitian_inv_sqrt(G: jax.Array, eps_rel: float = 1e-12) -> jax.Array:
    """G^{-1/2} for a small Hermitian PSD matrix, via REAL symmetric eigh of
    the realification (TPU has no complex eigh lowering).

    A deterministic diagonal perturbation splits degenerate eigenvalues —
    WITHOUT it the realified pair extraction returns complex-dependent
    columns exactly when G is near-identity (which the second
    orthonormalization pass always produces). The perturbation scale is set
    by what the dtype's eigh can resolve.
    """
    n = G.shape[0]
    if jnp.iscomplexobj(G):
        split = 1e-4 if G.real.dtype == jnp.float32 else 1e-9
        scale = jnp.trace(G).real / max(n, 1)
        G = G + (split * scale / max(n, 1)) * jnp.diag(jnp.arange(n, dtype=G.real.dtype))
        M = jnp.block([[G.real, -G.imag], [G.imag, G.real]])
        w, U = jnp.linalg.eigh(M)
        V = U[:n, ::2] + 1j * U[n:, ::2]  # one complex eigvec per doubled pair
        V = V.astype(G.dtype)
        w = w[::2]  # one eigenvalue per doubled pair (columns taken ::2)
    else:
        w, V = jnp.linalg.eigh(M := G)
    floor = jnp.max(w) * eps_rel
    inv_sqrt_w = jnp.where(w > floor, 1.0 / jnp.sqrt(jnp.clip(w, floor, None)), 0.0)
    return jnp.matmul(V * inv_sqrt_w[None, :], V.T.conj(), precision=PRECISION)


def _ns_inv_sqrt(G: jax.Array, iters: int = 24, ridge: float = 1e-7) -> jax.Array:
    """G^{-1/2} for a small Hermitian PSD matrix by the coupled Newton–Schulz
    iteration — matmuls only, NO eigh.

    On the remote-compiled TPU backend a (realified) eigh instance costs
    ~500 s of XLA compile time; inside the streamed two-mode-gate programs
    that dominates the compile budget. NS trades it for ``iters`` tiny
    matmuls: normalise A = G/tr(G) (+ridge) so the spectrum is in (0, 1],
    then Y_{k+1} = Y_k (3I - Z_k Y_k)/2, Z_{k+1} = (3I - Z_k Y_k) Z_k / 2
    converges with Z -> A^{-1/2}.
    """
    n = G.shape[0]
    eye = jnp.eye(n, dtype=G.dtype)
    t = jnp.trace(G).real.astype(G.real.dtype) + jnp.asarray(1e-30, G.real.dtype)
    A = G / t + ridge * eye
    Y, Z = A, eye

    def body(_, YZ):
        Y, Z = YZ
        # full precision: at the MXU's bf16 default an ill-conditioned Gram
        # goes indefinite and the iteration diverges to NaN (these are tiny
        # (l x l) matmuls — precision here is free)
        T = 1.5 * eye - 0.5 * jnp.matmul(Z, Y, precision=PRECISION)
        return (jnp.matmul(Y, T, precision=PRECISION),
                jnp.matmul(T, Z, precision=PRECISION))

    Y, Z = jax.lax.fori_loop(0, iters, body, (Y, Z))
    return Z / jnp.sqrt(t)


def orthonormalize(Y: jax.Array, *, method: str = "eigh") -> jax.Array:
    """Tall-skinny orthonormalization: Gram inverse-sqrt + Newton–Schulz polish.

    Q0 = Y (Y^H Y)^{-1/2} handles the bulk (one small eigh + matmuls, no QR
    custom call — on the TPU backend, vmapped tall-skinny QR triggers a
    pathological layout with the batch axis as lanes, 32x memory padding).
    The polish step Q = Q0 (3I - Q0^H Q0)/2 converges quadratically and,
    unlike a second inverse-sqrt pass, has no eigenvector-degeneracy issue on
    the near-identity Gram it receives.

    method="ns" replaces the Gram eigh with the matmul-only Newton–Schulz
    inverse sqrt (:func:`_ns_inv_sqrt`) — same double-pass structure, far
    cheaper to compile on the remote TPU backend; accuracy is bounded by the
    polish pass exactly as for eigh.
    """
    # Gram-path matmuls run at full precision: at the TPU's bf16 matmul
    # default, the Gram of an ill-conditioned sketch loses positive
    # semi-definiteness and the inverse-sqrt (either method) produces
    # garbage/NaN. The Grams are (l x l) — precision here is free.
    if method == "ns":
        # Two full NS inverse-sqrt passes (each pass reduces the condition
        # number roughly quadratically), then the polish.
        Q = Y
        for _ in range(2):
            G = jnp.matmul(Q.T.conj(), Q, precision=PRECISION)
            Q = jnp.matmul(Q, _ns_inv_sqrt(G), precision=PRECISION)
    else:
        G = jnp.matmul(Y.T.conj(), Y, precision=PRECISION)
        Q = jnp.matmul(Y, _hermitian_inv_sqrt(G), precision=PRECISION)
    G2 = jnp.matmul(Q.T.conj(), Q, precision=PRECISION)
    eye = jnp.eye(G2.shape[0], dtype=G2.dtype)
    return jnp.matmul(Q, 1.5 * eye - 0.5 * G2, precision=PRECISION)


def randomized_range_finder(A: jax.Array, l: int, q: int, key: jax.Array) -> jax.Array:
    """Find Q (n x l) with Q Q^H A ~= A via Gaussian sketch + power iterations.

    All work is matmuls + small Gram eigh (see :func:`orthonormalize`). The
    power iteration is a rolled `fori_loop` to keep the compiled graph small.
    """
    O = jax.random.normal(key, (A.shape[1], l), dtype=A.real.dtype).astype(A.dtype)
    Q = orthonormalize(A @ O)

    def body(_, Q):
        Q1 = orthonormalize(A.T.conj() @ Q)
        return orthonormalize(A @ Q1)

    return jax.lax.fori_loop(0, q, body, Q)


def randomized_truncated_svd(A: jax.Array, k: int, key: jax.Array):
    """Rank-k randomized SVD (Halko). Returns (U, s, Vh) with k columns/rows.

    Power-iteration count follows the reference heuristic
    (q = 7 if k < 0.1 * min(shape) else 4, mps.py:29); the larger dimension is
    reduced first (transpose optimisation, mps.py:31-34).
    """
    q = 7 if k < 0.1 * min(A.shape) else 4
    transpose = A.shape[0] < A.shape[1]
    if transpose:
        A = A.T
    Q = randomized_range_finder(A, min(k + OVERSAMPLE, min(A.shape)), q, key)
    B = Q.T.conj() @ A
    U, s, Vh = svd_compat(B, full_matrices=False)
    U, s, Vh = Q @ U[:, :k], s[:k], Vh[:k, :]
    if transpose:
        return Vh.T, s, U.T
    return U, s, Vh


def truncation_rank_mask(s: jax.Array, max_bond_dim: int, abs_err: float, rel_err: float):
    """Number of singular values to keep and the {0,1} keep-mask.

    Reference rule (mps.py:87-89): keep the smallest r such that the sum of
    the dropped tail is <= max(0, abs_err, sum(s) * rel_err); additionally
    r <= max_bond_dim. Expressed as a mask so shapes stay static.
    """
    allowed = jnp.maximum(abs_err, jnp.sum(s) * rel_err)
    tail = jnp.cumsum(s[::-1])[::-1]  # tail[i] = s[i] + s[i+1] + ...
    keep = tail > allowed
    keep = jnp.logical_and(keep, jnp.arange(s.shape[0]) < max_bond_dim)
    return jnp.sum(keep), keep.astype(s.dtype)


def matrix_svd_split(
    m: jax.Array,
    cap: int,
    *,
    max_bond_dim: int,
    abs_err: float,
    rel_err: float,
    key: jax.Array | None = None,
    use_randomized: bool | None = None,
):
    """SVD-split m ~= m1 @ m2 with a static internal dimension `cap`.

    m1: (m.shape[0], cap), m2: (cap, m.shape[1]); truncated directions are
    zeroed. Randomized path is chosen by the reference trigger
    ``max_bond_dim * 10 < full_rank`` (mps.py:80-83) unless overridden.
    Returns (m1, m2, rank).
    """
    full_rank = min(m.shape)
    if use_randomized is None:
        use_randomized = max_bond_dim * 10 < full_rank
    if use_randomized:
        if key is None:
            raise ValueError("randomized SVD requires a PRNG key")
        k = min(cap, full_rank)
        u, s, vh = randomized_truncated_svd(m, k, key)
    else:
        u, s, vh = svd_compat(m, full_matrices=False)

    rank, mask = truncation_rank_mask(s, max_bond_dim, abs_err, rel_err)
    sqrt_s = jnp.sqrt(s) * mask

    m1 = u * sqrt_s[None, :]
    m2 = sqrt_s[:, None] * vh

    # Pad or slice the internal dimension to the static cap.
    k_have = m1.shape[1]
    if k_have < cap:
        m1 = jnp.pad(m1, ((0, 0), (0, cap - k_have)))
        m2 = jnp.pad(m2, ((0, cap - k_have), (0, 0)))
    elif k_have > cap:
        m1 = m1[:, :cap]
        m2 = m2[:cap, :]
    return m1, m2, rank


def tensor_svd(
    tensor: jax.Array,
    left_indices,
    right_indices,
    *,
    max_bond_dim: int | None = None,
    abs_err: float = 0.0,
    rel_err: float = 1e-12,
    key: jax.Array | None = None,
    cap: int | None = None,
    svd_method: str = "auto",
):
    """Split a rank-n tensor across (left_indices | right_indices) by SVD.

    Returns (m1, m2, rank): m1 owns left_indices + [bond], m2 owns
    [bond] + right_indices, with the bond padded to a STATIC capacity
    (bucketed ``min(max_bond_dim, prod(left), prod(right))`` unless `cap`
    given). Semantics match reference ``tensor_svd`` (mps.py:52-97) with
    truncation-as-masking.
    """
    left_indices = list(left_indices)
    right_indices = list(right_indices)
    if sorted(left_indices + right_indices) != list(range(tensor.ndim)):
        raise IndexError("Output indices does not match indices of initial tensor")

    lshape = [tensor.shape[i] for i in left_indices]
    rshape = [tensor.shape[i] for i in right_indices]
    m = jnp.transpose(tensor, left_indices + right_indices)
    m = m.reshape(math.prod(lshape), math.prod(rshape))

    full_rank = min(m.shape)
    mbd = full_rank if max_bond_dim is None else min(max_bond_dim, full_rank)
    if cap is None:
        # honour the configured cap exactly (bucket(100)=128 would cost 28%
        # extra memory in every downstream contraction); bucketing still
        # applies to the small growth sizes via min().
        cap = min(bucket(mbd), mbd) if max_bond_dim is not None else bucket(mbd)
    if svd_method == "full":
        use_randomized = False
    elif svd_method == "randomized":
        use_randomized = True
    else:
        use_randomized = None if max_bond_dim is not None else False
    m1, m2, rank = matrix_svd_split(
        m, cap, max_bond_dim=mbd, abs_err=abs_err, rel_err=rel_err, key=key,
        use_randomized=use_randomized,
    )
    return m1.reshape(*lshape, cap), m2.reshape(cap, *rshape), rank
