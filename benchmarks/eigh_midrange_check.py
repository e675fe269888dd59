#!/usr/bin/env python
"""On-chip accuracy of the realified-Gram SVD at MID-SIZE materialised splits.

Round-2 verdict weak #7: two-mode splits with matrix side between
``cv.gates._EIGH_SAFE_SIDE`` (512) and the streaming threshold still hit the
f32 device eigh inside jitted executors (traced inputs cannot take the
host-driven streamed path), and no on-chip test pinned their accuracy.

This measures ``ops.linalg.svd_via_eigh`` on the device against a float64
host SVD for matrix sides 256..2048 on two spectrum classes:

- ``decay``: geometric singular-value decay (the typical MPS split under
  rel_err=1e-2 truncation) — MUST be accurate: asserts the kept singular
  values match f64 to <1e-2 relative and the truncated reconstruction is
  within 10% of the f64-optimal truncation error;
- ``degenerate``: exact rank-32 with a 32-fold degenerate spectrum — the
  documented worst case (ops/linalg.py:63-69 measured fabricated
  ~1e-3*lambda_max tails at n>=1000). Reported, not asserted: the
  production paths route around it (exact Bell splice, host-eigh streaming).

All device interaction uses real boundaries (split re/im in, real scalars
out) — the tunnelled backend cannot transfer complex buffers. Prints one
JSON line per (side, spectrum) and exits non-zero on an assertion failure.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIDES = [int(x) for x in os.environ.get("QCT_EIGH_SIDES", "256,512,1024,2048").split(",")]
REL_ERR = 1e-2  # the production truncation rule


def make_matrix(side: int, kind: str, rng) -> np.ndarray:
    m = 2 * side  # tall: Gram side = `side`, like an (a*d, d*b) split
    U = np.linalg.qr(rng.normal(size=(m, side)))[0]
    V = np.linalg.qr(rng.normal(size=(side, side)))[0]
    if kind == "decay":
        s = 0.8 ** np.arange(side)
    else:  # degenerate rank-32: four 8-fold degenerate plateaus
        s = np.zeros(side)
        s[:32] = np.repeat([1.0, 0.5, 0.25, 0.125], 8)
    A = (U * s) @ V.T
    # complex phase structure (realified-pair extraction is the risky part)
    phase = np.exp(1j * rng.uniform(0, 2 * np.pi, size=side))
    return (A * phase[None, :]).astype(np.complex64)


def main():
    import jax
    import jax.numpy as jnp
    from quantum_computations_tpu.ops.linalg import svd_via_eigh

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    @jax.jit
    def device_check(ar, ai, k):
        """Returns (s, trunc_err, recon_err) — all real arrays/scalars."""
        A = ar + 1j * ai
        U, s, Vh = svd_via_eigh(A)
        nrm = jnp.linalg.norm(A)
        keep = (jnp.arange(s.shape[0]) < k).astype(A.dtype)
        Ak = (U * (s * keep)[None, :]) @ Vh
        Afull = (U * s[None, :]) @ Vh
        return (s, jnp.linalg.norm(A - Ak) / nrm,
                jnp.linalg.norm(A - Afull) / nrm)

    rng = np.random.default_rng(7)
    failures = []
    for side in SIDES:
        for kind in ("decay", "degenerate"):
            A = make_matrix(side, kind, rng)
            s64 = np.linalg.svd(A.astype(np.complex128), compute_uv=False)
            # kept rank under the production rel_err rule
            k = int(np.searchsorted(-s64, -REL_ERR * s64[0]))
            k = max(k, 1)
            opt_trunc = float(np.linalg.norm(s64[k:]) / np.linalg.norm(s64))

            s_dev, trunc_err, recon_err = device_check(
                jnp.asarray(A.real), jnp.asarray(A.imag), k)
            s_dev = np.asarray(s_dev)
            sv_rel = float(np.max(np.abs(s_dev[:k] - s64[:k]) / s64[0]))
            row = {
                "metric": "eigh_midrange", "side": side, "kind": kind,
                "kept_rank": k,
                "sv_rel_err_kept": round(sv_rel, 6),
                "trunc_err_device": round(float(trunc_err), 6),
                "trunc_err_optimal_f64": round(opt_trunc, 6),
                "recon_err_full": round(float(recon_err), 6),
            }
            if kind == "decay":
                ok = sv_rel < 1e-2 and float(trunc_err) < max(1.1 * opt_trunc, 0.02)
                row["ok"] = bool(ok)
                if not ok:
                    failures.append((side, kind))
            print(json.dumps(row), flush=True)

    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
