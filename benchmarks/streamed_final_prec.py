#!/usr/bin/env python
"""On-chip A/B of the streamed split's FINAL-round precision (north star).

The round-4 roofline (`BENCHMARKS.md`) put the residual streamed splits
~4.8x from their bandwidth roofline; the largest single compute term is the
final factor-producing round, whose complex einsums at HIGHEST precision
cost 6 bf16 MXU passes per real matmul (24 per complex). `final_prec="high"`
halves that. This probe measures, at the production cz-split shape
(chi=100, d=1000, q=2):

- warm seconds/call for final_prec in {highest, high} (batch 8, the
  production dispatch layout), and
- the added factor error of the high path: relative probe-vector delta
  ``|m1 m2 v (high) - m1 m2 v (highest)| / |...|`` evaluated in-trace at
  HIGHEST (same sketch key, so the subspace is identical and the delta
  isolates the final-round precision).

Writes benchmarks/streamed_final_prec.json. The decision gate for flipping
QCT_STREAM_FINAL_PREC: added error orders below the production
rel_err=1e-2 truncation AND a real end-to-end win in bench.py
(queue-29 step bench-final-prec-high).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = os.path.dirname(os.path.abspath(__file__))
CHI = int(os.environ.get("QCT_PROBE_CHI", "100"))
D = int(os.environ.get("QCT_PROBE_GRID", "1000"))
BATCH = int(os.environ.get("QCT_PROBE_BATCH", "8"))
REPS = int(os.environ.get("QCT_PROBE_REPS", "3"))
GAIN = 0.37


def setup_cache():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(B, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@partial(jax.jit, static_argnums=(1, 2, 3))
def build_pair(seed, a, k, b):
    """Structured random MPS pair: Gaussian grid envelope x normal noise
    with exponential bond decay (decaying split spectrum, like the
    physical gate tensors; flat-spectrum Gaussians would make truncation
    behaviour unrealistic). Complex stays on-device."""
    qs = jnp.linspace(-20.0, 20.0, D)
    env = jnp.exp(-0.5 * (qs / 6.0) ** 2)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dk = jnp.exp(-0.05 * jnp.arange(k))
    t1 = ((jax.random.normal(k1, (a, D, k)) +
           1j * jax.random.normal(k2, (a, D, k)))
          * env[None, :, None] * dk[None, None, :])
    t2 = ((jax.random.normal(k3, (k, D, b)) +
           1j * jax.random.normal(k4, (k, D, b)))
          * env[None, :, None] * dk[:, None, None])
    n = jnp.sqrt(jnp.sum(jnp.abs(t1) ** 2) * jnp.sum(jnp.abs(t2) ** 2))
    return (t1 / jnp.sqrt(n)).astype(jnp.complex64), \
           (t2 / jnp.sqrt(n)).astype(jnp.complex64), qs


@jax.jit
def probe_apply(m1, m2, seed):
    """y = (m1 . m2) v on random probes, evaluated at HIGHEST; returns the
    REAL (re, im) planes (complex cannot cross the tunnel)."""
    cap = m2.shape[0]
    kv = jax.random.PRNGKey(seed)
    v = (jax.random.normal(kv, (m2.shape[1] * m2.shape[2], 8))
         .astype(jnp.float32))
    w = jnp.matmul(m2.reshape(cap, -1), v.astype(m2.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.matmul(m1.reshape(-1, cap), w,
                   precision=jax.lax.Precision.HIGHEST)
    return y.real, y.imag


def main():
    setup_cache()
    from quantum_computations_tpu.ops.streamed import (
        streamed_pair_svd, streamed_pair_svd_batched)

    out = {"chi": CHI, "grid": D, "batch": BATCH, "reps": REPS,
           "gain": GAIN, "device": str(jax.devices()[0])}

    # --- accuracy: unbatched split, same key, both precisions ------------
    t1, t2, qs = build_pair(0, CHI, CHI, CHI)
    qs_np = np.asarray(qs)
    key = jax.random.PRNGKey(7)
    ys = {}
    for prec in ("highest", "high"):
        m1, m2, rank = streamed_pair_svd(
            t1, t2, qs_np, ("cz", GAIN), max_bond_dim=CHI, abs_err=0.0,
            rel_err=1e-2, key=key, power_iters=2, final_prec=prec)
        yr, yi = probe_apply(m1, m2, 99)
        ys[prec] = np.asarray(yr) + 1j * np.asarray(yi)
        out[f"rank_{prec}"] = int(np.asarray(rank))
    delta = np.linalg.norm(ys["high"] - ys["highest"])
    ref = np.linalg.norm(ys["highest"])
    out["probe_rel_delta_high_vs_highest"] = float(delta / max(ref, 1e-30))

    # --- timing: batched split (production dispatch layout) -------------
    bt1 = jnp.broadcast_to(t1, (BATCH,) + t1.shape)
    bt2 = jnp.broadcast_to(t2, (BATCH,) + t2.shape)
    keys = jax.random.split(jax.random.PRNGKey(11), BATCH)
    for prec in ("highest", "high"):
        def call():
            m1, m2, rank = streamed_pair_svd_batched(
                bt1, bt2, qs_np, ("cz", GAIN), max_bond_dim=CHI,
                abs_err=0.0, rel_err=1e-2, keys=keys, power_iters=2,
                final_prec=prec)
            np.asarray(rank)  # sync
        call()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(REPS):
            call()
        out[f"sec_per_call_{prec}"] = round(
            (time.perf_counter() - t0) / REPS, 4)
    hi, lo = out["sec_per_call_highest"], out["sec_per_call_high"]
    out["speedup_high"] = round(hi / lo, 3) if lo else None
    json.dump(out, open(os.path.join(B, "streamed_final_prec.json"), "w"),
              indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
