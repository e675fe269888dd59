#!/usr/bin/env python
"""Roofline statement for the GKP production path (VERDICT r3 #5).

The production trajectory engine (gkp/batched.py) spends its device time in
the streamed two-mode splits (ops/streamed.py): each CZ-kernel split runs
(q+1) subspace-iteration rounds of A-sweep + A^H-sweep expressed as dense
einsums over (chi, d, chi) tensors. This script:

1. counts the analytic FLOPs/bytes of ONE batched streamed CZ split at the
   production shapes (a=b=chi=100, d=1000, l=chi+10, q=2, batch 16), from
   the einsum contractions in ``_cz_sweep_fns`` + the Newton-Schulz
   orthonormalizations + Gram/assembly;
2. times the split's ``iterate`` program on the chip (the streamed driver's
   device-side hot program — the Gram fetch / host eigh / assemble are
   measured separately by profile_rb.py's spans);
3. reports achieved TFLOP/s against MXU peak and achieved GB/s against the
   calib-measured HBM bandwidth — the honest MFU/BW statement BENCHMARKS.md
   needs next to traj/s.

Peaks default to TPU v5e: 197 TFLOP/s bf16 / ~49 TFLOP/s f32
(QCT_PEAK_BF16_TF / QCT_PEAK_F32_TF override), HBM measured by a copy
calibration pass like statevector_bench.py.

Prints JSON lines: {"metric": "gkp_streamed_split_roofline", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHI = int(os.environ.get("QCT_ROOF_CHI", 100))
D = int(os.environ.get("QCT_ROOF_GRID", 1000))
# Batch 8 (not the production 16): the synthetic full-rank (chi,d,chi)
# split program's XLA temp plan needs ~18 GB HBM at batch 16 (compile-time
# OOM on the 15.75 GB chip — queue21 pass 1). Production trajectories fit
# because adaptive ranks keep most splits below full rank; the roofline's
# per-trajectory FLOPs/bytes are batch-scaled, so batch 8 measures the same
# per-split intensity. Matches profile_rb.py's batch-8 attribution.
BATCH = int(os.environ.get("QCT_ROOF_BATCH", 8))
Q = int(os.environ.get("QCT_STREAM_POWER_ITERS", "2") or 2)
REPS = int(os.environ.get("QCT_ROOF_REPS", 3))
PEAK_BF16 = float(os.environ.get("QCT_PEAK_BF16_TF", 197.0)) * 1e12
PEAK_F32 = float(os.environ.get("QCT_PEAK_F32_TF", 49.0)) * 1e12


def split_flops(a: int, d: int, k: int, b: int, l: int, q: int) -> dict:
    """Analytic real-FLOP count of one streamed CZ split (one trajectory).

    Complex MAC = 8 real FLOPs. Counts follow _cz_sweep_fns (streamed.py):
      A-sweep:  W1 k*d*b*l + V d*d*k*l + Y a*k*d*l
      AH-sweep: U1 a*d*k*l + U2 d*d*k*l + out k*d*b*l
    plus 2 orthonormalizations/round (ops/linalg.orthonormalize "ns": two
    NS inverse-sqrt passes + one polish = 3 Gram/apply pairs ~ 6*n*l^2
    complex MACs on the tall factor + 2 passes of 24 coupled l^3 NS inner
    iterations), the final Gram (cols*l*l) and assembly (2*cols*l*cap).
    """
    rows, cols = a * d, d * b
    sweep_A = 8 * (k * d * b * l + d * d * k * l + a * k * d * l)
    sweep_AH = 8 * (a * d * k * l + d * d * k * l + k * d * b * l)

    def orth_flops(n):
        return 8 * (6 * n * l * l + 2 * 24 * 2 * l ** 3)

    orth = orth_flops(cols) + orth_flops(rows)
    per_round = sweep_A + sweep_AH + orth
    gram = 8 * cols * l * l
    cap = min(CHI, rows, cols)
    assemble = 8 * (rows * l * cap + cols * l * cap)
    total = (q + 1) * per_round + gram + assemble
    return {"per_round": per_round, "rounds": q + 1, "gram": gram,
            "assemble": assemble, "total": total,
            "sketch_rounds_flops": q * per_round,
            "final_round_flops": per_round}


def split_bytes(a: int, d: int, k: int, b: int, l: int, q: int) -> int:
    """HBM traffic floor of one split (complex64): per round each sweep
    reads t1 + t2 + the phase matrix and streams the (k,d,l)/(a,d,l)
    slivers; X/Q factors are read+written each round."""
    c8 = 8
    t_bytes = (a * d * k + k * d * b) * c8
    phase = d * d * c8
    sliver = (k * d * l + a * d * l) * c8
    xq = (d * b * l + a * d * l) * c8
    per_round = 2 * (t_bytes + phase) + 2 * sliver + 2 * xq
    return (q + 1) * per_round


def main():
    if os.environ.get("QCT_FORCE_CPU") == "1":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    if os.environ.get("QCT_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quantum_computations_tpu.ops import streamed

    a = b = k = CHI
    d = D
    rows, cols = a * d, d * b
    cap = min(CHI, rows, cols)
    l = min(cap + streamed.OVERSAMPLE, rows, cols)

    fl = split_flops(a, d, k, b, l, Q)
    by = split_bytes(a, d, k, b, l, Q)

    # --- calib: measured HBM copy bandwidth (statevector_bench method:
    # an 8-pass elementwise chain fused inside ONE jit on random data, with
    # a scalar reduction fetched to host so execution cannot be elided.
    # The previous version chained separate dispatches over a zeros buffer
    # and read 15.8 TB/s — pure dispatch pipelining, not HBM.) -------------
    n_cal = 1 << 27  # 512 MB fp32

    @jax.jit
    def copy_chain(seed):
        v = jax.random.normal(jax.random.PRNGKey(seed), (n_cal,),
                              dtype=jnp.float32)
        for _ in range(8):
            v = v * 1.0000001 + 0.0
        return jnp.sum(v[:128])

    float(copy_chain(0))
    t0 = time.perf_counter()
    for r in range(3):
        float(copy_chain(r + 1))
    cal_dt = (time.perf_counter() - t0) / (3 * 8)
    hbm_gbps = 2 * 4 * n_cal / cal_dt / 1e9
    print(json.dumps({"metric": "hbm_achieved", "achieved_GBps":
                      round(hbm_gbps, 1)}), flush=True)

    # --- time the iterate program at production shapes -------------------
    # Synthetic tensors built IN-TRACE (no complex host transfer); the
    # iterate program is fetched through the same signature path the
    # production engine uses, so the persistent cache is shared.
    qs = np.linspace(-20, 20, d).astype(np.float32)
    ac, bc = streamed._pick_chunks(a, d, b, streamed._BLOCK_ELEMENTS // BATCH)
    warp = ("cz", 1.0)
    sig = (a, d, k, b, BATCH, "complex64", warp, l, cap, ac, bc, Q,
           (None, None), (None, None))
    iterate, _assemble = streamed._get_programs(sig)

    @jax.jit
    def make_inputs(seed):
        kk = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(kk)
        t1r = jax.random.normal(k1, (BATCH, a, d, k)) / np.sqrt(a * d * k)
        t2r = jax.random.normal(k2, (BATCH, k, d, b)) / np.sqrt(k * d * b)
        return (t1r.astype(jnp.complex64), t2r.astype(jnp.complex64))

    t1, t2 = make_inputs(0)
    keys = jax.random.split(jax.random.PRNGKey(1), BATCH)

    t_c0 = time.perf_counter()
    X, Qm, Gr = iterate(t1, t2, qs, keys)
    g = np.asarray(Gr)  # force full execution (real buffer)
    compile_s = time.perf_counter() - t_c0
    assert np.all(np.isfinite(g)), "iterate produced non-finite Gram"

    t0 = time.perf_counter()
    for r in range(REPS):
        del X, Qm, Gr  # free the previous call's factors before re-running
        X, Qm, Gr = iterate(t1, t2, qs, keys)
        _ = np.asarray(Gr)
    dt = (time.perf_counter() - t0) / REPS

    total_flops = BATCH * fl["total"]
    total_bytes = BATCH * by
    achieved_tf = total_flops / dt / 1e12
    achieved_gbps = total_bytes / dt / 1e9
    # precision mix: q sketch rounds at bf16-rate, 1 final at f32-rate
    mix_peak = (fl["sketch_rounds_flops"] / fl["total"] * PEAK_BF16
                + (1 - fl["sketch_rounds_flops"] / fl["total"]) * PEAK_F32)
    print(json.dumps({
        "metric": "gkp_streamed_split_roofline",
        "shapes": {"chi": CHI, "grid": d, "l": l, "q": Q, "batch": BATCH},
        "iterate_s_per_call": round(dt, 4),
        "compile_or_cache_load_s": round(compile_s, 1),
        "analytic_tflops_per_call": round(total_flops / 1e12, 3),
        "achieved_TFLOPs": round(achieved_tf, 2),
        "pct_of_bf16_peak": round(100 * achieved_tf * 1e12 / PEAK_BF16, 2),
        "pct_of_mixed_precision_peak": round(
            100 * achieved_tf * 1e12 / mix_peak, 2),
        "analytic_GB_per_call": round(total_bytes / 1e9, 2),
        "achieved_GBps": round(achieved_gbps, 1),
        "pct_of_measured_hbm": round(100 * achieved_gbps / hbm_gbps, 1),
        "bound": ("compute" if achieved_tf * 1e12 / mix_peak
                  > achieved_gbps * 1e9 / (hbm_gbps * 1e9) else "bandwidth"),
    }), flush=True)


if __name__ == "__main__":
    main()
