#!/usr/bin/env python
"""Per-gate timing of the DV statevector engine on large qubit counts.

The north-star metric of BASELINE.md: per-gate time at a >=28-qubit state
vector, compared against the HBM roofline (every amplitude read + written
once per gate: 2 * 8 bytes * 2^N of traffic in complex64 / 2 * 2 * 4 bytes in
split-real float32).

Runs BOTH paths:
- XLA: complex64 tensordot contraction (dv.qop.apply_unitary) inside one jit;
- Pallas: split-real fused branch-mix kernel (ops.pallas_kernels.apply_1q).

All device interaction uses real-valued boundaries (the axon TPU backend
cannot transfer complex buffers). Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("QCT_SV_QUBITS", 28))
REPS = int(os.environ.get("QCT_SV_REPS", 3))
HBM_GBPS = float(os.environ.get("QCT_SV_HBM_GBPS", 819.0))  # v5e
# comma list of paths to run: calib,xla,pallas,fused. At N>=30 the
# non-donating paths need >16 GB (8.6 GB state, separate in+out buffers),
# so only the donated fused chain fits one chip — run PATHS=calib,fused.
PATHS = set(os.environ.get("QCT_SV_PATHS", "calib,xla,pallas,fused").split(","))


def main():
    import jax
    import jax.numpy as jnp
    from quantum_computations_tpu.dv import qop
    from quantum_computations_tpu.ops import pallas_kernels as pk

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    H = np.asarray(qop.H)
    # gates on a spread of qubit positions (all with inner >= 128 for pallas);
    # long chain amortises the in-trace init + reduction
    base = [0, 3, N // 2, N - 9, 5, N // 3]
    targets = (base * 4)[:24]
    n_gates = len(targets)

    # ---- achievable-bandwidth calibration (pure elementwise pass) ---------
    # Capped at 2^28 elements: at N=30 the PRNG + ping-pong buffers exceed
    # 16 GB HBM, and achieved bandwidth is size-independent at these sizes.
    cal_n = min(N, 28)

    @jax.jit
    def copy_chain(seed):
        v = jax.random.normal(jax.random.PRNGKey(seed), (2**cal_n,), dtype=jnp.float32)
        for _ in range(8):
            v = v * 1.0000001 + 0.0
        return jnp.sum(v[:128])

    float(copy_chain(0))
    t0 = time.perf_counter()
    for r in range(REPS):
        float(copy_chain(r + 1))
    per_pass = (time.perf_counter() - t0) / (REPS * 8)
    achieved_gbps = 2 * 4 * 2**cal_n / per_pass / 1e9
    print(json.dumps({
        "metric": "hbm_achieved", "qubits": cal_n,
        "elementwise_pass_ms": round(per_pass * 1e3, 3),
        "achieved_GBps": round(achieved_gbps, 1),
    }), flush=True)

    if "xla" in PATHS:
        _run_xla(jax, jnp, qop, targets, n_gates)
    if "pallas" in PATHS:
        _run_pallas(jax, jnp, qop, pk, targets, n_gates)
    if "fused" in PATHS:
        _run_fused(jax, jnp, qop, pk, n_gates, achieved_gbps)
    if "slab" in PATHS:
        _run_slab(jax, jnp, qop, achieved_gbps)
    if "slabengine" in PATHS:
        _run_slab_engine(jax, jnp, qop, achieved_gbps)
    if "fusedxla" in PATHS:
        # same 24-gate chain, two qubit spreads: the bench targets (6
        # distinct -> 1 window) and a 14-distinct spread (2 windows)
        _run_fused_xla(jax, jnp, qop, targets, achieved_gbps, tag="6q")
        spread = [(3 + 2 * i) % (N - 1) for i in range(14)]
        spread = list(dict.fromkeys(spread))[:14]
        _run_fused_xla(jax, jnp, qop, (spread * 2)[:24], achieved_gbps,
                       tag="14q")


def _run_xla(jax, jnp, qop, targets, n_gates):
    H = np.asarray(qop.H)

    # ---- XLA complex path (complex stays on device) -----------------------
    @jax.jit
    def xla_chain(seed):
        key = jax.random.PRNGKey(seed)
        # random-ish real init built in-trace; normalised
        v = jax.random.normal(key, (2**N,), dtype=jnp.float32)
        state = (v / jnp.linalg.norm(v)).astype(jnp.complex64)
        for q in targets:
            state = qop.apply_unitary_grouped(state, jnp.asarray(H, jnp.complex64), (q,))
        return jnp.sum(jnp.abs(state) ** 2)

    t0 = time.perf_counter()
    out = float(xla_chain(0))
    compile_s = time.perf_counter() - t0
    assert abs(out - 1.0) < 1e-3, out
    t0 = time.perf_counter()
    for r in range(REPS):
        out = float(xla_chain(r + 1))
    xla_dt = (time.perf_counter() - t0) / (REPS * n_gates)

    bytes_complex = 2 * 8 * 2**N  # read + write complex64
    roofline_c = bytes_complex / (HBM_GBPS * 1e9)
    print(json.dumps({
        "metric": "dv_per_gate_time_xla", "qubits": N,
        "value_ms": round(xla_dt * 1e3, 3),
        "roofline_ms": round(roofline_c * 1e3, 3),
        "x_of_roofline": round(xla_dt / roofline_c, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def _run_pallas(jax, jnp, qop, pk, targets, n_gates):
    H = np.asarray(qop.H)

    # ---- Pallas split-real path ------------------------------------------
    interpret = jax.default_backend() == "cpu"

    @jax.jit
    def pallas_chain(seed):
        key = jax.random.PRNGKey(seed)
        v = jax.random.normal(key, (2**N,), dtype=jnp.float32)
        xr = v / jnp.linalg.norm(v)
        xi = jnp.zeros_like(xr)
        for q in targets:
            xr, xi = pk.apply_1q(xr, xi, jnp.asarray(H, jnp.complex64), q, N,
                                 interpret=interpret)
        return jnp.sum(xr * xr + xi * xi)

    t0 = time.perf_counter()
    out = float(pallas_chain(0))
    compile_s = time.perf_counter() - t0
    assert abs(out - 1.0) < 1e-3, out
    t0 = time.perf_counter()
    for r in range(REPS):
        out = float(pallas_chain(r + 1))
    pl_dt = (time.perf_counter() - t0) / (REPS * n_gates)

    bytes_real = 2 * 2 * 4 * 2**N  # two planes, read + write float32
    roofline_r = bytes_real / (HBM_GBPS * 1e9)
    print(json.dumps({
        "metric": "dv_per_gate_time_pallas", "qubits": N,
        "value_ms": round(pl_dt * 1e3, 3),
        "roofline_ms": round(roofline_r * 1e3, 3),
        "x_of_roofline": round(pl_dt / roofline_r, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def _run_fused(jax, jnp, qop, pk, n_gates, achieved_gbps):
    H = np.asarray(qop.H)
    interpret = jax.default_backend() == "cpu"
    roofline_r = 2 * 2 * 4 * 2**N / (HBM_GBPS * 1e9)

    # ---- Pallas fused-chain path (k gates in ONE HBM pass) ----------------
    # The chain kernel reads and writes every amplitude once for the whole
    # k-gate chain, so its per-gate floor is roofline_pass / k. Gate bits are
    # restricted to the fusable window of the (c_bits, block_rows) layout;
    # a full circuit routes other qubits through apply_1q / XLA swaps.
    k = n_gates
    fus = pk.fusable_bits(N)
    chain_bits = tuple((list(fus) * (k // len(fus) + 1))[:k])
    us_np = np.stack([H] * k).astype(np.complex64)

    @jax.jit
    def fused_chain(seed):
        # iota+sin init instead of PRNG: fuses to one generator pass with no
        # random-bits scratch buffer, so the N=30 state (2 x 4.3 GB planes,
        # outputs donated onto them) fits the 16 GB chip.
        idx = jax.lax.iota(jnp.float32, 2**N)
        v = jnp.sin(idx * (0.1 + 1e-4 * seed)) + 0.5
        xr = v / jnp.linalg.norm(v)
        xi = jnp.zeros_like(xr)
        xr, xi = pk.apply_1q_chain(xr, xi, jnp.asarray(us_np), chain_bits, N,
                                   donate=True, interpret=interpret)
        return jnp.sum(xr * xr + xi * xi)

    t0 = time.perf_counter()
    out = float(fused_chain(0))
    compile_s = time.perf_counter() - t0
    assert abs(out - 1.0) < 1e-3, out
    t0 = time.perf_counter()
    for r in range(REPS):
        out = float(fused_chain(r + 1))
    pass_dt = (time.perf_counter() - t0) / REPS
    fused_dt = pass_dt / k

    print(json.dumps({
        "metric": "dv_per_gate_time_pallas_fused_chain", "qubits": N,
        "chain_len": k,
        "pass_ms": round(pass_dt * 1e3, 3),
        "value_ms": round(fused_dt * 1e3, 4),
        "roofline_pass_ms": round(roofline_r * 1e3, 3),
        "x_of_roofline": round(pass_dt / roofline_r, 2),
        "achieved_floor_pass_ms": round(2 * 2 * 4 * 2**N / (achieved_gbps * 1e9) * 1e3, 3),
        "x_of_achieved_floor": round(pass_dt / (2 * 2 * 4 * 2**N / (achieved_gbps * 1e9)), 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def _run_slab(jax, jnp, qop, achieved_gbps):
    """Minor-slab window economics: (a) a fused 7-qubit window applied as a
    pure (R, 128) @ (128, 128) matmul (zero transposes), and (b) a bit-group
    permute pass (swap bit groups [0..6] <-> [7..13]) — the two primitives
    of a lazy-layout slab engine."""
    from quantum_computations_tpu.dv import fusion

    H = np.asarray(qop.H)
    slab = tuple(range(N - 7, N))
    gates = [(H, (q,)) for q in (list(slab) * 4)[:24]]  # 24 gates -> 1 window
    (w, tgts), = fusion.fuse_windows(gates)
    assert tgts == slab
    wr = np.ascontiguousarray(w.real.astype(np.float32))
    wi = np.ascontiguousarray(w.imag.astype(np.float32))
    PASSES = 8
    floor_pass = 2 * 2 * 4 * 2**N / (achieved_gbps * 1e9)

    # (a1) streamed in-place Pallas variant — the only one that fits N=30
    from quantum_computations_tpu.ops import pallas_kernels as pk
    interpret = jax.default_backend() == "cpu"
    wrt = np.ascontiguousarray(wr.T)
    wit = np.ascontiguousarray(wi.T)

    @jax.jit
    def slab_chain_pl(seed):
        idx = jax.lax.iota(jnp.float32, 2**N)
        v = jnp.sin(idx * (0.1 + 1e-4 * seed)) + 0.5
        xr = v / jnp.linalg.norm(v)
        xi = jnp.zeros_like(xr)
        for _ in range(PASSES):
            xr, xi = pk.slab_matmul(xr, xi, jnp.asarray(wrt),
                                    jnp.asarray(wit), 128,
                                    interpret=interpret)
        return jnp.sum(xr * xr + xi * xi)

    t0 = time.perf_counter()
    out = float(slab_chain_pl(0))
    compile_s = time.perf_counter() - t0
    assert abs(out - 1.0) < 1e-3, out
    t0 = time.perf_counter()
    for r in range(REPS):
        float(slab_chain_pl(r + 1))
    pass_dt = (time.perf_counter() - t0) / (REPS * PASSES)
    print(json.dumps({
        "metric": "dv_slab_window_pass_pallas", "qubits": N,
        "gates_per_window": 24, "passes_timed": PASSES,
        "pass_ms": round(pass_dt * 1e3, 3),
        "value_ms_per_gate": round(pass_dt / 24 * 1e3, 4),
        "achieved_floor_pass_ms": round(floor_pass * 1e3, 3),
        "x_of_achieved_floor": round(pass_dt / floor_pass, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)

    if N >= 30:
        return  # the non-aliasing XLA variant needs >16 GB at N=30

    @jax.jit
    def slab_chain(seed):
        idx = jax.lax.iota(jnp.float32, 2**N)
        v = jnp.sin(idx * (0.1 + 1e-4 * seed)) + 0.5
        xr = v / jnp.linalg.norm(v)
        xi = jnp.zeros_like(xr)
        for _ in range(PASSES):
            xr, xi = fusion.apply_window_split(
                xr, xi, jnp.asarray(wr), jnp.asarray(wi), tgts, N)
        return jnp.sum(xr * xr + xi * xi)

    t0 = time.perf_counter()
    out = float(slab_chain(0))
    compile_s = time.perf_counter() - t0
    assert abs(out - 1.0) < 1e-3, out
    t0 = time.perf_counter()
    for r in range(REPS):
        float(slab_chain(r + 1))
    pass_dt = (time.perf_counter() - t0) / (REPS * PASSES)

    print(json.dumps({
        "metric": "dv_slab_window_pass", "qubits": N,
        "gates_per_window": 24, "passes_timed": PASSES,
        "pass_ms": round(pass_dt * 1e3, 3),
        "value_ms_per_gate": round(pass_dt / 24 * 1e3, 4),
        "achieved_floor_pass_ms": round(floor_pass * 1e3, 3),
        "x_of_achieved_floor": round(pass_dt / floor_pass, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)

    # (b) bit-group permute: swap bits [0..6] <-> [7..13] on both planes
    @jax.jit
    def permute_chain(seed):
        idx = jax.lax.iota(jnp.float32, 2**N)
        v = jnp.sin(idx * (0.1 + 1e-4 * seed)) + 0.5
        xr = v / jnp.linalg.norm(v)
        xi = jnp.zeros_like(xr)
        for _ in range(PASSES):
            xr = jnp.swapaxes(xr.reshape(-1, 128, 128), 1, 2).reshape(-1)
            xi = jnp.swapaxes(xi.reshape(-1, 128, 128), 1, 2).reshape(-1)
        return jnp.sum(xr * xr + xi * xi)

    t0 = time.perf_counter()
    out = float(permute_chain(0))
    compile_p = time.perf_counter() - t0
    assert abs(out - 1.0) < 1e-3, out
    t0 = time.perf_counter()
    for r in range(REPS):
        float(permute_chain(r + 1))
    perm_dt = (time.perf_counter() - t0) / (REPS * PASSES)
    print(json.dumps({
        "metric": "dv_bitgroup_permute_pass", "qubits": N,
        "pass_ms": round(perm_dt * 1e3, 3),
        "achieved_floor_pass_ms": round(floor_pass * 1e3, 3),
        "x_of_achieved_floor": round(perm_dt / floor_pass, 2),
        "compile_s": round(compile_p, 1),
    }), flush=True)


def _run_slab_engine(jax, jnp, qop, achieved_gbps):
    """End-to-end lazy-layout slab engine (FastStatevector fusion_mode=
    'slab') on the 24-gate / 14-distinct-qubit chain: steady state is two
    move passes + two slab matmuls per chain (the two 7-qubit windows evict
    each other)."""
    from quantum_computations_tpu.dv.fast_sv import FastStatevector

    H = np.asarray(qop.H)
    if os.environ.get("QCT_SV_SLAB_RESIDENT") == "1":
        # resident-only chain: matmuls alias in-place, no move passes —
        # the N=30 engine configuration (transpose moves need 12 GB live)
        spread = list(range(N - 7, N))
    else:
        spread = [(3 + 2 * i) % (N - 1) for i in range(14)]
        spread = list(dict.fromkeys(spread))[:14]
    gates = [(H, (int(q),)) for q in (spread * 2)[:24]]
    k = len(gates)

    sv = FastStatevector(N, fusion_mode="slab")
    t0 = time.perf_counter()
    # warm up until the layout cycle's plans are all compiled: the lazy
    # layout evolves across runs, so the first few chains trace distinct
    # plans before the cycle repeats and caches kick in
    for _w in range(3):
        sv.run_compiled(gates)   # whole chain = ONE dispatch (tunnel RTT
    _ = sv.norm_sq()             # is ~45 ms/step — 18x the kernel time)
    compile_s = time.perf_counter() - t0
    passes_before = sv.layout_passes
    t0 = time.perf_counter()
    for _r in range(REPS):
        sv.run_compiled(gates)
    out = sv.norm_sq()
    chain_dt = (time.perf_counter() - t0) / REPS
    assert abs(out - 1.0) < 1e-3, out
    passes_per_chain = (sv.layout_passes - passes_before) / REPS

    floor_pass = 2 * 2 * 4 * 2**N / (achieved_gbps * 1e9)
    print(json.dumps({
        "metric": "dv_slab_engine_chain", "qubits": N,
        "chain_len": k, "n_windows": 2,
        "plan_windows": sv.plan_windows,
        "layout_passes_per_chain": round(passes_per_chain, 2),
        "total_ms": round(chain_dt * 1e3, 3),
        "value_ms_per_gate": round(chain_dt / k * 1e3, 4),
        "achieved_floor_pass_ms": round(floor_pass * 1e3, 3),
        "x_of_achieved_floor_per_chain": round(chain_dt / floor_pass, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def _run_fused_xla(jax, jnp, qop, targets, achieved_gbps, tag=""):
    """Window-fused chain: gates fuse into <=7-qubit unitaries applied as
    one grouped MXU contraction per HBM pass (dv.fusion)."""
    from quantum_computations_tpu.dv import fusion

    H = np.asarray(qop.H)
    k = len(targets)
    gates = [(H, (int(q),)) for q in targets]
    windows = fusion.fuse_windows(gates)
    w_arrays = [(np.ascontiguousarray(u.real), np.ascontiguousarray(u.imag),
                 tgts) for u, tgts in windows]

    @jax.jit
    def fused_xla_chain(seed):
        idx = jax.lax.iota(jnp.float32, 2**N)
        v = jnp.sin(idx * (0.1 + 1e-4 * seed)) + 0.5
        xr = v / jnp.linalg.norm(v)
        xi = jnp.zeros_like(xr)
        for ur, ui, tgts in w_arrays:
            xr, xi = fusion.apply_window_split(
                xr, xi, jnp.asarray(ur), jnp.asarray(ui), tgts, N)
        return jnp.sum(xr * xr + xi * xi)

    t0 = time.perf_counter()
    out = float(fused_xla_chain(0))
    compile_s = time.perf_counter() - t0
    assert abs(out - 1.0) < 1e-3, out
    t0 = time.perf_counter()
    for r in range(REPS):
        out = float(fused_xla_chain(r + 1))
    pass_dt = (time.perf_counter() - t0) / REPS

    floor_pass = 2 * 2 * 4 * 2**N / (achieved_gbps * 1e9)
    print(json.dumps({
        "metric": "dv_per_gate_time_xla_fused_window", "qubits": N,
        "tag": tag, "chain_len": k, "n_windows": len(windows),
        "window_sizes": [len(t) for _, _, t in w_arrays],
        "total_ms": round(pass_dt * 1e3, 3),
        "value_ms": round(pass_dt / k * 1e3, 4),
        "per_window_ms": round(pass_dt / len(windows) * 1e3, 3),
        "achieved_floor_pass_ms": round(floor_pass * 1e3, 3),
        "x_of_achieved_floor_per_window": round(
            pass_dt / len(windows) / floor_pass, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
