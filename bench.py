#!/usr/bin/env python
"""Benchmark: batched GKP randomised-benchmarking trajectory throughput.

Measures trajectories/sec on one chip with the fully-jitted vmapped engine
(:mod:`quantum_computations_tpu.gkp.compiled`) on a fixed 2-qubit MB-Clifford
circuit, and compares against the reference-architecture baseline: the eager
host-orchestrated simulator (dynamic bond ranks, one trajectory at a time —
architecturally equivalent to the reference's NumPy path, which runs one
trajectory per process; reference has no published numbers, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Environment knobs:
  QCT_BENCH_BATCH  (default 8)   trajectories per vmapped call
  QCT_BENCH_REPS   (default 3)   timed calls
  QCT_BENCH_GRID   (default 512) position-grid points
  QCT_BENCH_CHI    (default 8)   max bond dimension
  QCT_BENCH_BASELINE (default "subprocess") "subprocess" | "skip"
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

GRID = int(os.environ.get("QCT_BENCH_GRID", 512))
CHI = int(os.environ.get("QCT_BENCH_CHI", 8))
BATCH = int(os.environ.get("QCT_BENCH_BATCH", 8))
REPS = int(os.environ.get("QCT_BENCH_REPS", 3))
SVD_METHOD = os.environ.get("QCT_BENCH_SVD", "auto")
ENGINE = os.environ.get("QCT_BENCH_ENGINE", "batched-adaptive")  # or "compiled"

# Fixed representative RB circuit (2 qubits, Clifford-only, incl. a two-mode gadget).
_BENCH_GATES = "H0 P0 CZ01 H1 P1 SWAP01"


def _build_prog():
    """Circuit + compiled program; performs NO eager array computation (the
    TPU backend chokes on eager complex ops — everything must stay in-trace)."""
    from quantum_computations_tpu.config import SVDOptions
    from quantum_computations_tpu.dv import gates as dvg
    from quantum_computations_tpu.gkp import MBGKPCircuit, db2eps
    from quantum_computations_tpu.gkp.compiled import CompiledGKP

    gates = []
    for tok in _BENCH_GATES.split():
        name, idx = tok.rstrip("01"), tok[len(tok.rstrip("01")):]
        cls = getattr(dvg, name)
        gates.append(cls(*[int(c) for c in idx]))
    circ = MBGKPCircuit.transpile(gates, 2)
    circ.fill()

    qs = np.linspace(-20, 20, GRID)
    eps = float(db2eps(10.0))
    svd = SVDOptions(max_bond_dim=CHI, rel_err=1e-2, svd_method=SVD_METHOD)
    prog = CompiledGKP(circ, qs, eps, svd)
    return prog, circ, (gates, qs, eps, svd)


def run_tpu() -> float:
    """Trajectories/sec with the compiled vmapped engine on the default device.

    Uses the device-resident entry point (real/int jit boundaries only): the
    axon TPU backend cannot transfer complex buffers host<->device, so initial
    states are built inside the trace and outputs are (frame, rho_re, rho_im).
    """
    import jax
    import jax.numpy as jnp
    from quantum_computations_tpu.dv import State as DVState
    from quantum_computations_tpu.gkp.compiled import logical_coeffs

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    prog, circ, (gates, qs, eps, svd) = _build_prog()
    coeffs = logical_coeffs([DVState.ZERO, DVState.ZERO])  # numpy: traced as a literal

    if ENGINE == "compiled":
        fn = jax.jit(jax.vmap(lambda k: prog.trajectory_with_readout(coeffs, k)))

        def run_once(key_seed):
            keys = jax.random.split(jax.random.PRNGKey(key_seed), BATCH)
            frames, rho_re, rho_im = fn(keys)
            return rho_re
    else:
        # Per-gadget-jit runner with rank-adaptive bond trimming — measured
        # fastest on the tunnel chip (trimmed bonds -> cheaper gadgets).
        from quantum_computations_tpu.gkp.batched import BatchedGKP

        runner = BatchedGKP(qs, eps, svd, adaptive=True)

        def run_once(key_seed):
            tensors, frames = runner.run_circuit(circ, coeffs, BATCH, rng_seed=key_seed)
            rho_re, _ = runner.readout(tensors, frames)
            return rho_re

    def run_and_check(key_seed):
        rho_re = run_once(key_seed)
        # Fetch a REAL scalar per call: forces real execution and surfaces
        # backend errors (block_until_ready alone passes on poisoned buffers).
        traces = np.asarray(jnp.trace(rho_re, axis1=1, axis2=2))
        if not np.all(np.isfinite(traces)) or not np.allclose(traces, 1.0, atol=1e-2):
            raise RuntimeError(f"bench output invalid: traces={traces}")

    run_and_check(0)  # compile + warm + validate

    t0 = time.perf_counter()
    for r in range(REPS):
        run_and_check(r + 1)
    dt = time.perf_counter() - t0
    return REPS * BATCH / dt


def run_baseline_inline(n_traj: int = 2) -> float:
    """Seconds/trajectory of the eager host-orchestrated engine (call inside a
    CPU-pinned subprocess)."""
    import jax
    from quantum_computations_tpu.dv import State as DVState
    from quantum_computations_tpu.gkp import Simulator as GKPSimulator, parse_to_mps

    prog, circ, (gates, qs, eps, svd) = _build_prog()
    init = parse_to_mps([DVState.ZERO, DVState.ZERO], eps, qs)

    sim = GKPSimulator(circ, eps, rng_seed=0, svd_options=svd)
    out = sim.run(init.copy())  # warm the compile caches
    t0 = time.perf_counter()
    for s in range(n_traj):
        sim = GKPSimulator(circ, eps, rng_seed=s + 1, svd_options=svd)
        sim.run(init.copy())
    dt = time.perf_counter() - t0
    return dt / n_traj


def run_baseline_subprocess() -> float | None:
    """CPU eager baseline in a clean subprocess (axon registration disabled)."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import bench, json; print(json.dumps({'sec_per_traj': bench.run_baseline_inline()}))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True,
            timeout=1200, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1]
        return float(json.loads(line)["sec_per_traj"])
    except Exception as exc:  # baseline failure must not kill the bench
        print(f"# baseline failed: {exc!r}", file=sys.stderr)
        return None


def main():
    tpu_traj_per_sec = run_tpu()
    vs_baseline = 1.0
    if os.environ.get("QCT_BENCH_BASELINE", "subprocess") != "skip":
        sec_per_traj = run_baseline_subprocess()
        if sec_per_traj:
            vs_baseline = tpu_traj_per_sec * sec_per_traj
    print(json.dumps({
        "metric": "gkp_rb_trajectories_per_sec",
        "value": round(tpu_traj_per_sec, 4),
        "unit": "traj/s/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
