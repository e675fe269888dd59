#!/usr/bin/env python
"""Benchmark: batched GKP randomised-benchmarking trajectory throughput.

Two modes (QCT_BENCH_MODE):

- ``production`` (default): the headline — trajectories/sec at the
  REFERENCE'S PRODUCTION PARAMETERS (chi=100, grid 1000, a depth-8 random
  2-qubit RB circuit, the same workload as ``impact_.../
  randomised_benchmarking.py:78-123``) through the rank-adaptive
  op-granularity engine with streamed two-mode gates. ``vs_baseline``
  compares against the eager host-orchestrated CPU engine measured at the
  SAME parameters (committed measurement in
  ``benchmarks/cpu_production_baseline.json``; re-measure with
  QCT_BENCH_BASELINE=subprocess — ~20+ min of single-core CPU).

- ``toy``: the round-1/2 micro-bench (chi=8, grid 512, fixed 6-gate
  circuit) with an in-run subprocess CPU baseline at the same toy
  parameters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Environment knobs:
  QCT_BENCH_MODE   (default "production") "production" | "toy"
  QCT_BENCH_BATCH  (default 16 prod / 8 toy) trajectories per call
  QCT_BENCH_REPS   (default 2 prod / 3 toy)  timed calls
  QCT_BENCH_GRID / QCT_BENCH_CHI             grid points / max bond dim
  QCT_BENCH_BASELINE "committed" (prod) | "subprocess" | "skip"
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

MODE = os.environ.get("QCT_BENCH_MODE", "production")
_PROD = MODE == "production"
GRID = int(os.environ.get("QCT_BENCH_GRID", 1000 if _PROD else 512))
CHI = int(os.environ.get("QCT_BENCH_CHI", 100 if _PROD else 8))
BATCH = int(os.environ.get("QCT_BENCH_BATCH", 16 if _PROD else 8))
REPS = int(os.environ.get("QCT_BENCH_REPS", 2 if _PROD else 3))
DEPTH = int(os.environ.get("QCT_BENCH_DEPTH", 8))
DB = float(os.environ.get("QCT_BENCH_DB", 10.0))
SVD_METHOD = os.environ.get("QCT_BENCH_SVD", "auto")
ENGINE = os.environ.get("QCT_BENCH_ENGINE", "batched-adaptive")  # or "compiled"
_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "cpu_production_baseline.json")

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


def _production_circ():
    """Fixed-seed depth-8 random 2-qubit RB circuit at production parameters.

    Same generator and shapes as the production sweep
    (pipelines/rb_batched.py), so the persistent compile cache is shared
    with it; seed pinned so every bench run times the identical circuit.
    """
    from quantum_computations_tpu.gkp import db2eps
    from quantum_computations_tpu.pipelines.rb import random_circ

    rng = np.random.default_rng(123)
    dv_circ, gkp_circ = random_circ(2, DEPTH, rng)
    qs = np.linspace(-20, 20, GRID)
    eps = float(db2eps(DB))
    svd = {"rel_err": 1e-2, "max_bond_dim": CHI}
    return gkp_circ, qs, eps, svd


_CONFIG_USED: dict = {}


def run_tpu_production() -> float:
    """Trajectories/sec of the op-granularity rank-adaptive engine on the
    production RB workload. Tries the fused-gadget engine first (env
    defaults); if it fails on this backend (e.g. an unproven remote compile),
    falls back to the split-op engine so the headline metric still lands."""
    import jax
    from quantum_computations_tpu.dv import State as DVState
    from quantum_computations_tpu.gkp.batched import BatchedGKP
    from quantum_computations_tpu.gkp.compiled import logical_coeffs

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    gkp_circ, qs, eps, svd = _production_circ()
    coeffs = logical_coeffs([DVState.ZERO, DVState.ZERO])

    # QCT_BENCH_THREADS=T > 1 runs T half-batch trajectory streams in
    # Python threads (separate engine instances sharing one executor cache):
    # while one stream stalls on a streamed-split Gram fetch or runs its
    # host eigh, another stream's dispatches keep the chip busy. Total
    # trajectories per timed call stays BATCH.
    THREADS = int(os.environ.get("QCT_BENCH_THREADS", "1"))

    def measure(runner, runners=()):
        def run_one(r, seed):
            tensors, frames = r.run_circuit(gkp_circ, coeffs,
                                            BATCH // max(1, len(runners) or 1),
                                            rng_seed=seed)
            rho_re, _ = r.readout(tensors, frames)
            traces = np.asarray(rho_re).trace(axis1=1, axis2=2)
            if not np.all(np.isfinite(traces)) or not np.all(traces > 0):
                raise RuntimeError(f"bench output invalid: traces={traces}")

        def run_and_check(seed):
            if len(runners) <= 1:
                run_one(runner, seed)
                return
            import threading
            errs = []

            def work(i, r):
                try:
                    run_one(r, 1000 * seed + i)
                except Exception as e:  # surfaced after join
                    errs.append(e)

            ts = [threading.Thread(target=work, args=(i, r))
                  for i, r in enumerate(runners)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            if errs:
                raise errs[0]

        run_and_check(0)  # compile / cache-load + warm + validate
        t0 = time.perf_counter()
        for r in range(REPS):
            run_and_check(r + 1)
        return REPS * BATCH / (time.perf_counter() - t0)

    def make_streams(**kw):
        rs = [BatchedGKP(qs, eps, svd, adaptive=True, granularity="op", **kw)
              for _ in range(max(1, THREADS))]
        for e in rs[1:]:
            e._cache = rs[0]._cache  # share the executor cache
        return rs

    # Transient tunnel errors (remote_compile connection drops) abort a
    # fresh-program run; retry the fused engine a few times before falling
    # back so an A/B step never silently measures the wrong engine.
    retries = int(os.environ.get("QCT_BENCH_RETRIES", 3))
    exc = None
    for attempt in range(retries):
        try:
            runners = make_streams()
            runner = runners[0]
            value = measure(runner, runners if THREADS > 1 else ())
            _CONFIG_USED.update(fused_single=runner.fused_single,
                                fused_pair=runner.fused_pair)
            if THREADS > 1:
                _CONFIG_USED.update(bench_threads=THREADS)
            return value
        except Exception as e:
            exc = e
            print(f"# fused-engine bench attempt {attempt + 1}/{retries} "
                  f"failed ({e!r}); retrying in 60s", file=sys.stderr)
            time.sleep(60)
    print(f"# fused-engine bench failed ({exc!r}); "
          "falling back to the split-op engine", file=sys.stderr)
    runners = make_streams(fused_single=False, fused_pair=False)
    runner = runners[0]
    value = measure(runner, runners if THREADS > 1 else ())
    _CONFIG_USED.update(fused_single=False, fused_pair=False,
                        fused_fallback=True)
    return value


def run_baseline_production_inline(n_traj: int = 1) -> float:
    """Seconds/trajectory of the eager host-orchestrated engine on the SAME
    production workload (call inside a CPU-pinned subprocess; ~20+ min)."""
    from quantum_computations_tpu.config import SVDOptions
    from quantum_computations_tpu.dv import State as DVState
    from quantum_computations_tpu.gkp import Simulator as GKPSimulator, parse_to_mps

    gkp_circ, qs, eps, svd = _production_circ()
    svd_opts = SVDOptions(max_bond_dim=CHI, rel_err=1e-2, svd_method=SVD_METHOD)
    init = parse_to_mps([DVState.ZERO, DVState.ZERO], eps, qs)
    sim = GKPSimulator(gkp_circ, eps, rng_seed=0, svd_options=svd_opts)
    sim.run(init.copy())  # warm the compile caches
    t0 = time.perf_counter()
    for s in range(n_traj):
        sim = GKPSimulator(gkp_circ, eps, rng_seed=s + 1, svd_options=svd_opts)
        sim.run(init.copy())
    return (time.perf_counter() - t0) / n_traj


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


def run_baseline_subprocess(production: bool = False) -> float | None:
    """CPU eager baseline in a clean subprocess (axon registration disabled)."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    fn = "run_baseline_production_inline" if production else "run_baseline_inline"
    code = (
        f"import bench, json; print(json.dumps({{'sec_per_traj': bench.{fn}()}}))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True,
            timeout=7200 if production else 1200,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1]
        return float(json.loads(line)["sec_per_traj"])
    except Exception as exc:  # baseline failure must not kill the bench
        print(f"# baseline failed: {exc!r}", file=sys.stderr)
        return None


def _production_baseline_sec_per_traj(mode: str) -> float | None:
    """Committed same-parameter CPU measurement, or a fresh subprocess run."""
    if mode == "subprocess":
        sec = run_baseline_subprocess(production=True)
        if sec:
            json.dump({"sec_per_traj": round(sec, 1), "grid": GRID, "chi": CHI,
                       "depth": DEPTH, "db": DB, "engine": "eager CPU x64",
                       "n_traj": 1}, open(_BASELINE_FILE, "w"), indent=1)
        return sec
    try:
        entry = json.load(open(_BASELINE_FILE))
        if (entry["grid"], entry["chi"], entry["depth"]) == (GRID, CHI, DEPTH):
            return float(entry["sec_per_traj"])
        print(f"# committed baseline is for {entry} — not comparable",
              file=sys.stderr)
    except Exception as exc:
        print(f"# no committed production baseline ({exc!r}); "
              "run QCT_BENCH_BASELINE=subprocess once", file=sys.stderr)
    return None


def _toy_metric() -> dict | None:
    """The round-1/2 toy micro-bench (chi=8, grid 512, fixed 6-gate circuit),
    kept alongside the production headline so the cross-round bench series
    stays comparable after the round-3 metric rename. The CPU baseline for
    the toy shape is re-measured in a subprocess (minutes, not hours)."""
    global GRID, CHI, BATCH, REPS
    saved = GRID, CHI, BATCH, REPS
    saved_mode = os.environ.get("QCT_BENCH_MODE")
    GRID, CHI, BATCH, REPS = 512, 8, 8, 3
    # the baseline subprocess re-imports bench and must see toy defaults
    os.environ["QCT_BENCH_MODE"] = "toy"
    try:
        traj_per_sec = run_tpu()
        sec_per_traj = run_baseline_subprocess()
        return {
            "metric": "gkp_rb_trajectories_per_sec",
            "value": round(traj_per_sec, 4),
            "unit": "traj/s/chip",
            "vs_baseline": (round(traj_per_sec * sec_per_traj, 4)
                            if sec_per_traj else 1.0),
        }
    except Exception as exc:  # the toy companion must not kill the headline
        print(f"# toy companion metric failed: {exc!r}", file=sys.stderr)
        return None
    finally:
        GRID, CHI, BATCH, REPS = saved
        if saved_mode is None:
            os.environ.pop("QCT_BENCH_MODE", None)
        else:
            os.environ["QCT_BENCH_MODE"] = saved_mode


def main():
    baseline_mode = os.environ.get(
        "QCT_BENCH_BASELINE", "committed" if _PROD else "subprocess")
    toy = None
    if _PROD:
        traj_per_sec = run_tpu_production()
        sec_per_traj = (None if baseline_mode == "skip"
                        else _production_baseline_sec_per_traj(baseline_mode))
        metric = "gkp_rb_production_trajectories_per_sec"
        if os.environ.get("QCT_BENCH_TOY", "1") != "0":
            toy = _toy_metric()
            if toy:
                print(json.dumps(toy))  # companion line; headline line is last
    else:
        traj_per_sec = run_tpu()
        sec_per_traj = (None if baseline_mode == "skip"
                        else run_baseline_subprocess())
        metric = "gkp_rb_trajectories_per_sec"
    vs_baseline = round(traj_per_sec * sec_per_traj, 4) if sec_per_traj else 1.0
    line = {
        "metric": metric,
        "value": round(traj_per_sec, 4),
        "unit": "traj/s/chip",
        "vs_baseline": vs_baseline,
        # engine-config provenance for A/B runs (extra keys are informative)
        "config": {
            "fused_single": os.environ.get("QCT_FUSED_SINGLE", "1"),
            "fused_pair": os.environ.get("QCT_FUSED_PAIR", "1"),
            "stream_eigh": os.environ.get("QCT_STREAM_EIGH", "host"),
            "bs_decomp": os.environ.get("QCT_BS_DECOMP", "cz"),
            "power_iters": os.environ.get("QCT_STREAM_POWER_ITERS", "2"),
            "rank_track": os.environ.get("QCT_RANK_TRACK", "1"),
            "pair_gram": os.environ.get("QCT_FUSED_PAIR_GRAM", "1"),
            "exact_prerot": os.environ.get("QCT_FUSED_EXACT_PREROT", "1"),
            "p1_prec": os.environ.get("QCT_FUSED_P1_PREC", "highest"),
            "tab_prec": os.environ.get("QCT_FUSED_TAB_PREC", "highest"),
            "final_prec": os.environ.get("QCT_STREAM_FINAL_PREC", "highest"),
            **_CONFIG_USED,
        },
    }
    if toy:
        line["toy"] = {k: toy[k] for k in ("value", "vs_baseline")}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
