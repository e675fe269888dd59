"""Grover at PRODUCTION parameters on the accelerator.

Drives the CZ-only Grover circuit (reference ``impact_.../grover.py:37-53``)
through the rank-adaptive op-granularity :class:`..gkp.batched.BatchedGKP`
engine — chi=100 / grid-1000 on one chip, with oversize two-mode
contractions streamed host-side. Output schema matches ``gkp_grover_*.dat``
({epsilon, rho_real, rho_imag}), so the reference's ``plot_data.ipynb``
success metric applies unchanged; :func:`summarize` reports mean success per
epsilon like :mod:`.analysis`.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from timeit import default_timer as timer

import numpy as np

from ..gkp import MBGKPCircuit, db2eps
from ..gkp.batched import BatchedGKP
from ..gkp.compiled import logical_coeffs
from .common import config_cli, prepare_output, setup_compile_cache, write_data
from .grover import grover, success_probability

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class GroverBatchedConfig:
    """Production-parameter GKP Grover on the accelerator."""

    tagged: str = "0,4"        # reference production oracle (grover.py:107-111)
    dbs: str = "12.5"
    trajectories: int = 20     # per dB value
    batch: int = 10            # trajectories per device launch
    grid_points: int = 1000
    grid_span: float = 20.0
    max_bond_dim: int = 100
    rel_err: float = 1e-2
    rng_seed: int = 42
    data_file: str = "gkp_grover_batched.dat"
    overwrite: bool = False


def main(config: GroverBatchedConfig | None = None):
    config = config or GroverBatchedConfig()
    setup_compile_cache()
    tagged = [int(x) for x in str(config.tagged).split(",")]
    circuit, init = grover(tagged)
    gkp_circuit = MBGKPCircuit.transpile(circuit)
    gkp_circuit.fill()
    coeffs = logical_coeffs(init)

    if config.data_file:
        prepare_output(config.data_file, config.overwrite)
    qs = np.linspace(-config.grid_span, config.grid_span, config.grid_points)
    svd = {"rel_err": config.rel_err, "max_bond_dim": config.max_bond_dim}

    data: list[dict] = []
    meta: list[dict] = []
    shared_cache: dict = {}  # epsilon is traced, so executors are dB-agnostic
    # QCT_GROVER_THREADS > 1: one engine stream per thread (rb_batched.py
    # pattern) — a stream stalled on a Gram fetch / host eigh no longer
    # idles the chip. Row provenance (batch seed, lane) is unchanged;
    # dataset ORDER is not bit-reproducible across interleavings.
    n_threads = max(1, int(os.environ.get("QCT_GROVER_THREADS", "1")))
    for i, db in enumerate([float(x) for x in str(config.dbs).split(",")]):
        eps = float(db2eps(db))
        runners = [BatchedGKP(qs, eps, svd, adaptive=True, granularity="op")
                   for _ in range(n_threads)]
        for r in runners:
            r._cache = shared_cache
        runner = runners[0]
        st = {"kept": 0, "attempted": 0, "dropped": 0}
        max_attempts = 3 * config.trajectories + 3 * config.batch
        t_db = timer()

        import threading

        lock = threading.Lock()
        errors: list[Exception] = []

        def work(r: BatchedGKP, i=i, db=db, eps=eps, st=st, lock=lock,
                 errors=errors):
            while True:
                with lock:
                    if st["kept"] >= config.trajectories or errors:
                        return
                    if st["attempted"] >= max_attempts:
                        errors.append(RuntimeError(
                            f"db={db}: {st['dropped']}/{st['attempted']} "
                            "trajectories non-finite — aborting instead of "
                            "resampling forever"))
                        return
                    n = (config.batch if n_threads > 1
                         else min(config.batch,
                                  config.trajectories - st["kept"]))
                    batch_seed = config.rng_seed + 1000 * i + st["attempted"]
                    st["attempted"] += n
                t0 = timer()
                try:
                    tensors, frames = r.run_circuit(
                        gkp_circuit, coeffs, n, rng_seed=batch_seed)
                    rho_re, rho_im = (np.asarray(x)
                                      for x in r.readout(tensors, frames))
                except Exception as exc:
                    with lock:
                        errors.append(exc)
                    return
                batch_secs = timer() - t0
                scored = []
                dropped = 0
                for t in range(n):
                    rho = rho_re[t] + 1j * rho_im[t]
                    if (not np.isfinite(np.trace(rho).real)
                            or np.trace(rho).real <= 0):
                        dropped += 1
                        logger.warning("dropping non-finite trajectory")
                        continue
                    scored.append({
                        "epsilon": eps,
                        "rho_real": rho.real.tolist(),
                        "rho_imag": rho.imag.tolist(),
                        # reference rows carry simulation_time + rng_state
                        # (grover.py:132-137); trajectories here share a
                        # batched device launch, so the per-row time is the
                        # batch wall time amortised over its trajectories,
                        # and the PRNG provenance is (batch seed, lane) under
                        # our explicit jax.random key discipline (PARITY.md).
                        "simulation_time": round(batch_secs / n, 3),
                        "rng_seed": int(batch_seed), "rng_lane": int(t),
                    })
                with lock:
                    st["kept"] += len(scored)
                    st["dropped"] += dropped
                    data.extend(scored)
                    logger.info("db=%.2f: %d/%d trajectories (%.0fs/batch)",
                                db, st["kept"], config.trajectories,
                                batch_secs)
                    if config.data_file:
                        write_data(config.data_file, data)

        if n_threads > 1:
            threads = [threading.Thread(target=work, args=(r,))
                       for r in runners]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        else:
            work(runner)
        if errors:
            raise errors[0]
        kept, attempted, dropped = st["kept"], st["attempted"], st["dropped"]
        dt = timer() - t_db
        meta.append({
            "db": float(db), "epsilon": eps, "samples": kept,
            "attempted": attempted, "dropped": dropped,
            "drop_rate": dropped / max(1, attempted),
            "seconds": round(dt, 1),
            "sec_per_traj": round(dt / max(1, attempted), 2),
            # engine-config provenance (fused gadgets / streamed knobs)
            "engine": {
                "fused_single": runner.fused_single,
                "fused_pair": runner.fused_pair,
                "stream_eigh": os.environ.get("QCT_STREAM_EIGH", "host"),
                "power_iters": os.environ.get("QCT_STREAM_POWER_ITERS", "2"),
                "rank_track": runner._tracking_active,
                "pair_gram": os.environ.get("QCT_FUSED_PAIR_GRAM", "1"),
                "exact_prerot": os.environ.get("QCT_FUSED_EXACT_PREROT", "1"),
                "p1_prec": os.environ.get("QCT_FUSED_P1_PREC", "highest"),
                "tab_prec": os.environ.get("QCT_FUSED_TAB_PREC", "highest"),
                "threads": n_threads,
            },
        })
        if config.data_file:
            write_data(config.data_file + ".meta.json", meta)
    return data


def summarize(data, tagged):
    """Mean Grover success per epsilon (reference plot_data.ipynb cell 11)."""
    from collections import defaultdict
    by = defaultdict(list)
    for entry in data:
        rho = np.asarray(entry["rho_real"]) + 1j * np.asarray(entry["rho_imag"])
        by[entry["epsilon"]].append(success_probability(rho, tagged))
    return {eps: (float(np.mean(v)), float(np.std(v) / np.sqrt(len(v))))
            for eps, v in sorted(by.items())}


if __name__ == "__main__":
    main(config_cli(GroverBatchedConfig))
