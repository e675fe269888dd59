"""Randomised benchmarking at PRODUCTION parameters on the accelerator.

Drives the rank-adaptive op-granularity :class:`..gkp.batched.BatchedGKP`
engine — the configuration that runs chi=100 / grid-1000 circuits on a
single chip: per-op executors with true-rank trimming between ops, and
oversize two-mode contractions (the SWAP/CZ macronode beam splitters)
streamed through the host-driven CZ-kernel randomized SVD
(:mod:`..ops.streamed`).

Reference parity: same sweep structure and output schema as
``impact_.../randomised_benchmarking.py`` (:52-76, ``gkp_rb.dat`` rows of
{db, depth, fidelity, purity}); the per-sample scoring follows
:mod:`.rb.sample_depth` (fidelity <psi|rho|psi> against the exact DV state,
purity tr(rho^2)) with trajectories batched per random circuit instead of
one process per sample.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from timeit import default_timer as timer

import numpy as np

from ..dv.states import State as DVState
from ..gkp import db2eps
from ..gkp.batched import BatchedGKP
from ..gkp.compiled import logical_coeffs
from .common import config_cli, prepare_output, setup_compile_cache, write_data
from .rb import random_circ

logger = logging.getLogger(__name__)


def _dv_state_np(circ, N: int) -> np.ndarray:
    """Exact DV reference state in pure NumPy.

    The accelerator backend cannot eager-dispatch complex host ops (and the
    2-qubit reference is microscopic anyway), so the reference runs entirely
    on the host — functional twin of dv.qop.apply_unitary (qop.py:311-364).
    """
    psi = np.zeros(2 ** N, dtype=np.complex128)
    psi[0] = 1.0
    for g in circ:
        U = np.asarray(g.matrix, dtype=np.complex128)
        idx = list(g.indices)
        k = len(idx)
        perm = idx + [i for i in range(N) if i not in idx]
        t = np.transpose(psi.reshape([2] * N), perm).reshape(2 ** k, -1)
        t = (U @ t).reshape([2] * N)
        psi = np.transpose(t, np.argsort(perm)).reshape(-1)
    return psi


def sample_depth_batched(runner: BatchedGKP, db: float, depth: int,
                         num_samples: int, batch: int, rng,
                         stats: dict | None = None,
                         runners: list[BatchedGKP] | None = None) -> list[dict]:
    """RB samples for one (db, depth) cell: ceil(num_samples / batch) random
    circuits, `batch` trajectories each, scored against the exact DV state.

    Non-finite trajectories are DROPPED and resampled, and the drop is
    counted in `stats` ({"attempted", "dropped"}) so every dataset reports
    its drop rate — a silent resample would bias the cell mean upward if
    failures correlate with low-fidelity trajectories.

    ``runners`` (QCT_RB_THREADS > 1): run one circuit-batch stream per
    engine instance in Python threads — while one stream stalls on a
    streamed-split Gram fetch or its host eigh, another stream's dispatches
    keep the chip busy. Rows are statistically identical to the serial path
    (every row is a full batch of a freshly drawn circuit) but the
    thread interleaving makes the DATASET composition non-bit-reproducible.
    """
    N = 2
    rng = np.random.default_rng(rng)
    rows: list[dict] = []
    stats = stats if stats is not None else {}
    stats.setdefault("attempted", 0)
    stats.setdefault("dropped", 0)
    max_attempts = 3 * num_samples + 3 * batch
    if runners and len(runners) > 1:
        return _sample_depth_threaded(runners, db, depth, num_samples, batch,
                                      rng, rows, stats, max_attempts, N)
    while len(rows) < num_samples:
        if stats["attempted"] >= max_attempts:
            raise RuntimeError(
                f"cell (db={db}, depth={depth}): {stats['dropped']} of "
                f"{stats['attempted']} trajectories non-finite — aborting "
                "instead of resampling forever")
        # always run FULL batches: a partial final batch would compile a
        # fresh executor set for the odd batch size (measured ~19 min of
        # remote compiles for a batch-of-4 tail); extra samples are kept
        n = batch
        dv_circ, gkp_circ = random_circ(N, depth, rng)
        t_batch = timer()
        tensors, frames = runner.run_circuit(
            gkp_circ, logical_coeffs([DVState.ZERO] * N), n,
            rng_seed=int(rng.integers(2**31)))
        # per-batch heartbeat: a silent cell can otherwise hide a hung
        # remote-compile/tunnel call for its entire multi-batch duration
        logger.info("db=%.3f depth=%d: batch of %d in %.0fs (%d/%d)",
                    db, depth, n, timer() - t_batch, len(rows) + n,
                    num_samples)
        rho_re, rho_im = (np.asarray(x) for x in runner.readout(tensors, frames))
        stats["attempted"] += n
        # RAW rho (reference convention): truncation-discarded weight counts
        # as infidelity — randomised_benchmarking.py:71-77 scores
        # npq.fidelity on the unnormalised Shaw logical density. The `trace`
        # key is an extra diagnostic (not in the reference schema): the raw
        # trace separates code-space leakage from logical error.
        scored, dropped = _score_batch(rho_re, rho_im, _dv_state_np(dv_circ, N),
                                       db, depth)
        rows.extend(scored)
        stats["dropped"] += dropped
    return rows


def _score_batch(rho_re, rho_im, psi, db, depth):
    """Score one batch readout: (rows, dropped)."""
    scored: list[dict] = []
    dropped = 0
    for t in range(rho_re.shape[0]):
        rho = rho_re[t] + 1j * rho_im[t]
        tr = np.trace(rho).real
        if not np.isfinite(tr) or tr <= 0:
            dropped += 1
            logger.warning("dropping non-finite trajectory (trace=%s)", tr)
            continue
        scored.append({
            "db": float(db), "depth": int(depth),
            "fidelity": float(np.real(np.conj(psi) @ rho @ psi)),
            "purity": float(np.trace(rho @ rho).real),
            "trace": float(tr),
        })
    return scored, dropped


def _sample_depth_threaded(runners, db, depth, num_samples, batch, rng, rows,
                           stats, max_attempts, N):
    """Threaded cell sampler: one stream per engine instance (see
    sample_depth_batched)."""
    import threading

    lock = threading.Lock()
    errors: list[Exception] = []

    def work(r: BatchedGKP):
        while True:
            with lock:
                if len(rows) >= num_samples or errors:
                    return
                if stats["attempted"] >= max_attempts:
                    errors.append(RuntimeError(
                        f"cell (db={db}, depth={depth}): {stats['dropped']} "
                        f"of {stats['attempted']} trajectories non-finite — "
                        "aborting instead of resampling forever"))
                    return
                stats["attempted"] += batch  # reserve this stream's batch
                dv_circ, gkp_circ = random_circ(N, depth, rng)
                seed = int(rng.integers(2**31))
            t_batch = timer()
            try:
                tensors, frames = r.run_circuit(
                    gkp_circ, logical_coeffs([DVState.ZERO] * N), batch,
                    rng_seed=seed)
                rho_re, rho_im = (np.asarray(x)
                                  for x in r.readout(tensors, frames))
            except Exception as exc:  # surfaced after join
                with lock:
                    errors.append(exc)
                return
            scored, dropped = _score_batch(rho_re, rho_im,
                                           _dv_state_np(dv_circ, N), db, depth)
            with lock:
                rows.extend(scored)
                stats["dropped"] += dropped
                logger.info("db=%.3f depth=%d: batch of %d in %.0fs (%d/%d)",
                            db, depth, batch, timer() - t_batch,
                            len(rows), num_samples)

    threads = [threading.Thread(target=work, args=(r,)) for r in runners]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return rows


@dataclasses.dataclass
class RBBatchedConfig:
    """Production-parameter GKP RB sweep on the accelerator."""

    dbs: str = "5.833,6.667,7.5"      # reference dbs[1:4] of linspace(5,15,13)
    depths: str = "8,10,15,20"
    num_samples: int = 16             # per (db, depth) cell
    batch: int = 16                   # trajectories per random circuit
    grid_points: int = 1000
    grid_span: float = 20.0
    max_bond_dim: int = 100
    rel_err: float = 1e-2
    rng_seed: int = 0
    data_file: str = "gkp_rb_batched.dat"
    overwrite: bool = False


def main(config: RBBatchedConfig | None = None):
    config = config or RBBatchedConfig()
    setup_compile_cache()
    if config.data_file:
        prepare_output(config.data_file, config.overwrite)
    qs = np.linspace(-config.grid_span, config.grid_span, config.grid_points)
    svd = {"rel_err": config.rel_err, "max_bond_dim": config.max_bond_dim}
    rng = np.random.default_rng(config.rng_seed)

    data: list[dict] = []
    meta: list[dict] = []
    shared_cache: dict = {}  # epsilon is traced, so executors are dB-agnostic
    n_threads = max(1, int(os.environ.get("QCT_RB_THREADS", "1")))
    for db in [float(x) for x in str(config.dbs).split(",")]:
        runners = [BatchedGKP(qs, float(db2eps(db)), svd, adaptive=True,
                              granularity="op") for _ in range(n_threads)]
        for r in runners:
            r._cache = shared_cache
        runner = runners[0]
        for depth in [int(x) for x in str(config.depths).split(",")]:
            t0 = timer()
            stats: dict = {}
            cell = sample_depth_batched(runner, db, depth,
                                        config.num_samples, config.batch, rng,
                                        stats, runners=runners)
            data += cell
            dt = timer() - t0
            fids = [r["fidelity"] for r in cell]
            meta.append({
                "db": float(db), "depth": int(depth),
                "samples": len(cell), "batch": int(config.batch),
                "attempted": stats["attempted"], "dropped": stats["dropped"],
                "drop_rate": stats["dropped"] / max(1, stats["attempted"]),
                "seconds": round(dt, 1),
                "sec_per_traj": round(dt / max(1, stats["attempted"]), 2),
                "mean_fidelity": float(np.mean(fids)),
                "sem_fidelity": float(np.std(fids) / np.sqrt(len(fids))),
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
            logger.info("db=%.3f depth=%d: %d samples in %.1fs (%d dropped)",
                        db, depth, len(cell), dt, stats["dropped"])
            if config.data_file:
                write_data(config.data_file, data)
                write_data(config.data_file + ".meta.json", meta)
    return data


if __name__ == "__main__":
    main(config_cli(RBBatchedConfig))
