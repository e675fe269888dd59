"""Profiler integration (SURVEY §5: jax.profiler traces behind the existing
per-gate timing interface).

The reference instruments only wall-clock time around each CV gate
(``simulators/cv_simulator/simulator.py:64-77``). Wall-clock on an async
accelerator backend cannot attribute time between host Python, compilation,
kernel launch and device execution — a profiler trace can. Two entry points:

- :func:`maybe_trace` — context manager that starts a ``jax.profiler.trace``
  when a directory is given explicitly or via ``QCT_PROFILE_DIR``. The
  resulting TensorBoard/Perfetto trace attributes device time per op.
- :func:`annotate` — a named ``TraceAnnotation`` scope so host-side phases
  (one per gate / gadget / pipeline stage) show up as spans inside the trace.
  A no-op when no trace is active (the annotation cost is negligible).

Usage::

    QCT_PROFILE_DIR=/tmp/trace python -m quantum_computations_tpu.pipelines.rb ...

or programmatically::

    with maybe_trace("/tmp/trace"):
        sim.run(state)
"""

from __future__ import annotations

import contextlib
import os

import jax

PROFILE_ENV = "QCT_PROFILE_DIR"


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None = None):
    """Start a jax.profiler trace if a directory is configured.

    ``trace_dir`` wins over the ``QCT_PROFILE_DIR`` environment variable;
    with neither set this is a no-op context.
    """
    d = trace_dir or os.environ.get(PROFILE_ENV)
    if not d:
        yield None
        return
    with jax.profiler.trace(d):
        yield d


def annotate(label: str):
    """Named trace span (host scope) for a gate/gadget/stage."""
    return jax.profiler.TraceAnnotation(label)


class WallClock:
    """Host wall-clock attribution for host-driven engines.

    The op-granularity batched engine (:mod:`..gkp.batched`) is a host loop
    that dispatches one jitted program per CV op and SYNCS at measurement /
    rank fetches — so host wall time per span is a faithful attribution of
    where a trajectory's time goes (dispatch+device for async spans, true
    stall time for fetch spans), without needing a device trace through the
    remote tunnel. Enable with ``QCT_TIMING=1`` or ``WallClock.enable()``;
    read ``WallClock.table()``.
    """

    enabled = bool(os.environ.get("QCT_TIMING"))
    _acc: dict[str, list] = {}

    @classmethod
    def enable(cls, on: bool = True):
        cls.enabled = on

    @classmethod
    def reset(cls):
        cls._acc.clear()

    @classmethod
    @contextlib.contextmanager
    def span(cls, label: str):
        if not cls.enabled:
            yield
            return
        import time

        t0 = time.perf_counter()
        try:
            yield
        finally:
            slot = cls._acc.setdefault(label, [0.0, 0])
            slot[0] += time.perf_counter() - t0
            slot[1] += 1

    @classmethod
    def table(cls) -> dict[str, dict]:
        """{label: {seconds, calls, fraction}} sorted by time desc."""
        total = sum(v[0] for v in cls._acc.values()) or 1.0
        rows = sorted(cls._acc.items(), key=lambda kv: -kv[1][0])
        return {k: {"seconds": round(v[0], 3), "calls": v[1],
                    "fraction": round(v[0] / total, 4)} for k, v in rows}


def span(label: str):
    """Combined profiler annotation + wall-clock span."""
    ctx = contextlib.ExitStack()
    ctx.enter_context(annotate(label))
    ctx.enter_context(WallClock.span(label))
    return ctx
