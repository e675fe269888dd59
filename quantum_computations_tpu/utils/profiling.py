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
