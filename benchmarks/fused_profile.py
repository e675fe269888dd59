#!/usr/bin/env python
"""Steady-state, per-stage on-chip profile of the fused gadget executors.

The round-4 span attribution (``profile_rb.py``) measures WALL time per op
over two cold batches, so it mixes one-time executable-cache loads into the
per-op numbers (189 s for 16 trajectories profiled vs 3.06 s/traj warm).
This script answers the question the attribution can't: where does the
STEADY-STATE device time of each fused executor path actually go?

For each path it compiles cut-down programs that early-return after a stage
(``_stage`` hooks in ``ops/fused_gadget.py``) and times warm calls:

  fused_single:        tab -> p1 -> collapse -> full
  fused_pair[a1zero]:  p1 -> collapse -> full     (gram on AND off)
  fused_pair[swapped]: p1 -> collapse -> full     (gram on AND off)
  fused_pair[exact]:   p1 -> collapse -> full

Stage deltas attribute the cost; the analytic dominant FLOP term for the
pair p1 loop (8 d^2 a k c real FLOPs per trajectory, the xak,xkc->xac
einsum over the d-point outer grid) turns the measurements into an
achieved-TFLOP/s roofline statement per path (VERDICT r3 #5 "per gadget
class").

Shapes mimic the 2-qubit RB production chain (chi=100, d=1000): the pair
measure sees (chi, d, chi) x (chi, d, chi) operands inside a 4-tensor
chain; the single gadget sees the boundary (1, d, chi) mode of a 2-tensor
chain. Batch is vmapped like gkp/batched.py's executors.

Prints one JSON line per (path, stage) with warm s/call, plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHI = int(os.environ.get("QCT_PROF_CHI", 100))
D = int(os.environ.get("QCT_PROF_GRID", 1000))
BATCH = int(os.environ.get("QCT_PROF_BATCH", 8))
REPS = int(os.environ.get("QCT_PROF_REPS", 3))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from quantum_computations_tpu.ops import fused_gadget as fg

    d, chi = D, CHI
    qs_np = np.linspace(-20.0, 20.0, d).astype(np.float32)
    qs = jnp.asarray(qs_np)

    def rand_c(key, shape, scale):
        k1, k2 = jax.random.split(key)
        re = jax.random.normal(k1, shape)
        im = jax.random.normal(k2, shape)
        return ((re + 1j * im) * scale).astype(jnp.complex64)

    def pair_chain(key):
        """4-tensor chain: (1,d,chi)(chi,d,chi)(chi,d,chi)(chi,d,1)."""
        ks = jax.random.split(key, 4)
        s = 1.0 / np.sqrt(d * chi)
        return (rand_c(ks[0], (1, d, chi), s),
                rand_c(ks[1], (chi, d, chi), s / np.sqrt(chi)),
                rand_c(ks[2], (chi, d, chi), s / np.sqrt(chi)),
                rand_c(ks[3], (chi, d, 1), s))

    def single_chain(key):
        ks = jax.random.split(key, 2)
        s = 1.0 / np.sqrt(d * chi)
        return (rand_c(ks[0], (1, d, chi), s),
                rand_c(ks[1], (chi, d, 1), s))

    def bell_cols(key):
        return rand_c(key, (d, 2), 1.0 / np.sqrt(d))

    results = []

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x, out)
        warm = (time.perf_counter() - t0) / REPS
        rec = {"metric": "fused_stage", "name": name,
               "warm_s_per_call": round(warm, 4),
               "compile_or_load_s": round(compile_s, 1),
               "batch": BATCH, "chi": chi, "d": d}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        return warm

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    # ---- fused_pair paths -------------------------------------------------
    import jax.lax as lax
    pair_cases = [
        ("pair_a1zero", 0.0, np.pi / 4, False, None),
        ("pair_a1zero_gram", 0.0, np.pi / 4, True, None),
        ("pair_a1zero_p1high", 0.0, np.pi / 4, False, lax.Precision.HIGH),
        ("pair_swapped", np.pi / 4, 0.0, False, None),
        ("pair_swapped_gram", np.pi / 4, 0.0, True, None),
        ("pair_exact", np.pi / 3, np.pi / 4, False, None),
        ("pair_exact_p1high", np.pi / 3, np.pi / 4, False,
         lax.Precision.HIGH),
    ]
    for name, a1, a2, gram, prec in pair_cases:
        gram_kw = {"gram": gram, "p1_precision": prec}
        stages = ("p1", "full") if name.endswith("p1high") \
            else ("p1", "collapse", "full")
        for stage in stages:
            def body(tt, key, _a1=a1, _a2=a2, _st=stage, _g=gram_kw):
                st = None if _st == "full" else _st
                out = fg.fused_pair_measure2(list(tt), 1, qs, _a1, _a2, key,
                                             _stage=st, **_g)
                if st == "p1":
                    return jnp.sum(out)
                if st == "collapse":
                    return jnp.sum(jnp.abs(out) ** 2)
                new_t, m1, m2 = out
                return (sum(jnp.sum(jnp.abs(t) ** 2) for t in new_t)
                        + m1 + m2)

            fn = jax.jit(jax.vmap(body, in_axes=(None, 0)))
            chain = jax.jit(pair_chain)(jax.random.PRNGKey(7))
            timed(f"{name}:{stage}", fn, tuple(chain), keys)

    # ---- fused_single ------------------------------------------------------
    for stage in ("tab", "p1", "collapse", "full"):
        for a1, tag in ((0.0, "a1zero"), (np.pi / 4, "a1rot")):
            def sbody(tt, bell, key, _a1=a1, _st=stage):
                st = None if _st == "full" else _st
                out = fg.fused_single_gadget(list(tt), 0, qs, bell, _a1,
                                             np.pi / 3, key, _stage=st)
                if st == "tab":
                    return jnp.sum(out[0]) + jnp.sum(out[1])
                if st == "p1":
                    return jnp.sum(out)
                if st == "collapse":
                    return jnp.sum(jnp.abs(out) ** 2)
                new_t, m1, m2 = out
                return (sum(jnp.sum(jnp.abs(t) ** 2) for t in new_t)
                        + m1 + m2)

            fn = jax.jit(jax.vmap(sbody, in_axes=(None, None, 0)))
            chain = jax.jit(single_chain)(jax.random.PRNGKey(8))
            bell = jax.jit(bell_cols)(jax.random.PRNGKey(9))
            timed(f"single_{tag}:{stage}", fn, tuple(chain), bell, keys)

    # ---- summary: stage deltas + p1-loop roofline --------------------------
    by = {r["name"]: r["warm_s_per_call"] for r in results}
    # dominant analytic term of the non-gram pair p1 loop:
    # per trajectory 8 * d^2 * chi^3 real FLOPs (the per-row einsum).
    p1_flops = 8.0 * d * d * chi ** 3 * BATCH
    summary = {"metric": "fused_profile_summary", "stages_s": by}
    for nm in ("pair_a1zero", "pair_swapped", "pair_exact",
               "pair_a1zero_p1high", "pair_exact_p1high"):
        key = f"{nm}:p1"
        if key in by and by[key] > 0:
            summary[f"{nm}_p1_achieved_TFLOPs"] = round(
                p1_flops / by[key] / 1e12, 2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
