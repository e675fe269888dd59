#!/usr/bin/env python
"""Run the sharded fused-slab program on the REAL chip with a D=1 mesh.

``ShardMapStateVector.run_fused_slab`` (parallel/shardmap_sv.py) traces a
whole fused circuit — collective index swaps, minor-safe layout passes and
minor-slab window matmuls — into ONE shard_map program per mesh. Until now
it was validated only on the 8-device virtual CPU mesh; this proves the
mesh codepath compiles and matches on TPU hardware (a2a collectives elide
at D=1) against ``FastStatevector.run_compiled`` on the identical circuit.

Replaces the reference's dense per-gate operator build
(``simulators/dv_simulator/numpy_quantum.py:243-247``) at mesh scale.

Prints JSON lines:
  {"metric": "meshslab_d1_parity", "qubits": N, "max_abs_diff": ...}
  {"metric": "meshslab_d1_chain", "qubits": N, "total_ms": ..., ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("QCT_SV_QUBITS", 24))
REPS = int(os.environ.get("QCT_SV_REPS", 3))


def _circuit(qop):
    """24-gate chain over 14 distinct qubits (same spread as the slab-engine
    bench) plus two entangling CZs so windows are genuinely multi-qubit."""
    H = np.asarray(qop.H)
    CZ = np.asarray(qop.CZ).reshape(4, 4)
    spread = [(3 + 2 * i) % (N - 1) for i in range(14)]
    spread = list(dict.fromkeys(spread))[:14]
    gates = [(H, (int(q),)) for q in (spread * 2)[:22]]
    gates.insert(7, (CZ, (int(spread[0]), int(spread[1]))))
    gates.append((CZ, (int(spread[2]), int(spread[3]))))
    return gates


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.sharding import Mesh

    from quantum_computations_tpu.dv import qop
    from quantum_computations_tpu.dv.fast_sv import FastStatevector
    from quantum_computations_tpu.parallel.shardmap_sv import ShardMapStateVector

    gates = _circuit(qop)
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "qubits": N,
                      "n_gates": len(gates)}), flush=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))

    # --- parity: one chain application, fresh engines -------------------
    t0 = time.perf_counter()
    ms = ShardMapStateVector(N, mesh=mesh)
    ms.run_fused_slab(gates)
    probs_mesh = np.stack([np.asarray(ms.probabilities(q)) for q in range(N)])
    norm_mesh = float(np.asarray(ms.norm()))
    mesh_first_s = time.perf_counter() - t0

    fs = FastStatevector(N, fusion_mode="slab")
    fs.run_compiled(gates)
    probs_fast = np.stack([np.asarray(fs.probabilities(q)) for q in range(N)])

    diff = float(np.abs(probs_mesh - probs_fast).max())
    print(json.dumps({
        "metric": "meshslab_d1_parity", "qubits": N, "n_gates": len(gates),
        "max_abs_diff_qubit_marginals": round(diff, 9),
        "norm_mesh": round(norm_mesh, 9),
        "first_chain_s": round(mesh_first_s, 1),
        "ok": bool(diff < 1e-4 and abs(norm_mesh - 1.0) < 1e-4),
    }), flush=True)
    assert diff < 1e-4, f"mesh vs fast marginals diverge: {diff}"
    assert abs(norm_mesh - 1.0) < 1e-4, norm_mesh

    # --- timing: steady-state single-dispatch chains ---------------------
    t0 = time.perf_counter()
    for _ in range(3):  # let the lazy layout reach its fixed point
        ms.run_fused_slab(gates)
    _ = float(np.asarray(ms.norm()))
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        ms.run_fused_slab(gates)
    out = float(np.asarray(ms.norm()))
    chain_dt = (time.perf_counter() - t0) / REPS
    assert abs(out - 1.0) < 1e-3, out
    print(json.dumps({
        "metric": "meshslab_d1_chain", "qubits": N, "devices": 1,
        "chain_len": len(gates),
        "total_ms": round(chain_dt * 1e3, 3),
        "value_ms_per_gate": round(chain_dt / len(gates) * 1e3, 4),
        "warm_s": round(warm_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
