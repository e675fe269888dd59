#!/usr/bin/env python
"""Accuracy-vs-power-iterations study for the streamed pair-SVD.

The streamed two-mode path (ops/streamed.py) runs the reference's
randomized-SVD power-iteration heuristic q = 7 (mps.py:29) at production
sizes; each iteration costs two full streaming sweeps of the implicit
(chi*d x d*chi) matrix, and the production attribution shows the iterate
program IS the engine's dominant cost. Physical two-mode gate spectra decay
fast, so a much smaller q may give identical truncation decisions.

Protocol: evolve a genuine mid-circuit state (depth-4 random RB prefix) to
realistic bond content, then split the SAME two-mode CZ contraction with
q in {1, 2, 4, 7} and score, against a high-accuracy materialised SVD at
the same capacity:

- kept-singular-value relative error (the quantity the truncation rule
  consumes), and
- subspace alignment: ||A - m1@m2||_F / ||A||_F via the materialised A.

Run sizes are CPU-friendly by default (grid 300, chi 30); pass
--grid/--chi for the production shape on the TPU (where the materialised
reference factorisation must fit memory — keep chi*grid <= ~1e5).

Output: one JSON line per q with the two error metrics and the wall time
of the streamed driver call.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--chi", type=int, default=30)
    ap.add_argument("--db", type=float, default=5.833)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--qs", type=str, default="1,2,4,7")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from quantum_computations_tpu.dv import State as DVState
    from quantum_computations_tpu.gkp import db2eps, parse_to_mps, Simulator as GKPSim
    from quantum_computations_tpu.pipelines.rb import random_circ
    from quantum_computations_tpu.ops import streamed
    from quantum_computations_tpu.ops.linalg import tensor_svd

    eps = float(db2eps(args.db))
    qs = np.linspace(-20, 20, args.grid)
    rng = np.random.default_rng(11)
    _, gkp_circ = random_circ(2, args.depth, rng)
    sim = GKPSim(gkp_circ, eps, rng_seed=3,
                 svd_options=dict(rel_err=1e-2, max_bond_dim=args.chi))
    mps, _ = sim.run(parse_to_mps([DVState.ZERO] * 2, eps, qs))
    t1, t2 = np.asarray(mps[0]), np.asarray(mps[1])
    a, d, k = t1.shape
    b = t2.shape[-1]
    print(json.dumps({"shapes": [list(t1.shape), list(t2.shape)]}), flush=True)

    # materialised CZ contraction (ground truth): A[a*d, d*b]
    gain = 1.0
    x = qs.reshape(-1, 1) * qs.reshape(1, -1)
    phase = np.exp(1j * gain * x)
    A = np.einsum("adk,keb->adeb", t1, t2)
    A = (A * phase[None, :, :, None]).reshape(a * d, d * b)
    sref = np.linalg.svd(A, compute_uv=False)[: args.chi]
    nrmA = float(np.linalg.norm(A))

    key = jax.random.PRNGKey(0)
    for q in [int(x) for x in args.qs.split(",")]:
        t0 = time.perf_counter()
        m1, m2, rank = streamed.streamed_pair_svd(
            jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(qs),
            ("cz", gain), max_bond_dim=args.chi, abs_err=0.0, rel_err=1e-2,
            key=key, power_iters=q)
        m1, m2 = np.asarray(m1), np.asarray(m2)
        dt = time.perf_counter() - t0
        rank = int(np.max(rank))
        R = m1.reshape(a * d, -1) @ m2.reshape(-1, d * b)
        recon_err = float(np.linalg.norm(A - R) / nrmA)
        # singular values of the kept factorisation
        s_kept = np.linalg.svd(R, compute_uv=False)[:rank]
        sv_err = float(np.max(np.abs(s_kept - sref[:rank]) / sref[0]))
        print(json.dumps({
            "q": q, "rank": rank, "seconds": round(dt, 3),
            "recon_rel_err": round(recon_err, 6),
            "kept_sv_max_rel_err": round(sv_err, 8),
            # the truncation rule's own scale for context
            "rel_err_setting": 1e-2,
        }), flush=True)


if __name__ == "__main__":
    main()
