#!/usr/bin/env python
"""Statistical parity run: RB fidelity vs the committed reference anchor.

Reference (BASELINE.md): mean fidelity 0.341 at 5.83 dB, depth 8 (N=2,
1980 samples). This runs the eager engine at the reference's production
parameters (d=1000, chi=100, rel_err 1e-2) for a modest sample count and
writes incremental results.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("QCT_X64", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from quantum_computations_tpu.pipelines.rb import sample_depth

    db = float(os.environ.get("QCT_RB_DB", 5.0 + 10.0 / 12.0))  # 5.833... dB
    depth = int(os.environ.get("QCT_RB_DEPTH", 8))
    n = int(os.environ.get("QCT_RB_SAMPLES", 24))
    seed0 = int(os.environ.get("QCT_RB_SEED0", 1000))
    out_path = os.environ.get("QCT_RB_OUT", "/root/repo/benchmarks/rb_parity_results.json")

    results = {"db": db, "depth": depth, "seed0": seed0, "samples": []}
    for s in range(n):
        t0 = time.time()
        sample = sample_depth(db, depth, 1, seed0 + s)[0]
        sample["seconds"] = time.time() - t0
        results["samples"].append(sample)
        fids = [x["fidelity"] for x in results["samples"]]
        results["mean_fidelity"] = float(np.mean(fids))
        results["sem"] = float(np.std(fids) / max(1, len(fids)) ** 0.5)
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"sample {s}: fid={sample['fidelity']:.4f} purity={sample['purity']:.4f} "
              f"({sample['seconds']:.0f}s) running mean={results['mean_fidelity']:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
