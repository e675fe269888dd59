"""Adjudicate QCT_FUSED_EXACT_PREROT accuracy against the eager exact-SVD
ground truth.

The exact-kernel pair path (both homodyne angles nonzero) and the prerot
path (rotate both factors by -a1, measure position first, second angle
a2-a1) are BOTH discretisations of the same continuum measurement; they
differ by the commutator of the discretised frFT kernel with the
band-limited line interpolation. The right question is not "do they agree
with each other" but "which is closer to the exact-SVD eager sequence"
(reference semantics: gkp_simulator/gates.py two-homodyne macronode tail).

Prints one JSON line per path with rho1/p1/p2/state errors vs eager.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

from tests.test_fused_gadget import (QS, KEY, _four_mode_chain, _eager_pair,
                                     _dense)
from quantum_computations_tpu.ops.fused_gadget import fused_pair_measure2

CASES = [
    ("cz_second_pair", 1, float(np.arctan(2)), -float(np.arctan(2))),
    ("generic", 1, float(np.pi / 3), float(np.pi / 4)),
]


def errs(tag, fused_out, eager_mps, p1_e, p2_e, rho1_e):
    tensors, m1, m2, diag = fused_out
    rho1_f = np.asarray(diag["rho1"])
    scale = max(rho1_e.max(), 1e-30)
    v_e, v_f = _dense(eager_mps.tensors), _dense(tensors)
    overlap = np.vdot(v_e, v_f)
    cos = abs(overlap) / (np.linalg.norm(v_e) * np.linalg.norm(v_f))
    v_f = v_f * np.exp(-1j * np.angle(overlap))
    return {
        "path": tag,
        "rho1_max_abs_err_rel_to_max": float(
            np.abs(rho1_f / scale - rho1_e / scale).max()),
        "p1_rel_err": float(abs(float(diag["p1"]) - p1_e) / p1_e),
        "p2_rel_err": float(abs(float(diag["p2"]) - p2_e) / p2_e),
        "state_overlap_deficit": float(1.0 - cos),
        "state_max_abs_err_rel_to_max": float(
            np.abs(v_f - v_e).max() / np.abs(v_e).max()),
    }


for name, m, a1, a2 in CASES:
    tensors = _four_mode_chain()
    probe = _eager_pair(tensors, m, a1, a2, 0, 0)
    i_f = int(np.argmax(probe[2][0]))
    probe = _eager_pair(tensors, m, a1, a2, i_f, 0)
    j_f = int(np.argmax(probe[2][1]))
    eager_mps, (p1_e, p2_e), (rho1_e, _) = _eager_pair(
        tensors, m, a1, a2, i_f, j_f)

    for tag, kw in [("exact_kernel", dict(prerot=False)),
                    ("prerot", dict(prerot=True))]:
        out = fused_pair_measure2(list(tensors), m, QS, a1, a2, KEY,
                                  force=(i_f, j_f), diagnostics=True, **kw)
        rec = {"case": name, "a1": a1, "a2": a2, "i_f": i_f, "j_f": j_f}
        rec.update(errs(tag, out, eager_mps, p1_e, p2_e, rho1_e))
        print(json.dumps(rec), flush=True)
