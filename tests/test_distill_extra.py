"""Physical distillation, search drivers, and rate-surface computation tests."""

import json
import os

import mpmath
import numpy as np
import pytest
from mpmath import mpf

from quantum_computations_tpu.distill import InitStage, ClassicalStage
from quantum_computations_tpu.distill.hardware import DepolarisationChannel
from quantum_computations_tpu.distill.physical import (
    PhysicalDistillationRateExtrapolator, PhysicalDistillationSequence,
)
from quantum_computations_tpu.distill.rates import (
    RateArgs, compute_distillation_data, compute_rate_data,
)
from quantum_computations_tpu.distill.search import SearchSpec, optim_search_job

REF_DATA = (
    "/root/reference/fault-tolerant_interfaces_for_modular_quantum_computing_on_"
    "diverse_qubit_platforms/data"
)


def _physical_seq(n_stages=2):
    local_error = mpf("1e-3")
    seq = PhysicalDistillationSequence(InitStage(mpf("5e-2"), 1, local_error, local_error))
    bases = ("X", "Y")
    for i in range(n_stages):
        seq.add_stage(ClassicalStage((2, 1, 2), bases[i % 2], 1, local_error, local_error))
    return seq


def test_physical_sequence_eval():
    seq = _physical_seq()
    assert seq.min_memory_req > 0
    idle = DepolarisationChannel(mpf("1e-6"))
    p, M, E = seq.eval_non_constrained_sequence(mpf("100.0"), idleing=idle)
    assert float(p) < 5e-2  # distillation reduced the error
    assert float(M) > 0 and 0 < float(E) < 1

    # constrained evaluation caps the input rate to fit memory
    rate, p2, E2 = seq.eval_constrained_sequence(mpf("1e6"), int(float(M)) // 2, idleing=idle)
    assert float(rate) < 1e6
    _, M2, _ = seq.eval_non_constrained_sequence(rate, idleing=idle)
    assert float(M2) <= float(M) // 2 * 1.01


def test_physical_serialisation_roundtrip():
    seq = _physical_seq()
    back = PhysicalDistillationSequence.deserialise(seq.serialise())
    assert back.min_memory_req == seq.min_memory_req
    assert back.K == seq.K
    assert len(back.stages) == len(seq.stages)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data not mounted")
def test_rate_extrapolator_on_reference_table():
    ex = PhysicalDistillationRateExtrapolator(
        os.path.join(REF_DATA, "physical_distillation.dat"), max_mem=50_000
    )
    r = ex.eval(mpf("0.5"), 10_000)
    assert float(r) >= 0
    with pytest.raises(ValueError):
        ex.eval(mpf("0.5"), 10**9)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data not mounted")
def test_compute_distillation_data_from_reference_sequences():
    r_rel = np.array([mpf("0.01"), mpf("0.1"), mpf("1.0")])
    Ms = np.array([3000, 6000, 12000])
    rate = compute_distillation_data(os.path.join(REF_DATA, "sequences_06.dat"), r_rel, Ms)
    assert rate.shape == (3, 3)
    vals = np.vectorize(float)(rate)
    # more memory at fixed rate never hurts
    assert np.all(np.diff(vals, axis=1) >= -1e-18)
    # more input rate at fixed memory never hurts
    assert np.all(np.diff(vals, axis=0) >= -1e-18)
    assert vals.max() > 0


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data not mounted")
def test_compute_rate_data_surfaces():
    r_rel = np.array([mpf("0.05"), mpf("0.5")])
    Ms = np.array([5000, 10000])
    args = RateArgs(
        r_rel=r_rel, Ms=Ms, p_target=mpf("1e-6"), p_physical=mpf("1e-3"),
        p_bell=mpf("1.25e-2"), p_idle=mpf("1e-6"),
        sequence_file=os.path.join(REF_DATA, "sequences_06.dat"),
    )
    out = compute_rate_data(args)
    assert out.Z.shape == (2, 2)
    assert out.ids.shape == (2, 2)
    assert len(out.rs) == 3
    assert set(np.unique(out.ids)) <= {-1, 0, 1, 2}


@pytest.mark.slow
def test_optim_search_job_smoke():
    spec = SearchSpec(mpf("1.25e-2"), mpf("1e-2"), 5)  # easy target: shallow search
    results, seqs = optim_search_job(3000, spec)
    assert len(results) == 2
    # Reference data files serialise mpmath.inf as "+inf" (str(mpf('+inf'))).
    assert {r["input_rate"] for r in results} == {"0", "+inf"}
