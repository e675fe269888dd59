"""Small-surface unit tests: rng plumbing, config cascade, transpiler text,
measurement formatting, pipeline CLI binding."""

import numpy as np
import jax
import pytest

from quantum_computations_tpu.config import SVDOptions
from quantum_computations_tpu.dv import gates as dvg
from quantum_computations_tpu.gkp import (
    MBGKPCircuit, cv2dv_information, decomp_result, format_result,
)
from quantum_computations_tpu.gkp.transpiler import gate_transpile
from quantum_computations_tpu.gkp.gates import MBP, MBT
from quantum_computations_tpu.pipelines.common import config_cli
from quantum_computations_tpu.pipelines.grover import GroverConfig
from quantum_computations_tpu.utils import as_key, is_key


def test_rng_helpers():
    k = as_key(7)
    assert is_key(k)
    assert is_key(as_key(k))  # idempotent
    assert not is_key(7)
    assert not is_key(np.zeros(2))
    k2 = as_key(None)
    assert is_key(k2)


def test_svd_options_cascade():
    base = SVDOptions(max_bond_dim=100, rel_err=1e-2)
    override = SVDOptions(max_bond_dim=10)
    merged = base.merged_into(override)
    assert merged.max_bond_dim == 10
    assert merged.rel_err == 1e-2  # non-overridden field falls back
    assert base.merged_into(None) == base


def test_gate_transpile_dagger_folding():
    assert isinstance(gate_transpile(dvg.P(0)), MBP)
    g = gate_transpile(dvg.Pdg(0))
    assert isinstance(g, MBP) and g.dagger
    g = gate_transpile(dvg.Tdg(0))
    assert isinstance(g, MBT) and g.dagger
    # double dagger cancels
    g = gate_transpile(dvg.Tdg(0), dagger=True)
    assert isinstance(g, MBT) and not g.dagger
    with pytest.raises(ValueError):
        gate_transpile(dvg.CX(0, 1))  # CX not implementable


def test_transpiler_layering_and_to_string():
    circ = MBGKPCircuit.transpile([dvg.H(0), dvg.H(1), dvg.CZ(0, 1), dvg.X(0)], 2)
    # H0 and H1 share a layer; CZ needs a new one; Pauli X folds into a frame
    assert circ.depth() == 2
    assert circ.count() == 3
    s = circ.to_string()
    assert "H_0" in s and "CZ_0,1" in s and "[1, 0]" in s
    circ.fill()
    assert all(layer.get_gate(i) for layer in circ._layers for i in range(2))


def test_transpiler_t_adds_classical_control():
    circ = MBGKPCircuit.transpile([dvg.T(0)], 1)
    from quantum_computations_tpu.dv.simulator import ClassicalControl
    gates = [g for layer in circ._layers for g in layer.gates]
    assert any(isinstance(g, ClassicalControl) for g in gates)


def test_measurement_formatting():
    n, r = decomp_result(2.5 * np.sqrt(np.pi))
    assert n == 2 and abs(r - 0.5) < 1e-12
    assert "√π" in format_result(1.0)
    assert cv2dv_information(np.sqrt(np.pi)) is True
    assert cv2dv_information(0.01) is False


def test_config_cli_binding():
    cfg = config_cli(GroverConfig, ["--tagged", "3,6", "--repeats", "2", "--grid-points", "300"])
    assert cfg.tagged == "3,6"
    assert cfg.repeats == 2
    assert cfg.grid_points == 300
    assert cfg.rel_err == 1e-2  # default survives


def test_transpiler_rejects_bad_gates():
    circ = MBGKPCircuit(3)
    with pytest.raises(ValueError):
        circ.add_gate(dvg.H(5))  # out of range
    with pytest.raises(ValueError):
        circ.add_gate(dvg.CZ(0, 2))  # non-neighbour
