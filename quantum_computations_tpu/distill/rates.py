"""Figure-data computation: rate surfaces and regime maps.

Parity with reference ``fault-tolerant_.../compute_rate_data.py``: sequence
loading/dedup (:13-45), per-(r, M) max over deserialized sequences (:30-66),
transversal / lattice-surgery / distillation rate surfaces with the argmax
regime map (:91-149) and the two-stage physical-distillation composition
(:152-190).
"""

from __future__ import annotations

import json
from bisect import bisect_right
from collections import defaultdict
from dataclasses import dataclass
from typing import Callable

import numpy as np

from .hardware import (
    DepolarisationChannel, find_code_size, lattice_surgery_gate_rate,
    logical_error_rate_bulk_seam, surface_code_size_bulk_seam, transversal_gate_rate,
)
from .physical import PhysicalDistillationRateExtrapolator
from .sequence import LogicalDistillationSequence as DistillationSequence


def load_sequences(path: str) -> dict[int, list[DistillationSequence]]:
    with open(path) as fh:
        data = json.load(fh)
    all_sequences = defaultdict(list)
    for entry in data:
        if entry["sequence"] is None:
            continue
        all_sequences[entry["memory"]].append(
            DistillationSequence.deserialise(entry["sequence"])
        )
    return all_sequences


def compute_distillation_data(path: str, r_rel: np.ndarray, Ms: np.ndarray) -> np.ndarray:
    """Optimal distillation rate per (relative input rate, memory) over all
    sequences found at memory points <= M."""
    all_sequences = load_sequences(path)
    loaded_Ms = sorted(all_sequences.keys())
    seq_lists = [all_sequences[M] for M in loaded_Ms]

    if Ms[-1] > loaded_Ms[-1] + 1000:
        raise ValueError("Insufficient data. Distillation rates will be suboptimal!")

    # de-duplicate sequences across memory points
    seen = set()
    filtered: list[list[DistillationSequence]] = []
    for seqs in seq_lists:
        fresh = [s for s in seqs if s.serialise() not in seen]
        seen |= {s.serialise() for s in fresh}
        filtered.append(fresh)

    rate = np.zeros((len(r_rel), len(Ms)), dtype=object)
    for j, M in enumerate(Ms):
        index = bisect_right(loaded_Ms, M)
        if index == 0:
            continue
        rate_M = np.zeros(len(r_rel), dtype=object)
        for seq in sum(filtered[:index], []):
            E = seq.encoding_rate
            C = seq.input_rate_cap(M)
            rate_M = np.maximum(rate_M, E * np.minimum(r_rel, C))
        rate[:, j] = rate_M
    # NOTE: rates in units of the physical gate rate.
    return rate


@dataclass
class DatasetConfig:
    """Binds the physical parameters to a sequence dataset (reference
    rate_plot.ipynb cell 3)."""

    p_bell: float
    p_target: float
    sequence_file: str
    label: str = ""


@dataclass
class RateArgs:
    r_rel: np.ndarray
    Ms: np.ndarray
    p_target: float
    p_physical: float
    p_bell: float
    p_idle: float
    sequence_file: str


@dataclass
class RateData:
    Z: np.ndarray
    ids: np.ndarray
    rs: list[np.ndarray]
    rate_labels: list[str]
    memory_unit: int
    Ms: np.ndarray
    r_rel: np.ndarray


def compute_rate_data(args: RateArgs, *, do_LS: bool = True, do_T: bool = True,
                      do_D: bool = True) -> RateData:
    """Rate surfaces for transversal gates, lattice surgery and logical
    distillation + the argmax regime map."""
    r_rel, Ms, p_target, p_physical = args.r_rel, args.Ms, args.p_target, args.p_physical
    shape = (len(r_rel), len(Ms))

    idle_channel = DepolarisationChannel(args.p_idle)

    def surface_code_error_rate(L: int, idle_time: Callable):
        p_seam = idle_channel.apply(args.p_bell, idle_time(L), True)
        return logical_error_rate_bulk_seam(L, p_physical, p_seam)

    def surface_code_size_fn(idle_time: Callable):
        L, p = find_code_size(surface_code_error_rate, p_target, args=(idle_time,),
                              stepsize=10, always_return=True)
        return L if p <= p_target else None

    L_T = lambda r_bell: surface_code_size_fn(lambda L: L**2 / r_bell)
    L_LS = lambda r_bell: surface_code_size_fn(lambda L: L / r_bell)
    L_D = surface_code_size_bulk_seam(p_physical, 0, p_target)

    rs_T = np.full(shape, 0.0, dtype=object)
    if do_T:
        L_Ts = [L_T(r) for r in r_rel]
        for i, j in np.ndindex(shape):
            L = L_Ts[i]
            rs_T[i, j] = transversal_gate_rate(L, 1, r_rel[i], Ms[j]) if L else 0

    rs_LS = np.full(shape, 0.0, dtype=object)
    if do_LS:
        L_LSs = [L_LS(r) for r in r_rel]
        for i, j in np.ndindex(shape):
            L = L_LSs[i]
            rs_LS[i, j] = lattice_surgery_gate_rate(L, 1, r_rel[i], Ms[j]) if L else 0

    rs_D = np.full(shape, 0.0, dtype=object)
    if do_D and args.sequence_file:
        rs_D = compute_distillation_data(args.sequence_file, r_rel, Ms)

    rate_labels = ["Transversal", "Lattice surgery", "Distillation"]
    # Rates in physical-gate-rate units; x5 converts to logical gate rate.
    rs = [r * 5 for r in (rs_T, rs_LS, rs_D)]

    Z = np.stack(rs)
    ids = np.argmax(Z, axis=0)
    Z = np.max(Z, axis=0)
    ids[Z == 0] = -1
    return RateData(Z, ids, rs, rate_labels, L_D, Ms, r_rel)


def add_physical_distillation(r_rel: np.ndarray, Ms: np.ndarray,
                              second_stage_data: RateData,
                              pd_table_path: str) -> tuple[np.ndarray, np.ndarray]:
    """Compose a physical-distillation first stage with precomputed
    second-stage rate surfaces, optimising the memory split."""
    Z_2nd, ids_2nd = second_stage_data.Z, second_stage_data.ids
    Ms_2nd, r_rel_2nd = second_stage_data.Ms, second_stage_data.r_rel

    pd_rate = PhysicalDistillationRateExtrapolator(pd_table_path, max_mem=Ms[-1])
    dM = int(np.mean(np.diff(Ms)))
    Ms_ext = list(range(0, Ms[0], dM)) + list(Ms)

    shape = (len(r_rel), len(Ms))
    Z2 = np.zeros(shape, dtype=object)
    ids2 = np.full(shape, -1)
    for i, r in enumerate(r_rel):
        r_stars = [pd_rate.eval(r, M) for M in Ms_ext]
        for j, M_tot in enumerate(Ms):
            r_list, id_list = [], []
            for M, r_star in zip(Ms_ext, r_stars):
                M_star = M_tot - M
                if M_star < 0:
                    break
                x_idx = bisect_right(r_rel_2nd, r_star) - 1
                y_idx = bisect_right(Ms_2nd, M_star) - 1
                if x_idx < 0 or y_idx < 0:
                    continue
                r_list.append(Z_2nd[x_idx, y_idx])
                id_list.append(ids_2nd[x_idx, y_idx])
            if not r_list:
                continue
            index = int(np.argmax(r_list))
            Z2[i, j] = r_list[index]
            ids2[i, j] = id_list[index]
    return Z2, ids2
