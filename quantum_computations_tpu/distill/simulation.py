"""Discrete-time Monte-Carlo simulation of a distillation pipeline.

Parity with reference ``fault-tolerant_.../sequence_simulation.py``: per-stage
process timers + output buffers (:10-44), quota-based greedy scheduling under
a memory budget (:90-125) and rate estimation (:142-185).
"""

from __future__ import annotations

import logging
from bisect import insort

import numpy as np
from numpy.random import Generator, default_rng

from .sequence import LogicalDistillationSequence, Stage

logger = logging.getLogger(__name__)


class ActiveStage:
    def __init__(self, stage: Stage, p_fail, K_in: int):
        self.n = stage.n
        self.k = stage.k
        self.distil_steps = stage.get_physical_depth()
        self.p = p_fail
        self.K_in = K_in
        self.qubit_size = stage.qubit_size
        self.process_timers: list[int] = []
        self.output_buffer = 0

    def init(self, n: int = 1) -> None:
        self.process_timers += [self.distil_steps] * n

    def step(self, rng: Generator) -> None:
        remaining = []
        for t in self.process_timers:
            if t <= 0:
                if rng.random() > self.p:
                    self.output_buffer += 1
            else:
                remaining.append(t - 1)
        self.process_timers = remaining

    def memory_usage(self) -> int:
        idle = self.output_buffer * self.k * self.K_in
        active = len(self.process_timers) * self.n * self.K_in
        return (active + idle) * self.qubit_size

    def active_processes(self) -> int:
        return len(self.process_timers)


class Simulator:
    """Tick-based simulation of a distillation sequence under a memory budget."""

    def __init__(self, space: int, input_rate, dist_seq: LogicalDistillationSequence,
                 rng_seed: int = 42):
        if space < dist_seq.min_memory_req:
            raise ValueError("Insufficient memory for given distillation sequence")

        self.M = space
        self.rng = default_rng(rng_seed)
        # Input rate in units of local_gate_rate.
        self.input_rate = dist_seq.distillation_rate(space, input_rate) / dist_seq.encoding_rate
        self.stages: list[ActiveStage] = []
        self.K = dist_seq.K
        self.Ns = []
        self.dMs = []

        self.output = 0
        self.input_stage = ActiveStage.__new__(ActiveStage)
        self.input_stage.output_buffer = 0

        self.E = 1
        K = 1
        s = 0
        for stage, p_fail in zip(dist_seq.stages, dist_seq.stage_p_fail):
            self.stages.append(ActiveStage(stage, p_fail, K))
            dM = K * stage.n * (stage.qubit_size - s)
            self.dMs.append(dM)
            s = stage.qubit_size
            # per-stage process quota to sustain the steady-state rate
            self.Ns.append(self.input_rate * stage.get_physical_depth() * self.E / stage.n)
            self.E *= (1 - p_fail) * stage.k / stage.n
            K *= stage.k

    def memory_usage(self) -> int:
        return sum(stage.memory_usage() for stage in self.stages)

    def init_processes(self):
        gaps = [N - s.active_processes() for N, s in zip(self.Ns, self.stages)]
        candidates = sorted(
            zip(self.stages, gaps, range(len(gaps))), key=lambda item: item[1]
        )
        available_memory = self.M - self.memory_usage()
        while candidates:
            stage, gap, i = candidates.pop()
            prev = self.stages[i - 1] if i > 0 else self.input_stage
            next_n = self.stages[i + 1].n if i < len(self.stages) - 1 else 1

            if available_memory < self.dMs[i]:
                continue
            if prev.output_buffer < stage.n:
                continue
            if stage.output_buffer >= next_n:
                continue

            prev.output_buffer -= stage.n
            stage.init(1)
            available_memory -= self.dMs[i]
            insort(candidates, (stage, gap - 1, i), key=lambda item: item[1])

    def step(self):
        self.init_processes()
        for stage in self.stages:
            stage.step(self.rng)
        self.input_stage.output_buffer += self.input_rate
        self.output += self.stages[-1].output_buffer
        self.stages[-1].output_buffer = 0

    def run(self, steps: int, collect_data: bool = False, printing: bool = False):
        if not collect_data:
            for _ in range(steps):
                self.step()
            return None

        start = self.output
        ms = []
        for _ in range(steps):
            self.step()
            ms.append(self.memory_usage())
        if max(ms) > self.M:
            raise RuntimeError("Memory budget exceeded during simulation.")
        mem = np.mean(ms)
        outputs = (self.output - start) * self.K
        rate = outputs / steps
        if printing:
            overhead = steps * self.input_rate / outputs if outputs > 0 else np.inf
            print("Input per output qubit (Overhead):", overhead)
            print("Output per time step:", rate)
            print("Mean memory consumption:", mem, "; (max, min) =", (max(ms), min(ms)))
        return {"rate": rate, "avg_memory": mem, "max_memory": max(ms)}

    def estimate_rate(self) -> float:
        logger.warning("Current implementation of `estimate_rate` can get loop-stuck.")
        while self.output < 100:
            self.step()
        elapsed_time = 0
        start = self.output
        outputs = 0
        while self.output < 1100:
            self.step()
            elapsed_time += 1
            outputs = (self.output - start) * self.K
        return outputs / elapsed_time
