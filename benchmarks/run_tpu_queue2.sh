#!/bin/bash
# Round-3 follow-up TPU queue (run AFTER run_tpu_queue.sh completes — one
# chip, jobs must not contend; never edit a queue script while it runs).
#
# 1. q-study at production shape: confirms the CPU finding that q=2 power
#    iterations match the reference's q=7 heuristic at rel_err=1e-2, which
#    would ~halve the streamed-iterate cost that dominates the engine.
# 2. Timed engine comparison q=2 vs default on the headline bench workload.
# 3. The reference's other two committed Grover oracles at 12.5 dB
#    (executor shapes already cached from the {0,4} run).
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

step() { # step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    if [ -f "$LOGS/$name.done" ]; then
        echo "=== $name: already done, skipping"
        return 0
    fi
    echo "=== $name: starting at $(date -u +%H:%M:%S)"
    if timeout "$tmo" "$@" >"$LOGS/$name.log" 2>&1; then
        touch "$LOGS/$name.done"
        echo "=== $name: OK at $(date -u +%H:%M:%S)"
    else
        echo "=== $name: FAILED (rc=$?) — see $LOGS/$name.log"
    fi
}

# ground-truth accuracy study at production GRID (chi capped at 8 so the
# materialised reference SVD stays host-feasible; the chi-starved spectrum
# is the slowest-decaying = hardest case for few power iterations)
step qstudy-tpu 5400 python $B/streamed_q_study.py --grid 1000 --chi 8 \
    --db 5.833 --depth 8 --qs 1,2,4,7
# paired-trajectory test at FULL production parameters: same seed as the
# main sweep's (5.833, depth 8) cell -> identical circuits, so the q=2
# fidelity distribution is directly comparable to the committed q-default
# cell in gkp_rb_tpu_5.833.dat
step rb-q2-paired 7200 env QCT_STREAM_POWER_ITERS=2 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 48 --batch 16 \
    --data-file $B/rb_q2_paired.dat --overwrite
# circuit-diverse resample of the (5.833, depth 8) anchor: the sweep cell
# had only 7 independent circuits (batch 16); batch 8 x 200 samples = 25
# circuits tightens the cluster SE to ~0.014 and adjudicates the z=+1.9
step rb-anchor-diverse 10800 python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 200 --batch 8 --rng-seed 1234 \
    --data-file $B/rb_anchor_diverse.dat --overwrite
# timed: the headline bench workload with q=2 vs the committed default
step bench-q2 5400 env QCT_STREAM_POWER_ITERS=2 QCT_BENCH_REPS=3 python bench.py
step bench-qdefault 5400 env QCT_BENCH_REPS=3 python bench.py
# retry of the (10.0, depth 20) cell — the main-queue run hung on a
# tunnel call mid-cell (process blocked with no CPU for 20+ min) and was
# killed; depths 8/10/15 were checkpointed. Fresh circuits (seed 77) are
# equally valid samples of the cell.
step rb-10-d20 7200 python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.0 --depths 20 --num-samples 100 --batch 16 --rng-seed 77 \
    --data-file $B/gkp_rb_tpu_10.0_d20.dat --overwrite
step grover-27 5400 python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --data-file $B/gkp_grover_tpu_27.dat --overwrite
step grover-36 5400 python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --data-file $B/gkp_grover_tpu_36.dat --overwrite
echo "=== queue2 complete at $(date -u +%H:%M:%S)"
