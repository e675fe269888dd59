#!/bin/bash
# Round-3 queue 14: post-RB-grid adjudications + Grover dataset depth.
#
# Runs after the final RB cell (6.667 dB, depth 20) finishes. Contents:
#   1. The never-run queue5 A/Bs at production parameters:
#      QCT_STREAM_EIGH=device (zero-roundtrip streamed split) and
#      QCT_STREAM_POWER_ITERS=2 (cheaper randomized-SVD sketch), timed via
#      bench.py and accuracy-pinned via an RB anchor cell.
#   2. Grover dataset strengthening: +40 trajectories per oracle at 12.5 dB
#      (disjoint seeds; pooled by merge_grover_tpu.py) and a 4-point dB
#      sweep on the {0,4} oracle to trace the reference success curve
#      (impact_.../grover.py:82-145 sweeps dB=linspace(5,15,13)[2:]).
# Steps gate on .done markers — re-runnable after tunnel drops.
#
# Usage: run_tpu_queue14.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "=== queue14 waiting for pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "=== queue14: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
fi

wait_tpu() {
    local n=0
    while ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
        n=$((n+1))
        echo "    tunnel down (probe $n failed) at $(date -u +%H:%M:%S); sleeping 300"
        sleep 300
    done
}

step() { # step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    if [ -f "$LOGS/$name.done" ]; then
        echo "=== $name: already done, skipping"
        return 0
    fi
    wait_tpu
    echo "=== $name: starting at $(date -u +%H:%M:%S)"
    if timeout "$tmo" "$@" >"$LOGS/$name.log" 2>&1; then
        touch "$LOGS/$name.done"
        echo "=== $name: OK at $(date -u +%H:%M:%S)"
    else
        echo "=== $name: FAILED (rc=$?) — see $LOGS/$name.log"
    fi
}

for pass in 1 2; do
    echo "=== queue14 pass $pass starting at $(date -u +%H:%M:%S)"

    # --- A/B 1: q=2 power iterations (cheapest first: pure bench timing) ---
    step bench-q2 10800 env QCT_STREAM_POWER_ITERS=2 QCT_BENCH_REPS=3 \
        python bench.py
    # accuracy confirmation at production shapes: one RB anchor cell
    step rb-q2-anchor 7200 env QCT_STREAM_POWER_ITERS=2 QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs 5.833 --depths 8 --num-samples 100 --batch 16 --rng-seed 777 \
        --data-file $B/rb_q2_anchor.dat --overwrite

    # --- A/B 2: device-side eigh in the streamed split ---
    step eigh-device-smoke 7200 env QCT_STREAM_EIGH=device QCT_BENCH_MODE=toy \
        QCT_BENCH_REPS=2 python bench.py
    step bench-eigh-device 10800 env QCT_STREAM_EIGH=device QCT_BENCH_REPS=3 \
        python bench.py
    # everything on: device eigh + q=2
    step bench-all-opts 10800 env QCT_STREAM_EIGH=device \
        QCT_STREAM_POWER_ITERS=2 QCT_BENCH_REPS=3 python bench.py

    # --- Grover: widen the 12.5 dB cells to n=60 per oracle ---
    step grover-04-ext 7200 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged 0,4 --trajectories 40 --rng-seed 9104 \
        --data-file $B/gkp_grover_tpu_04_ext.dat --overwrite
    step grover-36-ext 7200 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged 3,6 --trajectories 40 --rng-seed 9136 \
        --data-file $B/gkp_grover_tpu_36_ext.dat --overwrite
    step grover-27-ext 14400 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged 2,7 --trajectories 40 --rng-seed 9127 \
        --data-file $B/gkp_grover_tpu_27_ext.dat --overwrite

    # --- Grover: 4-point dB sweep on {0,4} to trace the success curve ---
    step grover-04-sweep 21600 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged 0,4 --dbs 6.667,8.333,10.0,13.333 --trajectories 20 \
        --rng-seed 9204 --data-file $B/gkp_grover_tpu_04_sweep.dat --overwrite
done

echo "=== queue14 finished at $(date -u +%H:%M:%S)"
