#!/bin/bash
# Round-4 queue 24: reprioritised remainder of queue 23 with the
# exact-pair prerot lever A/B at the front (the queue-23 fused profile
# pinned the exact-kernel pair path at ~56 s/call vs 0.33 s for the Gram
# paths at full-rank production shapes; QCT_FUSED_EXACT_PREROT rewrites
# every both-angles-nonzero pair measure into the Gram-eligible a1==0
# path by the BS/rotation commute identity).
#
#   1. bench-prerot (on-chip speed A/B of the rewrite; accuracy is
#      adjudicated separately vs the eager exact-SVD ground truth on the
#      CPU — benchmarks/prerot_accuracy.py).
#   2. Remaining Grover success-curve points (VERDICT #3).
#   3. RB rows 11.667 / 12.5 (VERDICT #1 grid completion).
#   4. Gated prerot production parity cell (only if the accuracy study
#      approved the rewrite — marker benchmarks/logs/prerot-approved).
#   5. Lever benches, depth-60 tails, sv timings, remaining cells.
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "=== queue24 waiting for pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "=== queue24: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
fi
if [ ! -f "$LOGS/grover-27-p8.333.done" ] \
        && grep -q "20/20 trajectories" "$LOGS/grover-27-p8.333.log" 2>/dev/null; then
    touch "$LOGS/grover-27-p8.333.done"
    echo "=== adopted orphaned grover-27-p8.333 as done"
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

grover_point() { # grover_point <oracle-tag like 2,7> <db> <traj> <seed>
    local tag=$1 db=$2 traj=$3 seed=$4
    local o=${tag/,/}
    step "grover-$o-p$db" 7200 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged "$tag" --dbs "$db" --trajectories "$traj" \
        --rng-seed "$seed" \
        --data-file "$B/gkp_grover_tpu_${o}_sweep_${db}.dat" --overwrite
}

rb_cell() { # rb_cell <db> <depth> <seed> <samples>
    local db=$1 depth=$2 seed=$3 n=$4
    step "rb-$db-d$depth" 14400 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs "$db" --depths "$depth" --num-samples "$n" --batch 16 \
        --rng-seed "$seed" \
        --data-file "$B/gkp_rb_tpu_${db}_d${depth}.dat" --overwrite
}

for pass in 1 2; do
    echo "=== queue24 pass $pass starting at $(date -u +%H:%M:%S)"

    # 1. exact-pair prerot speed A/B (default config + the rewrite)
    step bench-prerot 10800 env QCT_FUSED_EXACT_PREROT=1 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py

    # 2. remaining Grover success-curve points (VERDICT #3)
    grover_point 3,6 8.333 20 938333
    for db in 10.0 11.667 13.333; do
        grover_point 2,7 "$db" 20 "92$(printf '%.0f' "${db/./}")"
        grover_point 3,6 "$db" 20 "93$(printf '%.0f' "${db/./}")"
    done

    # 3. RB grid completion: rows 11.667 / 12.5 (reference depths 8/30/60)
    rb_cell 11.667 8  110809 100
    rb_cell 12.5   8  120809 100
    rb_cell 11.667 30 110831 80
    rb_cell 12.5   30 120831 80

    # 4. prerot production parity cell — only after the CPU accuracy study
    #    approves the rewrite (marker written by hand after adjudication)
    if [ -f "$LOGS/prerot-approved" ]; then
        step rb-prerot-anchor 14400 env QCT_FUSED_EXACT_PREROT=1 \
            python -m quantum_computations_tpu.pipelines.rb_batched \
            --dbs 10.0 --depths 8 --num-samples 100 --batch 16 \
            --rng-seed 100810 \
            --data-file "$B/gkp_rb_prerot_anchor.dat" --overwrite
    fi

    # 5. {0,4} sweep extension (per-point)
    grover_point 0,4 11.667 20 9051
    grover_point 0,4 15.0   20 9052

    # 6. engine-lever A/Bs
    step bench-threads2 10800 env QCT_BENCH_THREADS=2 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
    step bench-batch24 5400 env QCT_BENCH_BATCH=24 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
    step bench-batch32 5400 env QCT_BENCH_BATCH=32 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
    step bench-r4-ref 10800 env QCT_STREAM_POWER_ITERS=ref QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py

    # 7. depth-60 tails of the new rows
    rb_cell 11.667 60 110861 64
    rb_cell 12.5   60 120861 64

    # 8. sv move-decomposition timings
    step sv30-moves 7200 env QCT_SV_QUBITS=30 QCT_SV_REPS=3 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
    step sv29-moves 7200 env QCT_SV_QUBITS=29 QCT_SV_REPS=3 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
    step sv28-decomp-ab 3600 env QCT_SV_QUBITS=28 QCT_SV_REPS=5 \
        QCT_SV_MOVE_DECOMP=1 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py

    # 9. scheduler A/B repeat
    step sv28-plan-r2 3600 env QCT_SV_QUBITS=28 QCT_SV_REPS=5 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
    step sv28-noplan-r2 3600 env QCT_SV_QUBITS=28 QCT_SV_REPS=5 QCT_SV_PLAN=0 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py

    # 10. every remaining reference cell through 12.5 dB
    rb_cell 5.833  12 51208 100
    rb_cell 6.667  12 61208 100
    rb_cell 7.5    12 71208 100
    rb_cell 5.833  18 51808 100
    rb_cell 9.167  30 91630 80
    rb_cell 10.0   30 10030 80
    rb_cell 10.833 30 10833 80
    rb_cell 10.833 60 10860 64
done

echo "=== queue24 finished at $(date -u +%H:%M:%S)"
