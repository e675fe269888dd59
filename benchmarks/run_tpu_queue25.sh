#!/bin/bash
# Round-4 queue 25: final-stint reprioritisation of queue 24.
#
#   1. Remaining Grover success-curve points (VERDICT #3) — cheap (20
#      traj each) and they complete the >=5-points-per-oracle deliverable
#      for {2,7} and {3,6}.
#   2. bench-prerot: on-chip speed A/B of QCT_FUSED_EXACT_PREROT (the
#      queue-23 fused profile pinned the exact-kernel pair path at ~56
#      s/call vs 0.33 s for the Gram paths; the rewrite routes it onto
#      the Gram-eligible a1==0 path). Accuracy is adjudicated separately
#      vs the eager exact-SVD ground truth (benchmarks/prerot_accuracy.py).
#   3. {0,4} sweep extension points.
#   4. RB rows 11.667 / 12.5 depth-8 (VERDICT #1 grid completion).
#   5. Gated prerot production parity cell (only after accuracy approval
#      — marker benchmarks/logs/prerot-approved).
#   6. Lever benches + deeper RB cells, time permitting.
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

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
    echo "=== queue25 pass $pass starting at $(date -u +%H:%M:%S)"

    # 1. remaining Grover success-curve points (VERDICT #3)
    grover_point 3,6 8.333 20 938333
    for db in 10.0 11.667 13.333; do
        grover_point 2,7 "$db" 20 "92$(printf '%.0f' "${db/./}")"
        grover_point 3,6 "$db" 20 "93$(printf '%.0f' "${db/./}")"
    done

    # 2. exact-pair prerot speed A/B (default config + the rewrite)
    step bench-prerot 10800 env QCT_FUSED_EXACT_PREROT=1 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py

    # 3. {0,4} sweep extension (per-point)
    grover_point 0,4 11.667 20 9051
    grover_point 0,4 15.0   20 9052

    # 4. RB grid completion: rows 11.667 / 12.5 depth-8
    rb_cell 11.667 8  110809 100
    rb_cell 12.5   8  120809 100

    # 5. prerot production parity cell — only after the CPU accuracy study
    #    approves the rewrite (marker written after adjudication)
    if [ -f "$LOGS/prerot-approved" ]; then
        step rb-prerot-anchor 14400 env QCT_FUSED_EXACT_PREROT=1 \
            python -m quantum_computations_tpu.pipelines.rb_batched \
            --dbs 10.0 --depths 8 --num-samples 100 --batch 16 \
            --rng-seed 100810 \
            --data-file "$B/gkp_rb_prerot_anchor.dat" --overwrite
    fi

    # 6. engine-lever A/Bs + deeper new-row cells, time permitting
    step bench-threads2 10800 env QCT_BENCH_THREADS=2 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
    rb_cell 11.667 30 110831 80
    rb_cell 12.5   30 120831 80
    step bench-batch24 5400 env QCT_BENCH_BATCH=24 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
    step bench-batch32 5400 env QCT_BENCH_BATCH=32 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
    rb_cell 11.667 60 110861 64
    rb_cell 12.5   60 120861 64
    rb_cell 5.833  12 51208 100
    rb_cell 6.667  12 61208 100
    rb_cell 7.5    12 71208 100
    rb_cell 5.833  18 51808 100
    rb_cell 9.167  30 91630 80
    rb_cell 10.0   30 10030 80
    rb_cell 10.833 30 10833 80
    rb_cell 10.833 60 10860 64
done

echo "=== queue25 finished at $(date -u +%H:%M:%S)"
