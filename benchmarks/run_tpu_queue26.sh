#!/bin/bash
# Round-4 queue 26: headline-first reorder of queue 25 (the prerot
# accuracy study APPROVED the rewrite, so the speed A/B and the gated
# production parity anchor jump the Grover sweep queue — BENCH_r04 is
# recorded from whatever config is adjudicated when the round closes).
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
    # Auto-commit whatever the step produced: the round driver restores the
    # worktree to HEAD at round end, which already destroyed one completed
    # 20-trajectory dataset (grover-27-p8.333) that was only on disk.
    git add -A benchmarks/*.dat benchmarks/*.meta.json benchmarks/logs \
        >/dev/null 2>&1 || true
    git diff --cached --quiet 2>/dev/null || \
        git commit -q -m "queue26 artifact checkpoint: $name" || true
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
    echo "=== queue26 pass $pass starting at $(date -u +%H:%M:%S)"

    # 1. exact-pair prerot speed A/B (accuracy APPROVED —
    #    benchmarks/prerot_accuracy_results.jsonl)
    step bench-prerot 10800 env QCT_FUSED_EXACT_PREROT=1 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py

    # 2. prerot production parity cell (fused defaults + prerot, 10 dB d8,
    #    same seed family as the fused-default row for comparison)
    step rb-prerot-anchor 14400 env QCT_FUSED_EXACT_PREROT=1 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs 10.0 --depths 8 --num-samples 100 --batch 16 \
        --rng-seed 100810 \
        --data-file "$B/gkp_rb_prerot_anchor.dat" --overwrite

    # 3. remaining Grover success-curve points (VERDICT #3)
    for db in 10.0 11.667 13.333; do
        grover_point 2,7 "$db" 20 "92$(printf '%.0f' "${db/./}")"
        grover_point 3,6 "$db" 20 "93$(printf '%.0f' "${db/./}")"
    done
    grover_point 3,6 8.333 20 938333
    grover_point 0,4 11.667 20 9051
    grover_point 0,4 15.0   20 9052

    # 4. RB grid completion: rows 11.667 / 12.5 depth-8
    rb_cell 11.667 8  110809 100
    rb_cell 12.5   8  120809 100

    # 5. engine-lever A/Bs + deeper new-row cells, time permitting
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

echo "=== queue26 finished at $(date -u +%H:%M:%S)"
