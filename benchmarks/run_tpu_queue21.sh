#!/bin/bash
# Round-4 queue 21 (v3, folds in queue 22): value-ordered follow-up to
# queue 17 so the VERDICT deliverables land first if the round ends
# mid-queue. Everything is .done-gated — re-runnable after tunnel drops,
# and round 5 resumes whatever is left.
#
#   1. GKP roofline + fused+q2+tracked attribution (VERDICT #2/#5).
#   2. Grover success curves for the weak oracles {2,7} and {3,6} — one
#      step per dB point (one .dat per point, pooled by merge_grover_tpu's
#      gkp_grover_tpu_<oracle>_*.dat glob) so a tunnel drop or round end
#      keeps every finished point (VERDICT #3).
#   3. Engine-lever A/Bs: defaults re-bench with the rank tracker, threaded
#      streams, batch 24/32.
#   4. RB grid completion rows 11.667/12.5 (reference depths 8/30/60),
#      {0,4} sweep extension, uncontended q2-vs-ref pair, sv move timings,
#      scheduler A/B repeat, remaining low-dB depth-12/18 + depth-30/60
#      reference cells.
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "=== queue21 waiting for pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "=== queue21: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
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
    echo "=== queue21 pass $pass starting at $(date -u +%H:%M:%S)"

    # 1. roofline + attribution (VERDICT #2/#5; spans now split fused_pair
    #    by path so the attribution adjudicates the Gram lever's ceiling)
    step gkp-roofline 10800 python $B/gkp_roofline.py
    step profile-rb-fused-q2 10800 python $B/profile_rb.py

    # 2. Gram-factorised fused-pair p1 A/B (v4: the round-4 engine lever —
    #    uncontended defaults baseline first, then the lever; CPU parity
    #    proven in tests/test_fused_gadget.py)
    step bench-r4-tracked 10800 env QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 \
        python bench.py
    step bench-gram 10800 env QCT_FUSED_PAIR_GRAM=1 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py

    # 3. Grover success curves, per-point (VERDICT #3); alternate oracles
    #    so a mid-sweep round end leaves BOTH curves partially filled
    for db in 6.667 8.333 10.0 11.667 13.333; do
        grover_point 2,7 "$db" 20 "92$(printf '%.0f' "${db/./}")"
        grover_point 3,6 "$db" 20 "93$(printf '%.0f' "${db/./}")"
    done

    # 4. remaining engine-lever A/Bs
    step bench-threads2 10800 env QCT_BENCH_THREADS=2 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
    step bench-batch24 5400 env QCT_BENCH_BATCH=24 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
    step bench-batch32 5400 env QCT_BENCH_BATCH=32 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py

    # 4. RB grid completion: rows 11.667 / 12.5 (reference depths 8/30/60)
    rb_cell 11.667 8  110809 100
    rb_cell 12.5   8  120809 100
    rb_cell 11.667 30 110831 80
    rb_cell 12.5   30 120831 80

    # 5. {0,4} sweep extension (per-point)
    grover_point 0,4 11.667 20 9051
    grover_point 0,4 15.0   20 9052

    # 6. uncontended q2-vs-ref headline pair
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

    # 9. scheduler A/B repeat — queue 17 skipped these via pre-touched
    #    markers; clear them so the steps actually run here
    if [ "$pass" = 1 ] && [ ! -f "$LOGS/sv28-plan-r2.log" ]; then
        rm -f "$LOGS/sv28-plan-r2.done" "$LOGS/sv28-noplan-r2.done"
    fi
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

echo "=== queue21 finished at $(date -u +%H:%M:%S)"
