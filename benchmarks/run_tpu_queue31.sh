#!/bin/bash
# Round-5 queue 31: deep-cell q adjudication + the queue-30 remainder.
#
# The first depth-30 cell (9.167 dB, q=2 streamed power iterations) landed
# z ~ -2.7 below the reference with the deficit NOT attributable to
# circuit sampling (variance decomposition in merge_rb_tpu.py). The
# reference's own tensor_svd runs RANDOMIZED SVD with q=7 power iterations
# at production shapes (reference mps.py:25-50), vs our adopted q=2 — near
# bond saturation (deep circuits) the weaker sketch loses weight per split
# and the loss compounds. Queue 31:
#
#   1. Same-seed discriminator: re-run that exact cell (seed 53030) at
#      QCT_STREAM_POWER_ITERS=ref; compare circuit-paired
#      (compare_q_discriminator.py -> logs/DEEP_POWER_ITERS decision).
#   2. Depth-60 cells at the adjudicated q (the remaining 42-grid deep
#      cells), then the high-dB d30 redos if the decision flipped.
#   3. Grover curve completion (unchanged from queue 30): Grover circuits
#      are ~10 macronodes deep, inside the q=2-validated shallow zone, and
#      all committed Grover points ran q=2 — new points stay consistent.
#   4. Backfill, extensions, precision A/Bs, merges, long bench.
#
# Step names shared with queue 29/30 keep their .done markers.
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
GITLOCK=/tmp/qct_git.lock
mkdir -p "$LOGS"

commit_artifacts() {
    (
        flock 9
        git add -A -- benchmarks 2>/dev/null || true
        git diff --cached --quiet -- benchmarks 2>/dev/null || \
            git commit -q -m "$1" -- benchmarks || true
    ) 9>"$GITLOCK"
}

wait_tpu() {
    local n=0
    while ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
        n=$((n+1))
        echo "    tunnel down (probe $n failed) at $(date -u +%H:%M:%S); sleeping 300"
        sleep 300
    done
}

step() {
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
    commit_artifacts "queue31 artifact checkpoint: $name"
    git status --porcelain -- benchmarks | head -3
}

# ---- 1. deep-cell q discriminator (same-seed 9.167 d30) -----------------
step rb-930-qref 14400 env QCT_FUSED_SINGLE=0 QCT_STREAM_POWER_ITERS=ref \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 9.167 --depths 30 --num-samples 80 --batch 16 --rng-seed 53030 \
    --data-file "$B/rb_930_qref.dat" --overwrite
step adjudicate-deep-q 600 python $B/compare_q_discriminator.py
QP=$(cat "$LOGS/DEEP_POWER_ITERS" 2>/dev/null || echo 2)
echo "=== deep-cell power-iteration decision: $QP"

# ---- 2. depth-60 cells at the adjudicated q -----------------------------
step rb-d60-q$QP 21600 env QCT_FUSED_SINGLE=0 QCT_STREAM_POWER_ITERS=$QP \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.833,11.667,12.5 --depths 60 \
    --num-samples 80 --batch 16 --rng-seed 53060 \
    --data-file "$B/gkp_rb_tpu_d60_sweep.dat" --overwrite

# ---- 3. Grover epsilon-curve completion (VERDICT #3) --------------------
step grover-27-sweep-r5 21600 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --dbs 5.0,5.833,7.5,8.333,9.167,10.833,14.167,15.0 \
    --trajectories 20 --rng-seed 927500 \
    --data-file "$B/gkp_grover_tpu_27_sweep_r5.dat" --overwrite
step grover-36-sweep-r5 21600 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --dbs 7.5,9.167,10.833,14.167,15.0 \
    --trajectories 20 --rng-seed 936500 \
    --data-file "$B/gkp_grover_tpu_36_sweep_r5.dat" --overwrite
step grover-04-sweep-r5 21600 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 0,4 --dbs 7.5,9.167,10.833,14.167 \
    --trajectories 20 --rng-seed 904500 \
    --data-file "$B/gkp_grover_tpu_04_sweep_r5.dat" --overwrite

# ---- 4. d30 redo at ref q (only if the decision flipped) ----------------
if [ "$QP" = "ref" ]; then
    step rb-d30-redo-qref 21600 env QCT_FUSED_SINGLE=0 QCT_STREAM_POWER_ITERS=ref \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs 10.0,10.833,11.667,12.5 --depths 30 \
        --num-samples 64 --batch 16 --rng-seed 54030 \
        --data-file "$B/gkp_rb_tpu_d30_sweep_qref.dat" --overwrite
    # move the q=2 d30 sweep out of the pooled-dataset glob: it stays
    # committed as the A/B study artifact, not production data
    if [ -f "$B/gkp_rb_tpu_d30_sweep.dat" ] && [ -f "$LOGS/rb-d30-redo-qref.done" ]; then
        git mv -f "$B/gkp_rb_tpu_d30_sweep.dat" "$B/rb_d30_sweep_q2_study.dat" 2>/dev/null || \
            mv -f "$B/gkp_rb_tpu_d30_sweep.dat" "$B/rb_d30_sweep_q2_study.dat"
        git mv -f "$B/gkp_rb_tpu_d30_sweep.dat.meta.json" "$B/rb_d30_sweep_q2_study.dat.meta.json" 2>/dev/null || \
            mv -f "$B/gkp_rb_tpu_d30_sweep.dat.meta.json" "$B/rb_d30_sweep_q2_study.dat.meta.json" || true
        commit_artifacts "queue31: retire q=2 d30 sweep to study artifact (superseded by qref redo)"
    fi
else
    # decision = keep q2: finish the d30 row cells the queue-30 tunnel
    # failure cut off (only 9.167 completed there)
    step rb-d30-rest-q2 21600 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs 10.0,10.833,11.667,12.5 --depths 30 \
        --num-samples 80 --batch 16 --rng-seed 54030 \
        --data-file "$B/gkp_rb_tpu_d30_rest.dat" --overwrite
fi

step merge-summaries-mid31 1800 bash -c \
    "python $B/merge_rb_tpu.py && python $B/merge_grover_tpu.py"

# ---- 5. backfill + extensions -------------------------------------------
step rb-backfill-combined 21600 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 12,18 \
    --num-samples 80 --batch 16 --rng-seed 51218 \
    --data-file "$B/gkp_rb_tpu_5.833_d1218.dat" --overwrite
step rb-backfill-d12 21600 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 6.667,7.5 --depths 12 \
    --num-samples 80 --batch 16 --rng-seed 56712 \
    --data-file "$B/gkp_rb_tpu_d12_sweep.dat" --overwrite
step grover-36-p12.5-ext2 14400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --dbs 12.5 --trajectories 40 --rng-seed 936125 \
    --data-file "$B/gkp_grover_tpu_36_sweep_12.5_ext2.dat" --overwrite
step grover-27-p12.5-ext2 14400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --dbs 12.5 --trajectories 40 --rng-seed 927125 \
    --data-file "$B/gkp_grover_tpu_27_sweep_12.5_ext2.dat" --overwrite

# ---- 6. precision A/Bs + confirmation benches ---------------------------
step bench-prec-fast 10800 env QCT_FUSED_TAB_PREC=high QCT_FUSED_P1_PREC=high \
    QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py
step rb-precfast-anchor 14400 env QCT_FUSED_TAB_PREC=high QCT_FUSED_P1_PREC=high \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.0 --depths 8 --num-samples 100 --batch 16 \
    --rng-seed 100810 \
    --data-file "$B/gkp_rb_precfast_anchor.dat" --overwrite
step compare-prec-anchor 600 python $B/compare_prec_anchor.py
step bench-r5-long 14400 env QCT_BENCH_REPS=8 QCT_BENCH_TOY=0 \
    python bench.py
step streamed-final-prec 10800 python $B/streamed_final_prec.py
step bench-final-prec-high 10800 env QCT_STREAM_FINAL_PREC=high \
    QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py
step bench-eigh-device-prerot 10800 env QCT_STREAM_EIGH=device \
    QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py
step fused-profile-prerot 10800 env QCT_FUSED_EXACT_PREROT=1 \
    python $B/fused_profile.py

# ---- 7. final summaries -------------------------------------------------
step merge-summaries-final31 1800 bash -c \
    "python $B/merge_rb_tpu.py && python $B/merge_grover_tpu.py"

echo "=== queue31 finished at $(date -u +%H:%M:%S)"
