#!/bin/bash
# Round-5 queue 33: endgame ordering after the 5.0 dB compile storm.
#
# The consolidated {2,7} sweep led with 5.0 dB — the only point BELOW every
# cached dB, whose rank-signature landscape is entirely fresh (~100+
# remote compiles, >50 min, no batch completed). Restructured:
#   * per-POINT steps (each commits and .done-gates individually);
#   * cheap/cached first ({2,7} 8.333 recovery — its dB is already
#     compiled), then the d30 row completion (RB 42-grid, VERDICT #1,
#     fully warm), then midrange Grover points (between cached dBs —
#     partial cache reuse), then high-dB tails, then the expensive low-dB
#     tails and everything else as time allows.
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
    commit_artifacts "queue33 artifact checkpoint: $name"
}

gpoint() { # gpoint <tag> <db> <traj> <seed>
    local tag=$1 db=$2 traj=$3 seed=$4
    local o=${tag/,/}
    step "g33-$o-p$db" 10800 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged "$tag" --dbs "$db" --trajectories "$traj" --rng-seed "$seed" \
        --data-file "$B/gkp_grover_tpu_${o}_sweep_${db}_r5.dat" --overwrite
}

# ---- 1. cached-dB recovery point (cheap) --------------------------------
gpoint 2,7 8.333 20 928333

# ---- 2. finish the d30 RB row (fully warm programs) ---------------------
step rb-d30-rest-q2 21600 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.0,10.833,11.667,12.5 --depths 30 \
    --num-samples 80 --batch 16 --rng-seed 54030 \
    --data-file "$B/gkp_rb_tpu_d30_rest.dat" --overwrite
step merge-summaries-33a 1800 bash -c \
    "python $B/merge_rb_tpu.py && python $B/merge_grover_tpu.py"

# ---- 3. midrange Grover points (partial cache reuse) --------------------
gpoint 2,7 7.5    20 92075
gpoint 3,6 7.5    20 93075
gpoint 0,4 7.5    20 90475
gpoint 2,7 9.167  20 920916
gpoint 3,6 9.167  20 930916
gpoint 0,4 9.167  20 904916
gpoint 2,7 10.833 20 921083
gpoint 3,6 10.833 20 931083
gpoint 0,4 10.833 20 904108

# ---- 4. RB backfill (shallow, warm) -------------------------------------
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
step merge-summaries-33b 1800 bash -c \
    "python $B/merge_rb_tpu.py && python $B/merge_grover_tpu.py"

# ---- 5. high-dB tails ----------------------------------------------------
gpoint 2,7 14.167 20 921416
gpoint 3,6 14.167 20 931416
gpoint 0,4 14.167 20 904141
gpoint 2,7 15.0   20 92150
gpoint 3,6 15.0   20 93150

# ---- 6. low-dB tails (freshest compiles; 5.0's storm partially cached) --
gpoint 2,7 5.833  20 920583
gpoint 2,7 5.0    20 92050

# ---- 7. extensions + precision A/Bs (as time allows) --------------------
step grover-36-p12.5-ext2 14400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --dbs 12.5 --trajectories 40 --rng-seed 936125 \
    --data-file "$B/gkp_grover_tpu_36_sweep_12.5_ext2.dat" --overwrite
step grover-27-p12.5-ext2 14400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --dbs 12.5 --trajectories 40 --rng-seed 927125 \
    --data-file "$B/gkp_grover_tpu_27_sweep_12.5_ext2.dat" --overwrite
step bench-prec-fast 10800 env QCT_FUSED_TAB_PREC=high QCT_FUSED_P1_PREC=high \
    QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py
step rb-precfast-anchor 14400 env QCT_FUSED_TAB_PREC=high QCT_FUSED_P1_PREC=high \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.0 --depths 8 --num-samples 100 --batch 16 --rng-seed 100810 \
    --data-file "$B/gkp_rb_precfast_anchor.dat" --overwrite
step compare-prec-anchor 600 python $B/compare_prec_anchor.py
step bench-r5-long 14400 env QCT_BENCH_REPS=8 QCT_BENCH_TOY=0 python bench.py
step merge-summaries-33c 1800 bash -c \
    "python $B/merge_rb_tpu.py && python $B/merge_grover_tpu.py"

echo "=== queue33 finished at $(date -u +%H:%M:%S)"
