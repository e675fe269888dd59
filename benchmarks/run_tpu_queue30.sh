#!/bin/bash
# Round-5 queue 30: queue 29 restructured for wall-clock (the tunnel's
# per-process warmup is ~8 min, so per-cell processes waste hours).
#
# Changes vs queue 29:
#   * RB grid completion and Grover curve completion run as CONSOLIDATED
#     multi-cell processes (rb_batched/grover_batched iterate db x depth
#     with a shared executor cache — one warmup per process instead of
#     one per cell).
#   * Grid completion (VERDICT r4 #1/#3 — the top items) runs BEFORE the
#     perf adjudications; fused-profile-prerot moves to the end (its
#     stage-program compiles are slow cold; by then partially cached).
#   * Adds the tab/p1 distribution-precision A/B (QCT_FUSED_TAB_PREC /
#     QCT_FUSED_P1_PREC, ops/fused_gadget.py): same-seed 10 dB d8 anchor
#     cell (seed 100810, the prerot anchor seed) for accuracy, bench.py
#     for speed, scored by benchmarks/compare_prec_anchor.py.
#
# Step names shared with queue 29 keep their .done markers.
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
GITLOCK=/tmp/qct_git.lock
mkdir -p "$LOGS"

commit_artifacts() { # commit_artifacts <message>
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
    commit_artifacts "queue30 artifact checkpoint: $name"
    git status --porcelain -- benchmarks | head -3
}

# ---- 0. REPS=3 defaults bench (headline confirmation; VERDICT #7 lead-in)
step bench-r5-defaults 10800 env QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 \
    python bench.py

# ---- 1. RB grid completion to 42/42 (VERDICT #1) — consolidated ---------
# High-dB prerot was adjudicated in queue 29 (decision: keep; same-seed
# z=-0.01, benchmarks/prerot_highdb_ab.json) so the deep cells run the
# shipped defaults.
step rb-d30-combined 21600 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 9.167,10.0,10.833,11.667,12.5 --depths 30 \
    --num-samples 80 --batch 16 --rng-seed 53030 \
    --data-file "$B/gkp_rb_tpu_d30_sweep.dat" --overwrite
step rb-d60-combined 21600 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.833,11.667,12.5 --depths 60 \
    --num-samples 64 --batch 16 --rng-seed 53060 \
    --data-file "$B/gkp_rb_tpu_d60_sweep.dat" --overwrite
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

# ---- 2. Grover epsilon-curve completion (VERDICT #3) — consolidated -----
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

# ---- 3. low-oracle 12.5 dB extensions (+40 each, VERDICT #3) ------------
step grover-36-p12.5-ext2 14400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --dbs 12.5 --trajectories 40 --rng-seed 936125 \
    --data-file "$B/gkp_grover_tpu_36_sweep_12.5_ext2.dat" --overwrite
step grover-27-p12.5-ext2 14400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --dbs 12.5 --trajectories 40 --rng-seed 927125 \
    --data-file "$B/gkp_grover_tpu_27_sweep_12.5_ext2.dat" --overwrite

step merge-summaries-mid 1800 bash -c \
    "python $B/merge_rb_tpu.py && python $B/merge_grover_tpu.py"

# ---- 4. perf adjudications ----------------------------------------------
# 4a. distribution-precision lever (tab + p1 at bf16x3): speed then the
#     same-seed production anchor, scored against the prerot anchor.
step bench-prec-fast 10800 env QCT_FUSED_TAB_PREC=high QCT_FUSED_P1_PREC=high \
    QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py
step rb-precfast-anchor 14400 env QCT_FUSED_TAB_PREC=high QCT_FUSED_P1_PREC=high \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.0 --depths 8 --num-samples 100 --batch 16 \
    --rng-seed 100810 \
    --data-file "$B/gkp_rb_precfast_anchor.dat" --overwrite
step compare-prec-anchor 600 python $B/compare_prec_anchor.py

# 4b. streamed final-round precision (north-star lever, VERDICT #5)
step streamed-final-prec 10800 python $B/streamed_final_prec.py
step bench-final-prec-high 10800 env QCT_STREAM_FINAL_PREC=high \
    QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py

# 4c. device-eigh re-A/B under the prerot cost mix (queue-27 carryover)
step bench-eigh-device-prerot 10800 env QCT_STREAM_EIGH=device \
    QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py

# ---- 5. per-stage fused profile (compiles partially cached by now) ------
step fused-profile-prerot 10800 env QCT_FUSED_EXACT_PREROT=1 \
    python $B/fused_profile.py

# ---- 6. long-window confirmation bench (VERDICT #7) ---------------------
step bench-r5-long 14400 env QCT_BENCH_REPS=8 QCT_BENCH_TOY=0 \
    python bench.py

# ---- 7. refresh summaries from ALL on-disk sweeps -----------------------
step merge-summaries-final 1800 bash -c \
    "python $B/merge_rb_tpu.py && python $B/merge_grover_tpu.py"

echo "=== queue30 finished at $(date -u +%H:%M:%S)"
