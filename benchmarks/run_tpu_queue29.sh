#!/bin/bash
# Round-5 queue 29: queue 28 + the streamed final-precision A/B
# (north-star lever, ops/streamed.py QCT_STREAM_FINAL_PREC).
# Same step names as queue 28 — .done markers carry over, so this
# replaces a killed queue 28 without repeating finished work.
#
#   1. Adjudicate the 11.667 dB d8 cell (the only out-of-band RB cell:
#      z=-2.16 naive / -1.63 cluster-robust, run with prerot ON): a
#      same-seed prerot-OFF A/B plus a fresh-seed prerot-ON repeat, then
#      benchmarks/adjudicate_prerot_highdb.py writes the 0/1 decision the
#      rest of the queue reads for high-dB (>= 10.833) cells.
#   2. Queue-27's perf adjudications (post-prerot attribution, device-eigh
#      re-A/B, REPS=3 defaults bench) — these pick the next lever.
#   3. RB grid completion to 42/42 reference cells (VERDICT #1): the deep
#      d30/d60 cells first (highest drift risk), then d12/d18 backfill.
#   4. Grover epsilon-curve completion to the full reference grids
#      (VERDICT #3): 16 missing points + the lost {2,7} 8.333 recovery +
#      the +40-trajectory 12.5 dB extensions for the low oracles.
#   5. A long-window REPS=8 confirmation bench (VERDICT #7).
#
# Artifacts are committed at every step boundary (pathspec-limited, under
# an flock so concurrent queues cannot race the index — ADVICE r4 #3).
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
    commit_artifacts "queue29 artifact checkpoint: $name"
    git status --porcelain -- benchmarks | head -3
}

grover_point() { # grover_point <oracle-tag like 2,7> <db> <traj> <seed> [env...]
    local tag=$1 db=$2 traj=$3 seed=$4; shift 4
    local o=${tag/,/}
    step "grover-$o-p$db" 7200 env QCT_FUSED_SINGLE=0 "$@" \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged "$tag" --dbs "$db" --trajectories "$traj" \
        --rng-seed "$seed" \
        --data-file "$B/gkp_grover_tpu_${o}_sweep_${db}.dat" --overwrite
}

grover_ext() { # grover_ext <oracle-tag> <db> <traj> <seed> — extension file
    local tag=$1 db=$2 traj=$3 seed=$4
    local o=${tag/,/}
    step "grover-$o-p$db-ext2" 14400 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged "$tag" --dbs "$db" --trajectories "$traj" \
        --rng-seed "$seed" \
        --data-file "$B/gkp_grover_tpu_${o}_sweep_${db}_ext2.dat" --overwrite
}

rb_cell() { # rb_cell <db> <depth> <seed> <samples> [env...]
    local db=$1 depth=$2 seed=$3 n=$4; shift 4
    step "rb-$db-d$depth" 14400 env QCT_FUSED_SINGLE=0 "$@" \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs "$db" --depths "$depth" --num-samples "$n" --batch 16 \
        --rng-seed "$seed" \
        --data-file "$B/gkp_rb_tpu_${db}_d${depth}.dat" --overwrite
}

for pass in 1 2; do
    echo "=== queue29 pass $pass starting at $(date -u +%H:%M:%S)"

    # ---- 1. 11.667 d8 adjudication (VERDICT #1 / ADVICE #4) -------------
    step rb-11667-d8-noprerot 14400 env QCT_FUSED_SINGLE=0 \
        QCT_FUSED_EXACT_PREROT=0 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs 11.667 --depths 8 --num-samples 112 --batch 16 \
        --rng-seed 110809 \
        --data-file "$B/gkp_rb_tpu_11.667_d8_noprerot.dat" --overwrite
    step rb-11667-d8-b 14400 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs 11.667 --depths 8 --num-samples 112 --batch 16 \
        --rng-seed 210809 \
        --data-file "$B/gkp_rb_tpu_11.667_d8_b.dat" --overwrite
    step adjudicate-prerot-p$pass 600 \
        python $B/adjudicate_prerot_highdb.py
    PREROT=$(cat "$LOGS/PREROT_HIGHDB" 2>/dev/null || echo 1)
    echo "=== high-dB prerot decision: $PREROT"

    # ---- 2. perf adjudications (queue-27 steps that never executed) -----
    step profile-rb-prerot 10800 python $B/profile_rb.py
    step fused-profile-prerot 10800 env QCT_FUSED_EXACT_PREROT=1 \
        python $B/fused_profile.py
    step bench-r5-defaults 10800 env QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 \
        python bench.py
    step bench-eigh-device-prerot 10800 env QCT_STREAM_EIGH=device \
        QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py

    # ---- 2b. streamed final-precision A/B (north star, VERDICT #5) -----
    step streamed-final-prec 10800 python $B/streamed_final_prec.py
    step bench-final-prec-high 10800 env QCT_STREAM_FINAL_PREC=high \
        QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py

    # ---- 3. RB grid completion: deep cells first (VERDICT #1) -----------
    # High-dB cells honour the adjudicated prerot decision; the 10 dB
    # anchor (z=+0.37) validates prerot at and below 10.833.
    rb_cell 11.667 30 110831 80 QCT_FUSED_EXACT_PREROT=$PREROT
    rb_cell 12.5   30 120831 80 QCT_FUSED_EXACT_PREROT=$PREROT
    rb_cell 10.833 30 10833  80 QCT_FUSED_EXACT_PREROT=$PREROT
    rb_cell 11.667 60 110861 64 QCT_FUSED_EXACT_PREROT=$PREROT
    rb_cell 12.5   60 120861 64 QCT_FUSED_EXACT_PREROT=$PREROT
    rb_cell 10.833 60 10860  64 QCT_FUSED_EXACT_PREROT=$PREROT
    if [ "$PREROT" = "0" ]; then
        # the committed 12.5 d8 prerot cell needs an exact-path replacement
        step rb-12.5-d8-noprerot 14400 env QCT_FUSED_SINGLE=0 \
            QCT_FUSED_EXACT_PREROT=0 \
            python -m quantum_computations_tpu.pipelines.rb_batched \
            --dbs 12.5 --depths 8 --num-samples 112 --batch 16 \
            --rng-seed 120809 \
            --data-file "$B/gkp_rb_tpu_12.5_d8_noprerot.dat" --overwrite
    fi
    rb_cell 9.167  30 91630 80
    rb_cell 10.0   30 10030 80

    # ---- 4. Grover curve completion (VERDICT #3) ------------------------
    grover_point 2,7 8.333 20 928333        # lost-point recovery (r4 seed)
    for db in 7.5 9.167; do
        grover_point 0,4 "$db" 20 "940$(printf '%.0f' "${db/./}")"
        grover_point 2,7 "$db" 20 "920$(printf '%.0f' "${db/./}")"
        grover_point 3,6 "$db" 20 "930$(printf '%.0f' "${db/./}")"
    done
    grover_point 2,7 5.0   20 92050
    grover_point 2,7 5.833 20 920583
    for db in 10.833 14.167 15.0; do
        for tag in 0,4 2,7 3,6; do
            o=${tag/,/}
            [ "$tag" = "0,4" ] && [ "$db" = "15.0" ] && continue
            grover_point "$tag" "$db" 20 "9${o}$(printf '%.0f' "${db/./}")" \
                QCT_FUSED_EXACT_PREROT=$PREROT
        done
    done

    # ---- 5. RB d12/d18 backfill ----------------------------------------
    rb_cell 5.833 12 51208 80
    rb_cell 6.667 12 61208 80
    rb_cell 7.5   12 71208 80
    rb_cell 5.833 18 51808 80

    # ---- 6. low-oracle 12.5 dB extensions (+40 each, VERDICT #3) -------
    grover_ext 3,6 12.5 40 936125
    grover_ext 2,7 12.5 40 927125

    # ---- 7. long-window confirmation bench (VERDICT #7) ----------------
    step bench-r5-long 14400 env QCT_BENCH_REPS=8 QCT_BENCH_TOY=0 \
        python bench.py

    # ---- 8. refresh summaries from ALL on-disk sweeps ------------------
    step merge-summaries-p$pass 1800 bash -c \
        "python $B/merge_rb_tpu.py && python $B/merge_grover_tpu.py"
done

echo "=== queue29 finished at $(date -u +%H:%M:%S)"
