#!/bin/bash
# Round-5 queue 27: post-prerot follow-through.
#
# The prerot rewrite (queue 26) moved the headline 0.4059 -> 0.6451 traj/s
# and changed the production cost mix (the exact-kernel pair path is gone).
# This queue:
#   1. regenerates the production attribution + per-stage profile under the
#      NEW defaults (what dominates at 1.55 s/traj decides the next lever:
#      the two first-BS streamed splits + their Gram fetches are the prime
#      suspects — see STATUS.md implicit-Bell note);
#   2. re-adjudicates QCT_STREAM_EIGH=device under the new mix (its round-3
#      rejection was measured when streamed splits were 73% of trajectory
#      time interleaved with SVD-path pair measures; the interaction term
#      may have flipped sign now that pairs are SVD-free and cheap);
#   3. recovers the lost {2,7} 8.333 dB Grover point (20/20 completed on
#      chip in round 4 but the uncommitted .dat was destroyed by the
#      round-end worktree restore; same seed reproduces it);
#   4. finishes the Grover success curves and the RB 11.667/12.5 rows
#      (same cells as queue 26 — .done-gated, so whatever queue 26 already
#      landed is skipped).
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
    # Auto-commit step artifacts: the round driver restores the worktree to
    # HEAD at round end (this destroyed a completed dataset in round 4).
    git add -A benchmarks/*.dat benchmarks/*.meta.json benchmarks/*.json \
        benchmarks/logs >/dev/null 2>&1 || true
    git diff --cached --quiet 2>/dev/null || \
        git commit -q -m "queue27 artifact checkpoint: $name" || true
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
    echo "=== queue27 pass $pass starting at $(date -u +%H:%M:%S)"

    # 1. attribution + per-stage profile under the adopted prerot defaults
    step profile-rb-prerot 10800 python $B/profile_rb.py
    step fused-profile-prerot 10800 env QCT_FUSED_EXACT_PREROT=1 \
        python $B/fused_profile.py

    # 2. device-eigh re-A/B under the new mix (uncontended pair)
    step bench-r5-defaults 10800 env QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 \
        python bench.py
    step bench-eigh-device-prerot 10800 env QCT_STREAM_EIGH=device \
        QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 python bench.py

    # 3. recover the lost Grover point (same seed as the round-4 run)
    grover_point 2,7 8.333 20 928333

    # 4. remaining Grover curve points + RB rows (skip whatever queue 26
    #    already landed — .done markers are shared)
    for db in 10.0 11.667 13.333; do
        grover_point 2,7 "$db" 20 "92$(printf '%.0f' "${db/./}")"
        grover_point 3,6 "$db" 20 "93$(printf '%.0f' "${db/./}")"
    done
    grover_point 0,4 11.667 20 9051
    grover_point 0,4 15.0   20 9052

    # 5. pull the low oracles' pooled 12.5 dB z inside +-1 (VERDICT r3
    #    weak #2: {3,6} pooled -1.59, {2,7} -0.85 at n=60 each): +40
    #    disjoint-seed trajectories each at the committed settings
    grover_point 3,6 12.5 40 936125
    grover_point 2,7 12.5 40 927125
    rb_cell 11.667 8  110809 100
    rb_cell 12.5   8  120809 100
    rb_cell 11.667 30 110831 80
    rb_cell 12.5   30 120831 80
    rb_cell 11.667 60 110861 64
    rb_cell 12.5   60 120861 64
done

echo "=== queue27 finished at $(date -u +%H:%M:%S)"
