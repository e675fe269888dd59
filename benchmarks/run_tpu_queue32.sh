#!/bin/bash
# Round-5 queue 32: root-cause the depth-30 deficit (one A/B step).
#
# The same-seed q discriminator (q_discriminator_ab.json) exonerated the
# power-iteration count: q=ref reproduces q=2 per circuit to ~0.002, both
# z ~ -3.2 below the reference on the same 5 circuits. Remaining suspects:
# the FUSED-PAIR measurement path at depth, the streamed-split machinery /
# f32 itself, or an unlucky 5-circuit draw. This runs the SAME-SEED cell
# through the round-3 split engine (QCT_FUSED_PAIR=0: every macronode pair
# measure goes through streamed SVD splits + homodyne ops — the closest
# in-framework analogue of the reference's pure-SVD execution):
#   - deficit vanishes  -> fused-pair depth systematic confirmed;
#   - deficit persists  -> split machinery / f32 / circuits (the concurrent
#     CPU x64 exact-SVD replay of the same circuits separates those).
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
GITLOCK=/tmp/qct_git.lock

commit_artifacts() {
    (
        flock 9
        git add -A -- benchmarks 2>/dev/null || true
        git diff --cached --quiet -- benchmarks 2>/dev/null || \
            git commit -q -m "$1" -- benchmarks || true
    ) 9>"$GITLOCK"
}

step() {
    local name=$1 tmo=$2; shift 2
    if [ -f "$LOGS/$name.done" ]; then
        echo "=== $name: already done, skipping"
        return 0
    fi
    echo "=== $name: starting at $(date -u +%H:%M:%S)"
    if timeout "$tmo" "$@" >"$LOGS/$name.log" 2>&1; then
        touch "$LOGS/$name.done"
        echo "=== $name: OK at $(date -u +%H:%M:%S)"
    else
        echo "=== $name: FAILED (rc=$?) — see $LOGS/$name.log"
    fi
    commit_artifacts "queue32 artifact checkpoint: $name"
}

step rb-930-splitengine 14400 env QCT_FUSED_SINGLE=0 QCT_FUSED_PAIR=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 9.167 --depths 30 --num-samples 80 --batch 16 --rng-seed 53030 \
    --data-file "$B/rb_930_splitengine.dat" --overwrite

echo "=== queue32 finished at $(date -u +%H:%M:%S)"
