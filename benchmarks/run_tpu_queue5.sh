#!/bin/bash
# Round-3 queue 5: follow-on experiments AFTER queue4 (run when queue4's
# driver has exited — both drivers must never run concurrently, the tunnel
# serialises poorly). Same wait_tpu + .done gating.
#
# Adjudicates the two new accelerator paths at production parameters:
#   * fused gadgets (QCT_FUSED_SINGLE/PAIR, default on) — bench + anchor
#     cell already in queue4; here the combined best-config bench.
#   * QCT_STREAM_EIGH=device — the zero-roundtrip streamed split. First a
#     small-shape smoke (one long eigh compile, persisted), then bench A/B.
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

# device-eigh smoke at small shapes (compile + numerical sanity on-chip)
step eigh-device-smoke 7200 env QCT_STREAM_EIGH=device QCT_BENCH_MODE=toy \
    QCT_BENCH_REPS=2 python bench.py
# production bench: device eigh on the unfused engine (isolates the change)
step bench-eigh-device 10800 env QCT_STREAM_EIGH=device QCT_FUSED_SINGLE=0 \
    QCT_FUSED_PAIR=0 QCT_BENCH_REPS=3 python bench.py
# production bench: everything on (fused gadgets + device eigh)
step bench-all-opts 10800 env QCT_STREAM_EIGH=device QCT_BENCH_REPS=3 \
    python bench.py
# fused-engine production anchor with device eigh (the candidate default)
step rb-all-opts-anchor 10800 env QCT_STREAM_EIGH=device \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 100 --batch 16 \
    --data-file $B/rb_all_opts_anchor.dat --overwrite
# refresh the production attribution with the fused engine (stdout in log)
step attribution-fused 7200 python $B/profile_rb.py
step attribution-all-opts 7200 env QCT_STREAM_EIGH=device python $B/profile_rb.py

# score the fused anchors vs the unfused sweep + reference (CPU-only)
step fused-anchor-ab 600 python $B/compare_fused_anchor.py
echo "=== queue5 complete at $(date -u +%H:%M:%S)"
