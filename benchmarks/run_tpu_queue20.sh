#!/bin/bash
# Round-4 queue 20 (runs after queue19): N>=29 slab-engine moves on-chip.
#
# Round-3 found `run_compiled` at N=30 OOMs: XLA lowers the grouped
# many-axis upper-move transpose as TWO full-plane copies (4G temp + 4G
# copy + 8G state = 20G on the 16G chip). Round 4 decomposes big moves
# into per-run (P,X,Y,Q) middle swaps (dv/fast_sv.py:_move_decomposition,
# auto above a 2 GiB plane) — each lowers as ONE copy pass, peak
# 8G state + 4G out = 12G. This queue validates + times that on-chip:
#   sv30-moves      : N=30 spread chain (move passes REQUIRED), decomp auto
#   sv29-moves      : N=29 same, and (plane 2 GiB = at threshold) decomp on
#   sv28-decomp-ab  : N=28 forced-decomp vs the r2 grouped-transpose runs
#                     (quantifies the single- vs multi-pass cost below the
#                     threshold, justifying "auto" staying off there)
#
# Usage: run_tpu_queue20.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "=== queue20 waiting for pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "=== queue20: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
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

for pass in 1 2; do
    echo "=== queue20 pass $pass starting at $(date -u +%H:%M:%S)"

    step sv30-moves 7200 env QCT_SV_QUBITS=30 QCT_SV_REPS=3 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
    step sv29-moves 7200 env QCT_SV_QUBITS=29 QCT_SV_REPS=3 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
    step sv28-decomp-ab 3600 env QCT_SV_QUBITS=28 QCT_SV_REPS=5 \
        QCT_SV_MOVE_DECOMP=1 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
done

echo "=== queue20 finished at $(date -u +%H:%M:%S)"
