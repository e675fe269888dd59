#!/bin/bash
# Round-4 queue 19 (runs after queue18): clean power-iteration A/B pair.
#
# The round-3 bench-q2 run (05:11-05:22) overlapped the round driver's own
# bench.py invocation (05:16) on the single tunnel chip, so the q2-vs-
# heuristic timing pair was contended. queue17's bench-r4-defaults gives a
# clean q=2 number; this queue adds the clean reference-heuristic
# counterpart (QCT_STREAM_POWER_ITERS=ref) for an uncontended A/B.
#
# Usage: run_tpu_queue19.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "=== queue19 waiting for pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "=== queue19: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
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
    echo "=== queue19 pass $pass starting at $(date -u +%H:%M:%S)"
    step bench-r4-ref 10800 env QCT_STREAM_POWER_ITERS=ref QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
done

echo "=== queue19 finished at $(date -u +%H:%M:%S)"
