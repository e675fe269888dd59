#!/bin/bash
# Round-4 queue 22: adjudicate the round-4 engine levers on-chip.
#   - bench-r4-tracked: defaults bench with host-tracked bond ranks (the
#     rank tracker landed after bench-r4-defaults ran) — the tracker A/B.
#   - bench-threads2: two half-batch trajectory streams in Python threads
#     (one stream's Gram-fetch stall overlaps the other's dispatches).
#   - profile-rb-tracked: attribution with the tracker on (rank_fetch spans
#     should vanish; what remains is the next target).
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "=== queue22 waiting for pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "=== queue22: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
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
    echo "=== queue22 pass $pass starting at $(date -u +%H:%M:%S)"
    step bench-r4-tracked 10800 env QCT_BENCH_REPS=3 QCT_BENCH_TOY=0 \
        python bench.py
    step bench-threads2 10800 env QCT_BENCH_THREADS=2 QCT_BENCH_REPS=3 \
        QCT_BENCH_TOY=0 python bench.py
done

echo "=== queue22 finished at $(date -u +%H:%M:%S)"
