#!/bin/bash
# Round-3 queue 16: adopt the in-flight RB cell, A/B the window scheduler,
# then resume queue15 (sv30 engine numbers -> queue14 A/Bs + Grover depth).
#
# The queue15 driver was stopped to insert the scheduler A/B without
# touching a running script; its rb-6.667-d20 step child keeps running.
# This driver: (1) waits for that child, validates its .dat via the meta
# sidecar and marks .done; (2) runs the slab-engine window-scheduler A/B
# at N=28 (planner default-on vs QCT_SV_PLAN=0 — steady state should halve
# layout move passes per chain); (3) exec queue15, which skips .done steps.
#
# Usage: run_tpu_queue16.sh [rb_wait_pid]
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

RB_PID=${1:-}
if [ -n "$RB_PID" ]; then
    echo "=== queue16 waiting for rb pid $RB_PID"
    while kill -0 "$RB_PID" 2>/dev/null; do sleep 30; done
    echo "=== queue16: rb pid $RB_PID exited at $(date -u +%H:%M:%S)"
fi

# adopt the orphaned RB step: meta sidecar is written on successful finish
if [ ! -f "$LOGS/rb-6.667-d20.done" ] \
        && [ -s "$B/gkp_rb_tpu_6.667_d20.dat.meta.json" ]; then
    echo "=== rb-6.667-d20: adopted (meta sidecar present)"
    touch "$LOGS/rb-6.667-d20.done"
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

step sv28-slabengine-plan 3600 env QCT_SV_QUBITS=28 \
    QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
step sv28-slabengine-noplan 3600 env QCT_SV_QUBITS=28 QCT_SV_PLAN=0 \
    QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py

exec bash $B/run_tpu_queue15.sh
