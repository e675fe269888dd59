#!/bin/bash
# Round-4 queue 18 (runs after queue17): roofline statement + fused-engine
# attribution regeneration (VERDICT r3 #2/#5) + curve-tail extras.
#
# Usage: run_tpu_queue18.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "=== queue18 waiting for pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "=== queue18: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
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
    echo "=== queue18 pass $pass starting at $(date -u +%H:%M:%S)"

    # GKP roofline: streamed-split achieved FLOP/s + BW vs peaks
    step gkp-roofline 10800 python $B/gkp_roofline.py

    # attribution with the CURRENT defaults (fused gadgets + q=2)
    step profile-rb-fused-q2 10800 python $B/profile_rb.py

    # {0,4} success-curve tail: the two reference points still missing
    step grover-04-sweep2 21600 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged 0,4 --dbs 11.667,15.0 --trajectories 20 \
        --rng-seed 9205 --data-file $B/gkp_grover_tpu_04_sweep2.dat --overwrite
done

echo "=== queue18 finished at $(date -u +%H:%M:%S)"
