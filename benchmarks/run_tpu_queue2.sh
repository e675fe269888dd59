#!/bin/bash
# Round-3 follow-up TPU queue (run AFTER run_tpu_queue.sh completes — one
# chip, jobs must not contend; never edit a queue script while it runs).
#
# Extends the production Grover evidence to the reference's other two
# committed oracles at 12.5 dB (executor shapes + epsilon already in the
# compile cache from the {0,4} run — these are warm, ~8 min each) and one
# more dB point for oracle {0,4} (fresh epsilon, compile-heavy).
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

step() { # step <name> <timeout_s> <cmd...>
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
}

step grover-27 3600 python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --data-file $B/gkp_grover_tpu_27.dat --overwrite
step grover-36 3600 python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --data-file $B/gkp_grover_tpu_36.dat --overwrite
# batch 16 matches the RB sweep's executor shapes at the same epsilon
# (db2eps(10.0)), so much of the compile cache is shared with rb-10.0.
step grover-04-db10 7200 python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 0,4 --dbs 10.0 --batch 16 --trajectories 32 \
    --data-file $B/gkp_grover_tpu_04_db10.dat --overwrite
echo "=== queue2 complete at $(date -u +%H:%M:%S)"
