#!/bin/bash
# Round-3 queue 10: queue9 + the on-chip mid-range eigh accuracy check.
#
# sv28-slab came back at 1.37x the achieved-BW floor (0.849 ms/gate for a
# 24-gate window) with the bit-group permute at 5.1 ms — the slab design
# is the production statevector path. This queue adds the end-to-end
# engine number (FastStatevector fusion_mode='slab': move passes + slab
# matmuls with lazy layout) at N=28 and N=30 ahead of the RB cells.
# Steps gate on .done markers — finished queue6/7/8 steps are skipped.
#
# Usage: run_tpu_queue10.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
B=benchmarks
LOGS=$B/logs
mkdir -p "$LOGS"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    echo "=== queue10 waiting for pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "=== queue10: pid $WAIT_PID exited at $(date -u +%H:%M:%S)"
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

rb_cell() { # rb_cell <db> <depth> <seed> <timeout>
    local db=$1 depth=$2 seed=$3 tmo=$4
    step "rb-$db-d$depth" "$tmo" env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs "$db" --depths "$depth" --num-samples 100 --batch 16 \
        --rng-seed "$seed" \
        --data-file "$B/gkp_rb_tpu_${db}_d${depth}.dat" --overwrite
}

for pass in 1 2; do
    echo "=== queue10 pass $pass starting at $(date -u +%H:%M:%S)"
    # priority 1: the slab ENGINE end-to-end numbers (short, cache-warm)
    step sv28-slabengine 3600 env QCT_SV_QUBITS=28 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
    step sv30-slab 3600 env QCT_SV_QUBITS=30 QCT_SV_PATHS=calib,slab \
        python $B/statevector_bench.py
    step sv30-slabengine 3600 env QCT_SV_QUBITS=30 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
    # priority 2: the scattered-window comparison queue7 started
    step sv28-window 3600 env QCT_SV_QUBITS=28 QCT_SV_PATHS=calib,fusedxla \
        python $B/statevector_bench.py
    # round-2 weak #7: on-chip accuracy of mid-size materialised splits
    step eigh-midrange 5400 python $B/eigh_midrange_check.py
    # priority 3: RB grid, shallow depths across both remaining dB rows first
    rb_cell 7.5   8  101 7200
    rb_cell 6.667 8  105 7200
    rb_cell 7.5   10 102 7200
    rb_cell 6.667 10 106 7200
    rb_cell 7.5   15 103 10800
    rb_cell 6.667 15 107 10800
    rb_cell 7.5   20 104 10800
    rb_cell 6.667 20 108 10800
done
echo "=== queue10 finished at $(date -u +%H:%M:%S)"
