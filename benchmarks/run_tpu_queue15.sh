#!/bin/bash
# Round-3 queue 15 (post-restart): finish the RB grid + N=30 engine numbers,
# then hand off to queue14 (A/Bs + Grover dataset depth).
#
# Priority order:
#   1. rb-6.667-d20 — the single missing cell of the 16-cell production RB
#      grid (4 dB rows x 4 reference depths).
#   2. sv30-slabengine / sv30-slab — end-to-end slab-engine and slab-pass
#      numbers at N=30 (N=28 committed; N=30 timed out pre-restart).
#   3. exec queue14 — q=2 / device-eigh A/Bs, Grover n=60 cells, dB sweep.
# Steps gate on .done markers — re-runnable after tunnel drops.
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

step rb-6.667-d20 14400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 6.667 --depths 20 --num-samples 100 --batch 16 \
    --rng-seed 108 \
    --data-file $B/gkp_rb_tpu_6.667_d20.dat --overwrite

step sv30-slabengine 5400 env QCT_SV_QUBITS=30 \
    QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
step sv30-slab 5400 env QCT_SV_QUBITS=30 QCT_SV_PATHS=calib,slab \
    python $B/statevector_bench.py

exec bash $B/run_tpu_queue14.sh
