#!/bin/bash
# Round-3 TPU job queue: serialises every on-chip measurement the round needs
# (one chip — jobs must not contend). Each step is gated on a .done marker so
# the queue is re-runnable after a crash without repeating finished work.
#
# Steps (in order):
#   sv28    statevector per-gate bench, all paths, N=28
#   sv30    N=30 demonstration — only the donated fused chain fits 16 GB
#   grover  production Grover (chi=100, grid 1000, 12.5 dB, 20 trajectories)
#   rb-<db> production RB, one dB per step (crash loses at most one dB),
#           depths 8,10,15,20 x 100 samples/cell, batch 16
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

step sv28 5400 env QCT_SV_QUBITS=28 python $B/statevector_bench.py
step sv30 3600 env QCT_SV_QUBITS=30 QCT_SV_PATHS=calib,fused \
    python $B/statevector_bench.py
step eigh-midrange 3600 python $B/eigh_midrange_check.py
step grover 7200 python -m quantum_computations_tpu.pipelines.grover_batched \
    --data-file $B/gkp_grover_tpu.dat --overwrite
for db in 5.833 10.0 7.5 6.667; do
    step "rb-$db" 10800 python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs "$db" --depths 8,10,15,20 --num-samples 100 --batch 16 \
        --data-file "$B/gkp_rb_tpu_$db.dat" --overwrite
done
echo "=== queue complete at $(date -u +%H:%M:%S)"
