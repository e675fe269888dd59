#!/bin/bash
# Round-3 TPU job queue: serialises every on-chip measurement the round needs
# (one chip — jobs must not contend). Each step is gated on a .done marker so
# the queue is re-runnable after a crash without repeating finished work.
#
# Order rationale (VERDICT round 2): the RAW-convention Grover rerun closes
# the round-1 carry-over first (short); the production RB sweep is the long
# pole and the round's #1 ask; statevector benches and the eigh check close
# out the kernel evidence. All gkp steps share the persistent .jax_cache and
# (since epsilon became traced executor data) the same executor programs
# across dB values.
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

# RAW-readout rerun (the committed gkp_grover_tpu.dat predates the
# convention fix: its rhos were normalised inside readout).
step grover-raw 7200 python -m quantum_computations_tpu.pipelines.grover_batched \
    --data-file $B/gkp_grover_tpu.dat --overwrite
for db in 5.833 10.0 7.5 6.667; do
    step "rb-$db" 14400 python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs "$db" --depths 8,10,15,20 --num-samples 100 --batch 16 \
        --data-file "$B/gkp_rb_tpu_$db.dat" --overwrite
done
step sv28 5400 env QCT_SV_QUBITS=28 python $B/statevector_bench.py
step sv30 3600 env QCT_SV_QUBITS=30 QCT_SV_PATHS=calib,fused \
    python $B/statevector_bench.py
step eigh-midrange 3600 python $B/eigh_midrange_check.py
echo "=== queue complete at $(date -u +%H:%M:%S)"
