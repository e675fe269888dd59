#!/bin/bash
# Round-3 tunnel-aware TPU queue (supersedes the chain of queue1+queue2 after
# the axon tunnel outage at ~20:48 UTC hung sv28 and failed rb-7.5/6.667 at
# backend init). Differences from queue1/queue2:
#   * wait_tpu probes `jax.devices()` (120 s timeout) before EVERY step and
#     blocks until the tunnel answers — a dead tunnel no longer burns each
#     step's full timeout.
#   * Steps reordered: the remaining production RB cells (the round's #1
#     deliverable) run first, then the statevector/eigh kernel evidence,
#     then the queue2 studies.
# Same .done-marker gating -> re-runnable, skips finished work.
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

# --- priority 1: the remaining production RB cells -------------------------
for db in 7.5 6.667; do
    step "rb-$db" 14400 python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs "$db" --depths 8,10,15,20 --num-samples 100 --batch 16 \
        --data-file "$B/gkp_rb_tpu_$db.dat" --overwrite
done
# retry of the (10.0, depth 20) cell — the queue1 run hung mid-cell and was
# killed; depths 8/10/15 were checkpointed. Fresh circuits (seed 77) are
# equally valid samples of the cell.
step rb-10-d20 7200 python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.0 --depths 20 --num-samples 100 --batch 16 --rng-seed 77 \
    --data-file "$B/gkp_rb_tpu_10.0_d20.dat" --overwrite

# --- priority 2: the reference's other two committed Grover oracles --------
step grover-27 5400 python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --data-file $B/gkp_grover_tpu_27.dat --overwrite
step grover-36 5400 python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --data-file $B/gkp_grover_tpu_36.dat --overwrite

# --- priority 3: statevector + eigh kernel evidence -------------------------
step sv28 5400 env QCT_SV_QUBITS=28 python $B/statevector_bench.py
step sv30 3600 env QCT_SV_QUBITS=30 QCT_SV_PATHS=calib,fused \
    python $B/statevector_bench.py
step eigh-midrange 3600 python $B/eigh_midrange_check.py

# --- priority 4: queue2 studies (q=2 adjudication, anchor diversity) --------
step qstudy-tpu 5400 python $B/streamed_q_study.py --grid 1000 --chi 8 \
    --db 5.833 --depth 8 --qs 1,2,4,7
step rb-q2-paired 7200 env QCT_STREAM_POWER_ITERS=2 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 48 --batch 16 \
    --data-file $B/rb_q2_paired.dat --overwrite
step bench-q2 5400 env QCT_STREAM_POWER_ITERS=2 QCT_BENCH_REPS=3 python bench.py
step bench-qdefault 5400 env QCT_BENCH_REPS=3 python bench.py
step rb-anchor-diverse 10800 python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 200 --batch 8 --rng-seed 1234 \
    --data-file $B/rb_anchor_diverse.dat --overwrite
echo "=== queue3 complete at $(date -u +%H:%M:%S)"
