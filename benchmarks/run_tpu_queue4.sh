#!/bin/bash
# Round-3 queue 4 (supersedes queue3 after the fused single-mode gadget
# landed). Policy:
#   * The remaining PRODUCTION DATASET cells (rb-7.5/6.667, rb-10-d20,
#     grover oracles) run with QCT_FUSED_SINGLE=0 — the engine that produced
#     the already-committed cells — so the merged dataset is one engine.
#   * The fused path gets its own validation ladder: a cheap smoke step
#     (compiles + runs on the tunnel), then a full anchor cell
#     (5.833 dB, depth 8, 100 samples) written to a SEPARATE file for an
#     accuracy + throughput A/B against the committed unfused anchor.
#   * Then the statevector/eigh evidence and the queue2/3 studies.
# Same wait_tpu + .done-marker gating as queue3 -> re-runnable.
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

# --- priority 1: the remaining production RB cells (unfused = dataset engine)
for db in 7.5 6.667; do
    step "rb-$db" 14400 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs "$db" --depths 8,10,15,20 --num-samples 100 --batch 16 \
        --data-file "$B/gkp_rb_tpu_$db.dat" --overwrite
done
# retry of the (10.0, depth 20) cell (queue1 hung mid-cell; depths 8/10/15
# were checkpointed; fresh circuits, seed 77, are equally valid samples).
step rb-10-d20 7200 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.0 --depths 20 --num-samples 100 --batch 16 --rng-seed 77 \
    --data-file "$B/gkp_rb_tpu_10.0_d20.dat" --overwrite

# --- priority 2: the reference's other two committed Grover oracles --------
step grover-27 5400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --data-file $B/gkp_grover_tpu_27.dat --overwrite
step grover-36 5400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --data-file $B/gkp_grover_tpu_36.dat --overwrite

# --- priority 3: fused-gadget TPU validation ladder -------------------------
step fused-smoke 3600 python $B/fused_smoke.py
step rb-fused-anchor 10800 python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 100 --batch 16 \
    --data-file $B/rb_fused_anchor.dat --overwrite
step bench-fused 5400 env QCT_BENCH_REPS=3 python bench.py

# --- priority 4: statevector + eigh kernel evidence -------------------------
step sv28 5400 env QCT_SV_QUBITS=28 python $B/statevector_bench.py
step sv30 3600 env QCT_SV_QUBITS=30 QCT_SV_PATHS=calib,fused \
    python $B/statevector_bench.py
step eigh-midrange 3600 python $B/eigh_midrange_check.py

# --- priority 5: queue2/3 studies (q=2 adjudication, anchor diversity) ------
step qstudy-tpu 5400 python $B/streamed_q_study.py --grid 1000 --chi 8 \
    --db 5.833 --depth 8 --qs 1,2,4,7
step rb-q2-paired 7200 env QCT_STREAM_POWER_ITERS=2 QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 48 --batch 16 \
    --data-file $B/rb_q2_paired.dat --overwrite
step bench-unfused 5400 env QCT_FUSED_SINGLE=0 QCT_BENCH_REPS=3 python bench.py
step rb-anchor-diverse 10800 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 200 --batch 8 --rng-seed 1234 \
    --data-file $B/rb_anchor_diverse.dat --overwrite
echo "=== queue4 complete at $(date -u +%H:%M:%S)"
