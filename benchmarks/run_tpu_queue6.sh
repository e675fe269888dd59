#!/bin/bash
# Round-3 queue 6: consolidated re-run of everything still pending after the
# box restart killed queue3/4/5 mid-flight (tunnel outage + machine restart).
#
# Changes vs queue4/5:
#   * the remaining production RB rows are split into ONE STEP PER DEPTH
#     (gkp_rb_tpu_<db>_d<depth>.dat) so a mid-step tunnel outage costs one
#     cell, not a whole row; merge_rb_tpu.py globs gkp_rb_tpu_*.dat and
#     picks the split files up unchanged.
#   * the driver loops the whole queue 3 times — steps gate on .done, so a
#     pass only re-attempts what previously failed.
#   * statevector_bench.py now seeds the fused N=30 state with an in-trace
#     iota+sin generator (no PRNG scratch), which was the sv30 OOM.
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

run_pass() {
# --- priority 1: short, high-value evidence ---------------------------------
# fused gadgets on-chip at small shapes (numerical sanity before the anchors)
step fused-smoke 3600 python $B/fused_smoke.py
# statevector fused-chain per-gate numbers at N=28 and the N=30 demo
step sv28 5400 env QCT_SV_QUBITS=28 python $B/statevector_bench.py
step sv30 3600 env QCT_SV_QUBITS=30 QCT_SV_PATHS=calib,fused \
    python $B/statevector_bench.py
# headline bench with the current defaults (fused gadgets on)
step bench-fused 5400 env QCT_BENCH_REPS=3 python bench.py

# --- priority 2: the reference's other two committed Grover oracles ---------
step grover-27 5400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 2,7 --data-file $B/gkp_grover_tpu_27.dat --overwrite
step grover-36 5400 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.grover_batched \
    --tagged 3,6 --data-file $B/gkp_grover_tpu_36.dat --overwrite

# --- priority 3: finish the production RB grid (unfused = dataset engine) ---
# (10.0, depth 20): queue1 hung mid-cell; depths 8/10/15 were checkpointed.
step rb-10-d20 7200 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 10.0 --depths 20 --num-samples 100 --batch 16 --rng-seed 77 \
    --data-file "$B/gkp_rb_tpu_10.0_d20.dat" --overwrite
local db depth seed=101
for db in 7.5 6.667; do
    for depth in 8 10 15 20; do
        step "rb-$db-d$depth" 10800 env QCT_FUSED_SINGLE=0 \
            python -m quantum_computations_tpu.pipelines.rb_batched \
            --dbs "$db" --depths "$depth" --num-samples 100 --batch 16 \
            --rng-seed "$seed" \
            --data-file "$B/gkp_rb_tpu_${db}_d${depth}.dat" --overwrite
        seed=$((seed+1))
    done
done

# --- priority 4: fused-gadget production adjudication ------------------------
step rb-fused-anchor 10800 python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 100 --batch 16 \
    --data-file $B/rb_fused_anchor.dat --overwrite
step bench-unfused 5400 env QCT_FUSED_SINGLE=0 QCT_FUSED_PAIR=0 \
    QCT_BENCH_REPS=3 python bench.py
step attribution-fused 7200 python $B/profile_rb.py
step fused-anchor-ab 600 python $B/compare_fused_anchor.py

# --- priority 5: device-eigh streamed split (zero host round-trips) ---------
step eigh-device-smoke 7200 env QCT_STREAM_EIGH=device QCT_BENCH_MODE=toy \
    QCT_BENCH_REPS=2 python bench.py
step bench-eigh-device 10800 env QCT_STREAM_EIGH=device QCT_FUSED_SINGLE=0 \
    QCT_FUSED_PAIR=0 QCT_BENCH_REPS=3 python bench.py
step bench-all-opts 10800 env QCT_STREAM_EIGH=device QCT_BENCH_REPS=3 \
    python bench.py

# --- priority 6: studies ------------------------------------------------------
step eigh-midrange 3600 python $B/eigh_midrange_check.py
step qstudy-tpu 5400 python $B/streamed_q_study.py --grid 1000 --chi 8 \
    --db 5.833 --depth 8 --qs 1,2,4,7
step rb-q2-paired 7200 env QCT_STREAM_POWER_ITERS=2 QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 48 --batch 16 \
    --data-file $B/rb_q2_paired.dat --overwrite
step rb-all-opts-anchor 10800 env QCT_STREAM_EIGH=device \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 100 --batch 16 \
    --data-file $B/rb_all_opts_anchor.dat --overwrite
step attribution-all-opts 7200 env QCT_STREAM_EIGH=device python $B/profile_rb.py
step rb-anchor-diverse 10800 env QCT_FUSED_SINGLE=0 \
    python -m quantum_computations_tpu.pipelines.rb_batched \
    --dbs 5.833 --depths 8 --num-samples 200 --batch 8 --rng-seed 1234 \
    --data-file $B/rb_anchor_diverse.dat --overwrite
}

for pass in 1 2 3; do
    echo "=== queue6 pass $pass starting at $(date -u +%H:%M:%S)"
    run_pass
done
echo "=== queue6 complete at $(date -u +%H:%M:%S)"
