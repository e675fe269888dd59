#!/bin/bash
# Round-4 queue 17: finish the RB grid, Grover success curves, fused-engine
# production evidence, D=1 mesh-slab on-chip, scheduler A/B repeat.
#
# VERDICT.md round-3 items driven here:
#   1. RB rows 8.333 / 9.167 / 10.833 dB at the reference depths (100
#      samples/cell) -> 7/9 reference dB rows covered.
#   2. Double the 5.833 dB row (fresh seeds; merge_rb_tpu.py pools files).
#   3. Grover success curves for {2,7} and {3,6}: 5 dB points x 20 traj.
#   4. Production-scale evidence for the DEFAULT (fused single+pair)
#      engine: one RB row + one Grover cell at chi=100/d=1000.
#   5. run_fused_slab on the real chip at D=1 vs FastStatevector.
#   6. Scheduler A/B repeat (round-3 single runs disagreed with the
#      pass-count model; repeats resolve variance).
# All steps .done-gated — re-runnable after tunnel drops.
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

rb_cell() { # rb_cell <db> <depth> <seed> [extra tag] [env...]
    local db=$1 depth=$2 seed=$3 tag=${4:-}
    step "rb-$db-d$depth$tag" 14400 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.rb_batched \
        --dbs "$db" --depths "$depth" --num-samples 100 --batch 16 \
        --rng-seed "$seed" \
        --data-file "$B/gkp_rb_tpu_${db}${tag}_d${depth}.dat" --overwrite
}

for pass in 1 2; do
    echo "=== queue17 pass $pass starting at $(date -u +%H:%M:%S)"

    # 0. validate the new defaults (q=2 power iters) + dual-metric bench
    step bench-r4-defaults 10800 env QCT_BENCH_REPS=3 python bench.py

    # 5. D=1 mesh-slab on the real chip (short; unblocks VERDICT #6 early)
    step meshslab-d1 7200 python $B/meshslab_d1.py

    # 1. three new RB dB rows (reference grid, 100 samples/cell)
    for db in 8.333 9.167 10.833; do
        s=0
        for depth in 8 10 15 20; do
            s=$((s+1))
            seed=$(( ${db%%.*} * 100 + depth + s ))
            rb_cell "$db" "$depth" "$seed"
        done
    done

    # 3. Grover success curves for the two weak oracles
    step grover-27-sweep 28800 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged 2,7 --dbs 6.667,8.333,10.0,11.667,13.333 --trajectories 20 \
        --rng-seed 9227 --data-file $B/gkp_grover_tpu_27_sweep.dat --overwrite
    step grover-36-sweep 28800 env QCT_FUSED_SINGLE=0 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged 3,6 --dbs 6.667,8.333,10.0,11.667,13.333 --trajectories 20 \
        --rng-seed 9236 --data-file $B/gkp_grover_tpu_36_sweep.dat --overwrite

    # 2. double the 5.833 dB row (fresh seeds; pooled by merge_rb_tpu.py)
    rb_cell 5.833 8  30108 _x2
    rb_cell 5.833 10 30110 _x2
    rb_cell 5.833 15 30115 _x2
    rb_cell 5.833 20 30120 _x2

    # 4. fused-default engine at production scale: one RB row + one Grover
    #    cell (fused_single+fused_pair ON — files named so the dataset
    #    merger does NOT pool them with the split-engine grid)
    for depth in 8 10 15 20; do
        step "rb-fused-10.0-d$depth" 14400 \
            python -m quantum_computations_tpu.pipelines.rb_batched \
            --dbs 10.0 --depths "$depth" --num-samples 100 --batch 16 \
            --rng-seed $((4000+depth)) \
            --data-file "$B/gkp_rb_fused_10.0_d${depth}.dat" --overwrite
    done
    step grover-04-fused 10800 \
        python -m quantum_computations_tpu.pipelines.grover_batched \
        --tagged 0,4 --trajectories 20 --rng-seed 9304 \
        --data-file $B/gkp_grover_fused_04.dat --overwrite

    # 6. scheduler A/B repeat (round-3 single pair was inconclusive)
    step sv28-plan-r2 3600 env QCT_SV_QUBITS=28 QCT_SV_REPS=5 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
    step sv28-noplan-r2 3600 env QCT_SV_QUBITS=28 QCT_SV_REPS=5 QCT_SV_PLAN=0 \
        QCT_SV_PATHS=calib,slabengine python $B/statevector_bench.py
done

echo "=== queue17 finished at $(date -u +%H:%M:%S)"
