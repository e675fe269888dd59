#!/bin/bash
# Round-3 chain runner: waits for the in-flight queue1 (PID in /tmp/queue.pid)
# to exit, re-runs queue1 (retries the rb-7.5 / rb-6.667 steps that failed on
# a transient tunnel outage; .done markers skip finished work), then runs
# queue2. One chip -> strict serialisation.
set -u
cd "$(dirname "$0")/.."
P=$(cat /tmp/queue.pid 2>/dev/null || echo "")
if [ -n "$P" ]; then
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
bash benchmarks/run_tpu_queue.sh >> benchmarks/logs/queue_driver.log 2>&1
bash benchmarks/run_tpu_queue2.sh >> benchmarks/logs/queue2_driver.log 2>&1
echo "chain complete at $(date -u +%H:%M:%S)" >> benchmarks/logs/queue_driver.log
