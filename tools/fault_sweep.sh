#!/bin/bash
# Sweep bisect stages x fps impls on the real chip; fresh process per run.
# Usage: bash tools/fault_sweep.sh [logfile]
LOG=${1:-/tmp/fault_sweep.log}
cd "$(dirname "$0")/.."
: > "$LOG"
for fps in auto jax; do
  for stage in fwd grad_crit step; do
    for rep in 1 2; do
      echo "=== fps=$fps stage=$stage rep=$rep $(date +%H:%M:%S) ===" >> "$LOG"
      BENCH_FPS_IMPL=$fps PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 2400 python tools/bisect_fault.py "$stage" >> "$LOG" 2>&1
      echo "--- rc=$? ---" >> "$LOG"
    done
  done
done
echo "SWEEP DONE" >> "$LOG"
