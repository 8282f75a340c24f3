#!/bin/bash
# Round-3 quiet-chip measurement playbook: run when NO other TPU client
# is active (A/B campaigns finished). Each step appends to the log.
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/quiet_window.log}
{
  date
  echo "=== 1. bench batch 3 (async-chain validation) ==="
  timeout 2400 python bench.py
  echo "=== 2. bench batch 6 ==="
  COIN_BENCH_BATCH=6 timeout 3600 python bench.py
  echo "=== 3. res5 lowering microbench (conv-at-peak check) ==="
  timeout 1200 python tools/bench_res5_lowering.py
  echo "=== 4. preprocess pallas-vs-jnp ==="
  timeout 1200 python tools/bench_preprocess.py
  echo "=== 5. trace live step ==="
  timeout 2400 python tools/trace_step.py --flavor live --steps 3
  echo "=== 6. trace cached step ==="
  timeout 2400 python tools/trace_step.py --flavor cached --steps 3 \
      --logdir /tmp/coin_trace_cached
  date
} >> "$LOG" 2>&1
