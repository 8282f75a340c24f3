#!/bin/bash
# ab_chain_r5.sh — the round-5 adjudication chain (VERDICT r4 items
# 1, 2, 4, 7): one multi-mode sweep that (a) adjudicates the staged
# int8-forward-quantization rehabilitation levers at n=16
# (int8train_ps / int8train_fo), (b) extends every INCONCLUSIVE
# boundary campaign and the A/A calibration from n=8 to n=16, and
# (c) runs the batch-doubling A/B; then the stacked shipped-recipe
# joint adjudication (--mode shipped) at n=16.
#
# Registers /tmp/coin_ab_*.pid so bench.py (the round's measurement of
# record) preempts exactly this tree; campaigns checkpoint .partial
# artifacts after every seed, so preemption loses at most one seed.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/coin_ab_chain.pid
LOG=${ABLOG:-/tmp/ab_chain_r5.log}

probe_chip() {
  while true; do
    if timeout 180 python - >> "$LOG" 2>&1 <<'EOF'
import jax
jax.devices()
import jax.numpy as jnp
(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
print("CHIP_OK", flush=True)
EOF
    then break; fi
    echo "=== $(date -u +%H:%M:%S) chip probe failed; retry in 120s" >> "$LOG"
    sleep 120
  done
}

run_campaign() {
  echo "=== $(date -u +%H:%M:%S) launching: $*" >> "$LOG"
  python tools/validate_cached_teacher.py "$@" >> "$LOG" 2>&1 &
  echo $! > /tmp/coin_ab_run.pid
  wait $!
  rc=$?
  echo "=== $(date -u +%H:%M:%S) campaign exited rc=$rc" >> "$LOG"
  rm -f /tmp/coin_ab_run.pid
}

probe_chip
run_campaign --multi "int8train_ps:0-15,int8train_fo:0-15,batch:0-15,aa:8-15:bench_artifacts/ab_aa_v3_s8.json,int8train:8-15:bench_artifacts/ab_int8train_v3_s8.json,int8train_wx:8-15:bench_artifacts/ab_int8train_wx_v3_s8.json,roibatch75:8-15:bench_artifacts/ab_roibatch75_v3_s8.json" \
  --out bench_artifacts/ab_multi_r5.json

probe_chip
run_campaign --mode shipped --seeds 16 --out bench_artifacts/ab_shipped_v3_s16.json

rm -f /tmp/coin_ab_chain.pid
