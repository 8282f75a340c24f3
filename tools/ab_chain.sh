#!/bin/bash
# ab_chain.sh — run A/B campaigns sequentially on the chip, registering
# pids under /tmp/coin_ab_*.pid so bench.py (the round's measurement of
# record) can preempt exactly this tree (bench.py:_preempt_ab_campaigns).
# The chip does not time-share: campaigns must be the ONLY TPU client.
#
# Usage: tools/ab_chain.sh "MODE[:SEEDS[:RESUME]]" ...
#   e.g. tools/ab_chain.sh int8train_wx refresh_int8
# Each campaign writes bench_artifacts/ab_<mode>_v3_s<N>.json (+ .partial
# after every seed, so preemption loses at most one seed).
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/coin_ab_chain.pid
LOG=${ABLOG:-/tmp/ab_chain.log}
for spec in "$@"; do
  IFS=: read -r mode seeds resume <<< "$spec"
  seeds=${seeds:-8}
  out="bench_artifacts/ab_${mode}_v3_s${seeds}.json"
  args=(--mode "$mode" --seeds "$seeds" --out "$out")
  [ -n "${resume:-}" ] && args+=(--resume-from "$resume" --seed-start \
      "$(python - "$resume" <<'EOF'
import json, sys
print(len(json.load(open(sys.argv[1]))["per_seed"]))
EOF
)")
  echo "=== $(date -u +%H:%M:%S) launching --mode $mode -> $out" >> "$LOG"
  python tools/validate_cached_teacher.py "${args[@]}" >> "$LOG" 2>&1 &
  echo $! > /tmp/coin_ab_run.pid
  wait $!
  echo "=== $(date -u +%H:%M:%S) $mode exited rc=$?" >> "$LOG"
  rm -f /tmp/coin_ab_run.pid
done
rm -f /tmp/coin_ab_chain.pid
