#!/bin/bash
# ab_wait_chip.sh — wait until the TPU relay answers a real matmul
# probe (the relay has multi-minute outage windows — BENCH.md round-3
# notes), then run ONE validate_cached_teacher.py invocation with the
# given args. Registers /tmp/coin_ab_*.pid so bench.py (the round's
# measurement of record) can preempt exactly this tree.
#
#   ABLOG=/tmp/ab_multi.log tools/ab_wait_chip.sh --multi "..." ...
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/coin_ab_chain.pid
LOG=${ABLOG:-/tmp/ab_wait_chip.log}
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
echo "=== $(date -u +%H:%M:%S) chip up; launching campaign: $*" >> "$LOG"
python tools/validate_cached_teacher.py "$@" >> "$LOG" 2>&1 &
echo $! > /tmp/coin_ab_run.pid
wait $!
rc=$?
echo "=== $(date -u +%H:%M:%S) campaign exited rc=$rc" >> "$LOG"
rm -f /tmp/coin_ab_run.pid /tmp/coin_ab_chain.pid
exit $rc
