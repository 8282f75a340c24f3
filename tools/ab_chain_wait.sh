#!/bin/bash
# ab_chain_wait.sh — wait for an already-running campaign pid to exit,
# then hand off to tools/ab_chain.sh for the remaining campaigns.
# Registers as the chain launcher (cmdline contains ab_chain) so
# bench.py preemption still covers the whole tree.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/coin_ab_chain.pid
WAIT_PID=$1; shift
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
rm -f /tmp/coin_ab_run.pid
exec bash tools/ab_chain.sh "$@"
