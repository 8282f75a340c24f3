#!/usr/bin/env bash
# Evaluate the cached Grounding-DINO collection against the target val set
# (reference flow: scripts/GDINO/test/GDINO.sh). Requires a collect pass:
#   python tools/collect.py --config configs/coin/GDINO/foggy.yaml
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer GDINO_test "${@:2}"
