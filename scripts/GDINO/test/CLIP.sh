#!/usr/bin/env bash
# Zero-shot CLIP evaluation: re-score the cached cloud boxes with frozen
# CLIP and evaluate (reference flow: scripts/GDINO/test/CLIP.sh).
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer CLIP_test "${@:2}"
