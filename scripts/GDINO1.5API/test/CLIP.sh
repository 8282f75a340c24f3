#!/usr/bin/env bash
# Zero-shot CLIP evaluation of the GDINO-1.5-API collection
# (reference flow: scripts/GDINO1.5API/test/CLIP.sh).
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer CLIP_test "${@:2}"
