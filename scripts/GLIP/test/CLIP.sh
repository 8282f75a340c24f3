#!/usr/bin/env bash
# Zero-shot CLIP evaluation of the re-scored GLIP collection
# (reference flow: scripts/GLIP/test/CLIP.sh).
set -e
CONFIG=${1:-configs/coin/GLIP/foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer CLIP_test "${@:2}"
