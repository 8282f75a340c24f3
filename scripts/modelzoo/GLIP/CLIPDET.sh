#!/usr/bin/env bash
# Verify a released GLIP-teacher CLIPDET checkpoint
# (reference flow: scripts/modelzoo/GLIP/CLIPDET.sh).
set -e
CONFIG=${1:-configs/coin/PRETRAINS/CLIP-GLIP-DET_foggy.yaml}; CKPT=$2
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer ModelZoo_test MODEL.WEIGHTS "$CKPT" "${@:3}"
