#!/usr/bin/env bash
# Verify a released GDINO-teacher CLIPDET checkpoint
# (reference flow: scripts/modelzoo/GDINO/CLIPDET.sh).
set -e
CONFIG=${1:-configs/coin/PRETRAINS/CLIPDET_foggy.yaml}; CKPT=$2
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer ModelZoo_test MODEL.WEIGHTS "$CKPT" "${@:3}"
