#!/usr/bin/env bash
# Verify a released GDINO-teacher targetDET checkpoint
# (reference flow: scripts/modelzoo/GDINO/targetDET.sh).
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}; CKPT=$2
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer ModelZoo_test MODEL.WEIGHTS "$CKPT" "${@:3}"
