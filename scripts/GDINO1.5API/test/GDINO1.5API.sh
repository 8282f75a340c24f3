#!/usr/bin/env bash
# Evaluate cached GDINO-1.5-API detections (remote API collection;
# reference flow: scripts/GDINO1.5API/test/GDINO1.5API.sh).
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer GDINO_test \
  MODEL.TEACHER_CLOUD.META_ARCHITECTURE GDINO1_5_API "${@:2}"
