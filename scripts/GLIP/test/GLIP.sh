#!/usr/bin/env bash
# Evaluate the raw GLIP cloud collection against target GT
# (reference flow: scripts/GLIP/test/GLIP.sh).
set -e
CONFIG=${1:-configs/coin/GLIP/foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer GLIP_test "${@:2}"
