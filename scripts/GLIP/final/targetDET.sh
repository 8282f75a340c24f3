#!/usr/bin/env bash
# Final dual-teacher adaptation with the GLIP cloud teacher
# (reference flow: scripts/GLIP/final/targetDET.sh).
set -e
CONFIG=${1:-configs/coin/GLIP/foggy.yaml}
python train_net.py --config "$CONFIG" CLOUD.Trainer CoinTrainer "${@:2}"
