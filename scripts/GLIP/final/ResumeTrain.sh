#!/usr/bin/env bash
# Resume the GLIP-teacher final adaptation
# (reference flow: scripts/GLIP/final/ResumeTrain.sh).
set -e
CONFIG=${1:-configs/coin/GLIP/foggy.yaml}
python train_net.py --config "$CONFIG" --resume \
  CLOUD.Trainer CoinTrainer "${@:2}"
