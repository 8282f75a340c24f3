#!/usr/bin/env bash
# Final adaptation with the GDINO-1.5-API teacher collection
# (reference flow: scripts/GDINO1.5API/final/targetDET.sh).
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}
python train_net.py --config "$CONFIG" CLOUD.Trainer CoinTrainer "${@:2}"
