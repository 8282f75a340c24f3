#!/usr/bin/env bash
# Resume the final adaptation from the latest checkpoint.
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}
python train_net.py --config "$CONFIG" --resume CLOUD.Trainer CoinTrainer "${@:2}"
