#!/usr/bin/env bash
# Stage 3: final dual-teacher adaptation (reference flow:
# scripts/GDINO/final/targetDET.sh). MODEL.WEIGHTS points at the CLIPDET
# pretrain checkpoint; CLOUD.COLLECT_FILE at the collect store.
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}
python train_net.py --config "$CONFIG" CLOUD.Trainer CoinTrainer "${@:2}"
