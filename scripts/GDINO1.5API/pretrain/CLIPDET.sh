#!/usr/bin/env bash
# CLIPDET pre-train from the GDINO-1.5-API collection
# (reference flow: scripts/GDINO1.5API/pretrain/CLIPDET.sh).
set -e
CONFIG=${1:-configs/coin/PRETRAINS/CLIPDET_foggy.yaml}
python train_net.py --config "$CONFIG" CLOUD.Trainer PRETrainer "${@:2}"
