#!/usr/bin/env bash
# Resume an interrupted CLIPDET pre-train from the latest checkpoint
# (reference flow: scripts/GDINO/pretrain/ResumeTrain.sh).
set -e
CONFIG=${1:-configs/coin/PRETRAINS/CLIPDET_foggy.yaml}
python train_net.py --config "$CONFIG" --resume \
  CLOUD.Trainer PRETrainer "${@:2}"
