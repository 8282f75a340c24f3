#!/usr/bin/env bash
# Resume the GLIP-teacher CLIPDET pre-train
# (reference flow: scripts/GLIP/pretrain/ResumeTrain.sh).
set -e
CONFIG=${1:-configs/coin/PRETRAINS/CLIP-GLIP-DET_foggy.yaml}
python train_net.py --config "$CONFIG" --resume \
  CLOUD.Trainer PRETrainer "${@:2}"
