#!/usr/bin/env bash
# CLIPDET pre-train from the GLIP-teacher collection
# (reference flow: scripts/GLIP/pretrain/CLIPDET.sh).
set -e
CONFIG=${1:-configs/coin/PRETRAINS/CLIP-GLIP-DET_foggy.yaml}
python train_net.py --config "$CONFIG" CLOUD.Trainer PRETrainer "${@:2}"
