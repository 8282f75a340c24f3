#!/usr/bin/env bash
# Stage 1+2: collect cloud results (once) and pre-train CLIPDET
# (reference flow: scripts/GDINO/pretrain/CLIPDET.sh).
set -e
CONFIG=${1:-configs/coin/PRETRAINS/CLIPDET_foggy.yaml}
python train_net.py --config "$CONFIG" CLOUD.Trainer PRETrainer "${@:2}"
