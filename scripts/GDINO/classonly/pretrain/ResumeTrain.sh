#!/usr/bin/env bash
# Resume the CLASSONLY CLIPDET pre-train
# (reference flow: scripts/GDINO/classonly/pretrain/ResumeTrain.sh).
set -e
CONFIG=${1:-configs/coin/CLASSONLY/CLIPDET_foggy.yaml}
python train_net.py --config "$CONFIG" --resume "${@:2}"
