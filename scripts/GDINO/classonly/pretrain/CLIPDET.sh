#!/usr/bin/env bash
# CLIPDET pre-train on the CLASSONLY store
# (reference flow: scripts/GDINO/classonly/pretrain/CLIPDET.sh).
set -e
CONFIG=${1:-configs/coin/CLASSONLY/CLIPDET_foggy.yaml}
python train_net.py --config "$CONFIG" "${@:2}"
