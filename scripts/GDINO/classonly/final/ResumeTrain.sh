#!/usr/bin/env bash
# Resume the CLASSONLY final adaptation
# (reference flow: scripts/GDINO/classonly/final/ResumeTrain.sh).
set -e
CONFIG=${1:-configs/coin/CLASSONLY/foggy.yaml}
python train_net.py --config "$CONFIG" --resume "${@:2}"
