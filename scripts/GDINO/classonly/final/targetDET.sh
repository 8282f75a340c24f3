#!/usr/bin/env bash
# Final adaptation on the CLASSONLY ablation
# (reference flow: scripts/GDINO/classonly/final/targetDET.sh).
set -e
CONFIG=${1:-configs/coin/CLASSONLY/foggy.yaml}
python train_net.py --config "$CONFIG" "${@:2}"
