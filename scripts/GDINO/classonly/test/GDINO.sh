#!/usr/bin/env bash
# Evaluate the CLASSONLY (one-hot labels) cloud collection
# (reference flow: scripts/GDINO/classonly/test/GDINO.sh).
set -e
CONFIG=${1:-configs/coin/CLASSONLY/GDINO_foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only "${@:2}"
