#!/usr/bin/env bash
# Zero-shot CLIP evaluation of the CLASSONLY collection
# (reference flow: scripts/GDINO/classonly/test/CLIP.sh).
set -e
CONFIG=${1:-configs/coin/CLASSONLY/CLIP_foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only "${@:2}"
