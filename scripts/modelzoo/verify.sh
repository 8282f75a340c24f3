#!/usr/bin/env bash
# Re-test a released checkpoint against its published metrics
# (reference flow: scripts/modelzoo/*). Pass TEST.EXPECTED_RESULTS to gate.
set -e
CONFIG=$1; CKPT=$2
python train_net.py --config "$CONFIG" --eval-only \
  MODEL.WEIGHTS "$CKPT" "${@:3}"
