#!/usr/bin/env bash
# Cloud-model (GLIP) mAP on the target val set
# (reference flow: scripts/GLIP/test/GLIP.sh → GLIPTrainer.test).
#
# One-shot: with no CLOUD.COLLECT_FILE artifact present the cloud model
# runs LIVE over DATASETS.TEST (needs MODEL.TEACHER_CLOUD.WEIGHT +
# TPU.BERT_VOCAB). Pass CLOUD.COLLECT_FILE <path> to evaluate a store
# collected over the *val* split instead.
set -e
CONFIG=${1:-configs/coin/GLIP/foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer GLIP_test CLOUD.COLLECT_FILE "''" "${@:2}"
