#!/usr/bin/env bash
# Cloud-model (Grounding-DINO) mAP on the target val set
# (reference flow: scripts/GDINO/test/GDINO.sh → GDINOTrainer.test).
#
# One-shot: with no CLOUD.COLLECT_FILE artifact present the cloud model
# runs LIVE over DATASETS.TEST (needs MODEL.TEACHER_CLOUD.WEIGHT +
# TPU.BERT_VOCAB). If a collect store over the *val* split exists, pass
# CLOUD.COLLECT_FILE <path> to evaluate it directly instead — note a
# store collected with the training config covers TRAIN_UNLABEL, not
# the val split, so don't reuse it here.
set -e
CONFIG=${1:-configs/coin/GDINO/foggy.yaml}
python train_net.py --config "$CONFIG" --eval-only \
  CLOUD.Trainer GDINO_test CLOUD.COLLECT_FILE "''" "${@:2}"
