#!/usr/bin/env bash
# Zero-asset rehearsal of the full three-stage CODA pipeline on
# synthetic VOC data with a random-weight teacher: collection →
# CLIPDET pre-train → dual-teacher adaptation → eval. Numbers are
# meaningless (random teacher); this validates the END-TO-END wiring
# on any machine in ~15 min (CPU) without downloading anything.
#
# Usage: bash scripts/demo_pipeline.sh [workdir]
set -e
WORK=${1:-/tmp/coin_tpu_demo}
rm -rf "$WORK"; mkdir -p "$WORK"

python - <<EOF
from coin_tpu.data.voc import make_synthetic_voc
make_synthetic_voc("$WORK/data/synth/VOC2007", num_images=8, split="train")
make_synthetic_voc("$WORK/data/synth/VOC2007", num_images=6, split="val",
                   seed=9)
EOF

cat > "$WORK/base.yaml" <<EOF
DATASETS:
  ROOT: "$WORK/data"
  TRAIN_UNLABEL: [demotrain]
  TEST: [demoval]
  CUSTOM:
    - {NAME: demotrain, DIRNAME: synth/VOC2007, SPLIT: train,
       CLASSES: [car, person]}
    - {NAME: demoval, DIRNAME: synth/VOC2007, SPLIT: val,
       CLASSES: [car, person]}
SOLVER:
  IMG_PER_BATCH_UNLABEL: 2
  MAX_ITER: 6
  WARMUP_ITERS: 2
  STEPS: [100]
  FACTOR_LIST: [1, 0.1]
  CHECKPOINT_PERIOD: 1000
TEST: {EVAL_PERIOD: 1000, DETECTIONS_PER_IMAGE: 8}
INPUT: {MIN_SIZE_TRAIN: 64, MIN_SIZE_TEST: 64, MAX_SIZE: 96}
MODEL:
  RPN: {PRE_NMS_TOPK_TRAIN: 64, POST_NMS_TOPK_TRAIN: 16,
        PRE_NMS_TOPK_TEST: 64, POST_NMS_TOPK_TEST: 16,
        BATCH_SIZE_PER_IMAGE: 16}
  ROI_HEADS: {BATCH_SIZE_PER_IMAGE: 16}
TPU:
  TEXT_LAYERS: 1
  TEXT_WIDTH: 32
  TEXT_HEADS: 2
  COMPUTE_DTYPE: float32
  CAP_TEACHER: 8
CLOUD:
  CLASSES_WEIGHT: [1.0, 1.0, 0.9]
  COLLECT_FILE: "$WORK/collect/CLIP_collect.npz"
OUTPUT_DIR: "$WORK/collect"
EOF

echo "== stage 1: collection (synthetic teacher) =="
python tools/collect.py --config "$WORK/base.yaml" --synthetic-teacher \
  INPUT.TEACHER_CLOUD.MIN_SIZE_TEST 64 INPUT.TEACHER_CLOUD.MAX_SIZE_TEST 96

echo "== stage 2: CLIPDET pre-train =="
python train_net.py --config "$WORK/base.yaml" --device cpu \
  CLOUD.Trainer PRETrainer OUTPUT_DIR "$WORK/pretrain"

echo "== stage 3: dual-teacher adaptation (from the CLIPDET ckpt) =="
PRE_CKPT=$(ls -d "$WORK"/pretrain/checkpoints/pre_train_CLIP_* | tail -1)
python train_net.py --config "$WORK/base.yaml" --device cpu \
  CLOUD.Trainer CoinTrainer CLOUD.BURN_UP_STEP 2 \
  CLOUD.PROTOTYPE_UPDATE_START 1 SOLVER.MAX_ITER 4 \
  MODEL.WEIGHTS "$PRE_CKPT" \
  OUTPUT_DIR "$WORK/final"

echo "== eval (student) =="
python train_net.py --config "$WORK/base.yaml" --device cpu --eval-only \
  --resume CLOUD.Trainer CoinTrainer CLOUD.BURN_UP_STEP 2 \
  OUTPUT_DIR "$WORK/final"

echo "DEMO PIPELINE COMPLETE"
