#!/usr/bin/env bash
# Batch-scaled adaptation (TPU throughput recipe): stage 1 runs the
# cached step_one phase at per-chip batch 6 (linear-scaling rule),
# stage 2 resumes the SAME TrainState for the live step_two phase at
# the reference's batch 3. Images seen and LR-vs-images-seen match
# foggy.yaml exactly; per-phase A/B evidence in bench_artifacts/
# (see the config headers). Reference flow: scripts/GDINO/final/
# targetDET.sh as a single 65k-iteration run.
set -e
python train_net.py --config configs/coin/GDINO/foggy_fast_b6.yaml \
    CLOUD.Trainer CoinTrainer "$@"
python train_net.py --config configs/coin/GDINO/foggy_fast_b6_s2.yaml \
    --resume CLOUD.Trainer CoinTrainer "$@"
