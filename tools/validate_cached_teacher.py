#!/usr/bin/env python
"""Cached-vs-live teacher A/B (VERDICT round-1 item 5).

TPU.CACHE_TEACHER serves the FROZEN pre-burn-up teacher's predictions
from a one-time collection cache instead of recomputing the forward every
step (engine/trainer.py train_step_cached). On flipped samples the cache
is re-projected, so equality holds only up to the detector's flip
equivariance. This script trains two CoinTrainer runs on synthetic VOC —
identical seeds/data, cache on vs off, flips enabled — and compares the
AP50 trajectories to decide whether the approximation is benign.

  python tools/validate_cached_teacher.py [--iters 400] [--eval-every 100]
      [--images 40] [--out /tmp/cached_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_cfg(root, out, iters, eval_every, batch=2):
    from coin_tpu.config import load_config
    cfg = load_config()
    cfg.DATASETS.ROOT = root
    cfg.DATASETS.TRAIN_UNLABEL = ["abtrain"]
    cfg.DATASETS.TEST = ["abval"]
    cfg.OUTPUT_DIR = out
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = batch
    cfg.SOLVER.MAX_ITER = iters
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 50
    cfg.SOLVER.STEPS = [10 ** 9]
    cfg.SOLVER.FACTOR_LIST = [1, 0.1]
    cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9
    cfg.TEST.EVAL_PERIOD = eval_every
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.INPUT.MIN_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE = 128
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.MERGE_DIM = 1024
    cfg.TPU.TEXT_LAYERS = 2
    cfg.TPU.TEXT_WIDTH = 64
    cfg.TPU.TEXT_HEADS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.CAP_TEACHER = 16
    cfg.TPU.CAP_C = 16
    # all iterations pre-burn-up: the cache only ever serves step_one
    cfg.CLOUD.BURN_UP_STEP = iters + 1
    cfg.CLOUD.PROTOTYPE_UPDATE_START = 50
    return cfg


def synth_store(records, num_classes, seed=3):
    import numpy as np
    from coin_tpu.engine.results_store import ResultStore
    rng = np.random.RandomState(seed)
    store = ResultStore(num_classes)
    for rec in records:
        boxes = rec["boxes"] + rng.uniform(-3, 3, rec["boxes"].shape)
        n = len(boxes)
        probs = np.full((n, num_classes + 1), 0.04, np.float32)
        scores = rng.uniform(0.5, 0.95, n).astype(np.float32)
        for i, c in enumerate(rec["classes"]):
            probs[i, c] = scores[i]
        probs /= probs.sum(1, keepdims=True)
        for view in ("RCNN", "RPN"):
            store.put(rec["image_id"], view, boxes, rec["classes"],
                      probs.max(1), probs)
    return store


def pretrain(cfg, store, iters):
    """Stage-2 CLIPDET pre-train on the synthetic store — the adaptation
    A/B must start from a sane offline teacher (from random init the
    A-set is empty and every arm flatlines at AP 0)."""
    from coin_tpu.engine.pre_train import PRETrainer
    cfg = cfg.clone()
    cfg.SOLVER.MAX_ITER = iters
    tr = PRETrainer(cfg, store=store)
    tr.train()
    ap = tr.test()["AP50"]
    ckpt = os.path.join(cfg.OUTPUT_DIR, "checkpoints",
                        f"pre_train_CLIP_{iters:07d}")
    return ckpt, ap


def run_one(cfg, store, cache: bool, fast_head: bool = False,
            weights: str = ""):
    from coin_tpu.engine.trainer import CoinTrainer
    cfg = cfg.clone()
    cfg.TPU.CACHE_TEACHER = bool(cache)
    cfg.TPU.CACHE_TEACHER_MIN_STEPS = 1
    cfg.TPU.TEACHER_FAST_HEAD = bool(fast_head)
    if weights:
        cfg.MODEL.WEIGHTS = weights
    tr = CoinTrainer(cfg, store=store)
    tr.resume_or_load(False)
    t0 = time.perf_counter()
    tr.train()
    dt = time.perf_counter() - t0
    return {str(k): v for k, v in tr.ap_50_student.items()}, dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--images", type=int, default=40)
    p.add_argument("--pre-iters", type=int, default=600,
                   help="CLIPDET pretrain iterations before the A/B")
    p.add_argument("--seeds", type=int, default=1,
                   help="repeat the A/B over N seeds and aggregate "
                        "(single-seed AP on tiny synthetic data is "
                        "±tens of AP noisy)")
    p.add_argument("--out", default="/tmp/cached_ab.json")
    p.add_argument("--mode", choices=("cache", "fasthead", "roibatch"),
                   default="cache",
                   help="cache: cached vs live teacher (both exact "
                        "head). fasthead: live fast-head teacher vs "
                        "live exact teacher (cache off). roibatch: "
                        "half the student ROI batch vs full (cached "
                        "teacher both).")
    args = p.parse_args(argv)

    import logging
    logging.basicConfig(level=logging.INFO)
    import tempfile

    from coin_tpu.data import voc as voc_mod
    from coin_tpu.data.voc import load_voc_instances, make_synthetic_voc

    root = tempfile.mkdtemp(prefix="ab_data_")
    classes = ("car", "person")
    make_synthetic_voc(os.path.join(root, "synth/VOC2007"),
                       num_images=args.images, split="train")
    make_synthetic_voc(os.path.join(root, "synth/VOC2007"),
                       num_images=max(args.images // 2, 8), split="val",
                       seed=7)
    voc_mod.register_pascal_voc("abtrain", "synth/VOC2007", "train",
                                classes, ".jpg")
    voc_mod.register_pascal_voc("abval", "synth/VOC2007", "val", classes,
                                ".jpg")
    records = load_voc_instances(os.path.join(root, "synth/VOC2007"),
                                 "train", classes, ".jpg")
    store = synth_store(records, num_classes=len(classes))

    def run_seed(seed_idx):
        out_pre = tempfile.mkdtemp(prefix="ab_pre_")
        out_base = tempfile.mkdtemp(prefix="ab_base_")
        out_var = tempfile.mkdtemp(prefix="ab_var_")
        cfg_pre = build_cfg(root, out_pre, args.pre_iters, 10 ** 9)
        cfg_base = build_cfg(root, out_base, args.iters, args.eval_every)
        cfg_var = build_cfg(root, out_var, args.iters, args.eval_every)
        for c in (cfg_pre, cfg_base, cfg_var):
            c.SEED = 2024 + 101 * seed_idx

        ckpt, pre_ap = pretrain(cfg_pre, store, args.pre_iters)
        print(f"[seed {seed_idx}] pretrain AP50 = {pre_ap:.2f}")

        if args.mode == "cache":
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      weights=ckpt)
            var_ap, var_t = run_one(cfg_var, store, cache=True,
                                    weights=ckpt)
            names = ("live", "cached")
        elif args.mode == "fasthead":  # exact vs fast teacher head, live
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      fast_head=False, weights=ckpt)
            var_ap, var_t = run_one(cfg_var, store, cache=False,
                                    fast_head=True, weights=ckpt)
            names = ("exact_head", "fast_head")
        else:  # roibatch: student ROI batch halved (512→256 production)
            base_ap, base_t = run_one(cfg_base, store, cache=True,
                                      weights=ckpt)
            cfg_half = cfg_var.clone()
            cfg_half.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE //= 2
            var_ap, var_t = run_one(cfg_half, store, cache=True,
                                    weights=ckpt)
            names = ("roi_full", "roi_half")
        return names, pre_ap, base_ap, var_ap, base_t, var_t

    per_seed = []
    for s in range(args.seeds):
        names, pre_ap, base_ap, var_ap, base_t, var_t = run_seed(s)
        keys = sorted(set(base_ap) & set(var_ap), key=int)
        final_key = keys[-1] if keys else None
        per_seed.append({
            "seed": s, "pretrain_ap50": pre_ap,
            f"{names[0]}_ap50": base_ap, f"{names[1]}_ap50": var_ap,
            "final_base": base_ap.get(final_key),
            "final_var": var_ap.get(final_key),
            f"{names[0]}_seconds": base_t, f"{names[1]}_seconds": var_t,
        })

    import numpy as np
    fb = [r["final_base"] for r in per_seed if r["final_base"] is not None]
    fv = [r["final_var"] for r in per_seed if r["final_var"] is not None]
    report = {
        "mode": args.mode, "iters": args.iters,
        "pretrain_iters": args.pre_iters, "seeds": args.seeds,
        "arms": list(names),
        "final_base_mean": float(np.mean(fb)) if fb else None,
        "final_base_std": float(np.std(fb)) if fb else None,
        "final_var_mean": float(np.mean(fv)) if fv else None,
        "final_var_std": float(np.std(fv)) if fv else None,
        "final_delta_mean": (float(np.mean(fv) - np.mean(fb))
                             if fb and fv else None),
        "per_seed": per_seed,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "per_seed"}, indent=2))


if __name__ == "__main__":
    main()
