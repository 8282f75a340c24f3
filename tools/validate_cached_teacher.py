#!/usr/bin/env python
"""Paired-seed AP A/B harness for throughput knobs (VERDICT items).

Every semantic knob in the bench recipe must carry an A/B artifact:
this script trains paired CoinTrainer runs on synthetic VOC — identical
seeds/data order in both arms — and compares final AP50 across seeds.

Design (pre-registered, round 3):
  - paired arms: same SEED, same data order, same pretrain checkpoint.
  - N seeds (default 8); per-seed delta = var - base.
  - EXCLUSION RULE (fixed before running): a seed is excluded from the
    aggregate iff its CLIPDET pretrain AP50 < 10.0 — both arms then
    start from a non-functional offline teacher and the A/B is
    undefined there. Excluded seeds stay in the JSON, flagged.
  - aggregate: mean delta over functional seeds with a 95% t-interval;
    "pass" = the CI excludes a loss worse than -2 AP50.

Modes:
  aa       — A/A noise calibration: BOTH arms run the identical recipe;
             the variant arm's init params are perturbed by 1e-6
             relative noise (the minimal numeric difference any real
             knob introduces). The measured |delta| distribution IS the
             fixture's noise floor — the harness can only adjudicate
             knobs whose true effect exceeds it.
  cache    — cached vs live teacher (TPU.CACHE_TEACHER; both exact head)
  fasthead — live fast-head teacher vs live exact teacher
  roibatch — half student ROI batch vs full (cached teacher both)
  budget   — teacher post-NMS budget halved vs default (the
             foggy_fast.yaml TPU.TEACHER_POST_NMS_TOPK=512 knob at
             fixture scale: post 64 -> 32, pre 256 -> 128)
  batch    — per-chip batch doubled with linearly scaled LR and halved
             iterations (same images seen) vs the base recipe — the
             TPU batch-scaling question (BENCH.md batch-6 lever)
  refresh  — step_two live per-step teacher vs TEACHER_REFRESH_EPOCHS=4
             (predictions from a periodic batched collection pass)

Fixtures:
  v2 — the round-2/3 fixture (64 flat-color train images, 32 eval,
       final-eval primary endpoint). Measured noise floor ±6.5–16 AP50
       — kept only to reproduce the old campaigns.
  v3 — round-4 (DEFAULT): 512 rich multi-scale train images
       (make_synthetic_voc_rich), 256 eval, fixture-scale anchors
       [8,16,32,64], longer pretrain, PRIMARY ENDPOINT = mean AP50 of
       the last 3 evals (pre-registered; the final single eval is
       retained as secondary). Calibrate with --mode aa before trusting
       any verdict.

  python tools/validate_cached_teacher.py --mode aa --seeds 8 \
      --platform cpu --out bench_artifacts/ab_aa_v3_s8.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# two-sided 95% t critical values, df = n-1
_T95 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
        7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228, 11: 2.201, 12: 2.179,
        13: 2.160, 14: 2.145, 15: 2.131}

EXCLUDE_PRETRAIN_AP_BELOW = 10.0  # pre-registered exclusion rule


def build_cfg(root, out, iters, eval_every, batch=2, base_lr=0.02,
              fixture="v2"):
    from coin_tpu.config import load_config
    cfg = load_config()
    if fixture == "v3":
        # anchors matched to the v3 object-scale spectrum (12–56 px on
        # the 120×160 canvas ≈ 10–45 px after the 0.8 resize); the v2
        # default [32..512] leaves small objects reachable only through
        # the forced best-match anchor
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [8, 16, 32, 64]
    cfg.DATASETS.ROOT = root
    cfg.DATASETS.TRAIN_UNLABEL = ["abtrain"]
    cfg.DATASETS.TEST = ["abval"]
    cfg.OUTPUT_DIR = out
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = batch
    cfg.SOLVER.MAX_ITER = iters
    cfg.SOLVER.BASE_LR = base_lr
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


def run_one(cfg, store, cache: bool, weights: str = "",
            perturb: bool = False):
    from coin_tpu.engine.trainer import CoinTrainer
    cfg = cfg.clone()
    cfg.TPU.CACHE_TEACHER = bool(cache)
    cfg.TPU.CACHE_TEACHER_MIN_STEPS = 1
    if weights:
        cfg.MODEL.WEIGHTS = weights
    tr = CoinTrainer(cfg, store=store)
    tr.resume_or_load(False)
    if perturb:
        # A/A variant arm: 1e-6 relative noise on every float param —
        # the scale of numeric difference a semantically-neutral knob
        # (recompiled executable, reassociated reduction) introduces.
        import jax
        import jax.numpy as jnp
        leaves, treedef = jax.tree.flatten(tr.state.params)
        keys = jax.random.split(jax.random.key(cfg.SEED + 777),
                                len(leaves))
        leaves = [
            l * (1 + 1e-6 * jax.random.normal(k, l.shape, l.dtype))
            if jnp.issubdtype(l.dtype, jnp.floating) else l
            for l, k in zip(leaves, keys)]
        params = jax.tree.unflatten(treedef, leaves)
        tr.state = tr.state.replace(
            params=params,
            teacher_params=jax.tree.map(jnp.copy, params))
    t0 = time.perf_counter()
    tr.train()
    dt = time.perf_counter() - t0
    return {str(k): v for k, v in tr.ap_50_student.items()}, dt


# Modes whose BASE arm is the standard cached fp recipe (cfg_base,
# cache=True, pretrain weights) — exactly these can share one base run
# (and one pretrain) per seed in --multi sweeps. Bespoke-base modes
# (cache, fasthead, budget, refresh*, shipped, batch_live) cannot.
STD_BASE_MODES = ("aa", "roibatch", "roibatch75", "int8train",
                  "int8train_wx", "int8train_ps", "int8train_fo",
                  "int8train_ps_roi", "batch")


def std_var(mode, cfg_base, cfg_var, args, root):
    """Arm names + variant-arm runner for a standard-base mode.

    The knob semantics live HERE (single definition used by both the
    single-mode path and --multi sweeps):
      aa           — identical recipe, init perturbed 1e-6 (noise floor)
      roibatch     — student ROI batch halved
      roibatch75   — student ROI batch x0.75 (production 512->384)
      int8train    — TPU.INT8_TRAIN full (int8 fwd+dgrad+wgrad; var arm
                     also evaluates int8 for train/test consistency)
      int8train_wx — int8 fwd+dgrad, bit-exact wgrad (the round-4
                     attribution variant)
      int8train_ps — per-SAMPLE activation/gradient scales + exact
                     wgrad (TPU.INT8_TRAIN_SCALE: sample) — the
                     finer-forward-quantization lever staged when wx
                     localized the ~-1 AP50 cost to per-tensor
                     activation scales
      int8train_fo — int8 per-sample FORWARD only, exact dgrad+wgrad
                     (TPU.INT8_TRAIN_DGRAD: false) — the most
                     conservative staged probe
      int8train_ps_roi — the ps recipe plus int8 RoIAlign
                     (TPU.INT8_ROI) — the round-5 bandwidth lever;
                     adjudicates the pooling quantization on top of
                     per-sample int8 res5
      batch        — per-chip batch doubled, linear LR, half the
                     iterations (same images seen)
    """
    if mode == "aa":
        return ("aa_base", "aa_perturbed"), (
            lambda store, ckpt: run_one(cfg_var, store, cache=True,
                                        weights=ckpt, perturb=True))
    if mode == "roibatch":
        cfg_var.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE //= 2
        names = ("roi_full", "roi_half")
    elif mode == "roibatch75":
        cfg_var.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = (
            cfg_var.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE * 3) // 4
        names = ("roi_full", "roi_75")
    elif mode == "int8train":
        cfg_var.TPU.INT8_TRAIN = True
        names = ("fp_train", "int8_train")
    elif mode == "int8train_wx":
        cfg_var.TPU.INT8_TRAIN = True
        cfg_var.TPU.INT8_TRAIN_WGRAD = False
        names = ("fp_train", "int8wx_train")
    elif mode == "int8train_ps":
        cfg_var.TPU.INT8_TRAIN = True
        cfg_var.TPU.INT8_TRAIN_WGRAD = False
        cfg_var.TPU.INT8_TRAIN_SCALE = "sample"
        names = ("fp_train", "int8ps_train")
    elif mode == "int8train_ps_roi":
        cfg_var.TPU.INT8_TRAIN = True
        cfg_var.TPU.INT8_TRAIN_WGRAD = False
        cfg_var.TPU.INT8_TRAIN_SCALE = "sample"
        cfg_var.TPU.INT8_ROI = True
        names = ("fp_train", "int8psroi_train")
    elif mode == "int8train_fo":
        cfg_var.TPU.INT8_TRAIN = True
        cfg_var.TPU.INT8_TRAIN_WGRAD = False
        cfg_var.TPU.INT8_TRAIN_SCALE = "sample"
        cfg_var.TPU.INT8_TRAIN_DGRAD = False
        names = ("fp_train", "int8fo_train")
    elif mode == "batch":
        cfg_dbl = build_cfg(root, cfg_var.OUTPUT_DIR, args.iters // 2,
                            max(args.eval_every // 2, 1),
                            batch=2 * cfg_base.SOLVER
                            .IMG_PER_BATCH_UNLABEL,
                            base_lr=2 * cfg_base.SOLVER.BASE_LR,
                            fixture=args.fixture)
        cfg_dbl.SEED = cfg_var.SEED
        cfg_dbl.SOLVER.WARMUP_ITERS = cfg_base.SOLVER.WARMUP_ITERS // 2
        return ("batch_base", "batch_double"), (
            lambda store, ckpt: run_one(cfg_dbl, store, cache=True,
                                        weights=ckpt))
    else:
        raise ValueError(f"not a standard-base mode: {mode}")
    return names, (lambda store, ckpt: run_one(cfg_var, store,
                                               cache=True, weights=ckpt))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fixture", choices=("v2", "v3"), default="v3",
                   help="v3 (round 4): rich 512-image fixture, smoothed "
                        "primary endpoint; v2 reproduces the round-2/3 "
                        "campaigns")
    p.add_argument("--iters", type=int, default=None,
                   help="adaptation iters per arm (default: v2 400, "
                        "v3 800)")
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--images", type=int, default=None,
                   help="fixture train images (default: v2 64, v3 512)")
    p.add_argument("--eval-images", type=int, default=None,
                   help="held-out eval images (default: images//2)")
    p.add_argument("--pre-iters", type=int, default=None,
                   help="CLIPDET pretrain iterations before the A/B "
                        "(default: v2 800, v3 2000)")
    p.add_argument("--seeds", type=int, default=8,
                   help="paired seeds; per-seed AP on tiny synthetic "
                        "data swings tens of AP, so the aggregate is "
                        "what decides")
    p.add_argument("--out", default="/tmp/cached_ab.json")
    p.add_argument("--seed-start", type=int, default=0,
                   help="first seed index to run (earlier seeds come "
                        "from --resume-from)")
    p.add_argument("--resume-from", default="",
                   help="prior .partial artifact whose per_seed entries "
                        "(seeds < --seed-start) are merged into the "
                        "aggregate — lets a cut-short campaign continue "
                        "without redoing chip time")
    p.add_argument("--mode", choices=("aa", "cache", "fasthead",
                                      "roibatch", "budget", "batch",
                                      "batch_live", "refresh",
                                      "refresh_int8", "roibatch75",
                                      "int8train", "int8train_wx",
                                      "int8train_ps", "int8train_fo",
                                      "int8train_ps_roi", "shipped",
                                      "shipped_i8"),
                   default="cache")
    p.add_argument("--multi", default="",
                   help="run SEVERAL standard-base campaigns over "
                        "shared seeds in one process, e.g. "
                        "'int8train_ps:0-15,aa:8-15:bench_artifacts/"
                        "ab_aa_v3_s8.json' — per seed the pretrain and "
                        "the cached-fp base arm run once and are "
                        "shared; per-mode artifacts are written as "
                        "ab_<mode>_<fixture>_s<N>.json next to --out. "
                        "Ranges are inclusive; a third ':path' field "
                        "resumes prior seeds below the range start. "
                        "Overrides --mode/--seeds/--seed-start.")
    p.add_argument("--platform", default="",
                   help="force a JAX platform (e.g. cpu): the A/B is an "
                        "ACCURACY comparison — both arms on the same "
                        "platform are valid evidence, and cpu runs "
                        "avoid the remote-TPU relay's per-step "
                        "round-trip tax and free the chip for perf "
                        "work")
    args = p.parse_args(argv)

    # fixture-resolved defaults (pre-registered per fixture version)
    v3 = args.fixture == "v3"
    if args.iters is None:
        args.iters = 800 if v3 else 400
    if args.images is None:
        args.images = 512 if v3 else 64
    if args.pre_iters is None:
        args.pre_iters = 2000 if v3 else 800
    if args.eval_images is None:
        args.eval_images = max(args.images // 2, 8)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import logging
    logging.basicConfig(level=logging.INFO)
    import tempfile

    from coin_tpu.utils.setup import enable_compile_cache
    enable_compile_cache()

    from coin_tpu.data import voc as voc_mod
    from coin_tpu.data.voc import (load_voc_instances, make_synthetic_voc,
                                   make_synthetic_voc_rich)

    root = tempfile.mkdtemp(prefix="ab_data_")
    classes = ("car", "person")
    gen = make_synthetic_voc_rich if v3 else make_synthetic_voc
    gen(os.path.join(root, "synth/VOC2007"),
        num_images=args.images, split="train")
    gen(os.path.join(root, "synth/VOC2007"),
        num_images=args.eval_images, split="val", seed=7)
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
        cfg_pre = build_cfg(root, out_pre, args.pre_iters, 10 ** 9,
                            fixture=args.fixture)
        cfg_base = build_cfg(root, out_base, args.iters, args.eval_every,
                             fixture=args.fixture)
        cfg_var = build_cfg(root, out_var, args.iters, args.eval_every,
                            fixture=args.fixture)
        for c in (cfg_pre, cfg_base, cfg_var):
            c.SEED = 2024 + 101 * seed_idx

        ckpt, pre_ap = pretrain(cfg_pre, store, args.pre_iters)
        print(f"[seed {seed_idx}] pretrain AP50 = {pre_ap:.2f}")

        if args.mode in STD_BASE_MODES:
            # standard-base knobs (knob semantics defined once, in
            # std_var): base arm = cached fp recipe; aa's var arm =
            # same recipe with 1e-6-perturbed init (noise floor)
            names, runner = std_var(args.mode, cfg_base, cfg_var,
                                    args, root)
            base_ap, base_t = run_one(cfg_base, store, cache=True,
                                      weights=ckpt)
            var_ap, var_t = runner(store, ckpt)
        elif args.mode == "cache":
            names = ("live", "cached")
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      weights=ckpt)
            var_ap, var_t = run_one(cfg_var, store, cache=True,
                                    weights=ckpt)
        elif args.mode == "fasthead":  # exact vs fast teacher head, live
            names = ("exact_head", "fast_head")
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      weights=ckpt)
            cfg_var.TPU.TEACHER_FAST_HEAD = True
            var_ap, var_t = run_one(cfg_var, store, cache=False,
                                    weights=ckpt)
        elif args.mode == "refresh":
            # step_two teacher-refresh lever (TPU.TEACHER_REFRESH_EPOCHS):
            # live per-step teacher vs predictions refreshed by a batched
            # collection pass every 4 epochs. Both arms all-step_two
            # (BURN_UP_STEP=0) — the knob only exists post-burn-up.
            names = ("live_two", "refresh_two")
            cfg_base.CLOUD.BURN_UP_STEP = 0
            cfg_var.CLOUD.BURN_UP_STEP = 0
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      weights=ckpt)
            cfg_var.TPU.TEACHER_REFRESH_EPOCHS = 4
            var_ap, var_t = run_one(cfg_var, store, cache=False,
                                    weights=ckpt)
        elif args.mode == "refresh_int8":
            # the SHIPPED refresh recipe with int8 collection vs exact
            # live step_two: adjudicates refresh staleness AND the
            # dynamic-int8 teacher quantization together (the combined
            # semantics of TEACHER_REFRESH_EPOCHS=4 + INT8_COLLECT).
            names = ("live_two", "refresh_int8_two")
            cfg_base.CLOUD.BURN_UP_STEP = 0
            cfg_var.CLOUD.BURN_UP_STEP = 0
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      weights=ckpt)
            cfg_var.TPU.TEACHER_REFRESH_EPOCHS = 4
            cfg_var.TPU.INT8_COLLECT = True
            var_ap, var_t = run_one(cfg_var, store, cache=False,
                                    weights=ckpt)
        elif args.mode == "budget":
            # fixture-scale image of foggy_fast.yaml's teacher budget
            # (post-NMS 1000 -> 512, pre-NMS 6000 -> 3000): halve the
            # teacher's proposal budget only. Live teacher both arms
            # (the knob only matters for the live phase).
            names = ("budget_full", "budget_half")
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      weights=ckpt)
            cfg_var.TPU.TEACHER_PRE_NMS_TOPK = 128
            cfg_var.TPU.TEACHER_POST_NMS_TOPK = 32
            var_ap, var_t = run_one(cfg_var, store, cache=False,
                                    weights=ckpt)
        elif args.mode in ("shipped", "shipped_i8"):
            # the FULL shipped foggy_fast recipe vs strict parity, at
            # fixture scale, with the production phase split (step_one
            # ≈ 2/3 of images cached, step_two ≈ 1/3 refreshed): one
            # joint adjudication of the stacked knobs that each PASSed
            # alone (cached step_one, teacher budget 512, refresh-4 +
            # int8 collection). Per-knob −2 margins cannot bound the
            # stack — three individually-passing −0.5 costs would blow
            # the ±0.3 Foggy parity budget (VERDICT r4 weak-3).
            # shipped_i8 additionally stacks the int8 training knob
            # (TPU.INT8_TRAIN, full: int8 fwd+dgrad+wgrad) — the
            # round-5 shipped recipe after --mode int8train PASSed at
            # n=16 (+0.24, CI [-0.77,+1.24], ab_int8train_v3_s16);
            # adjudicating the stack it actually ships in.
            names = ("parity", args.mode)
            bu = (args.iters * 2) // 3
            cfg_base.CLOUD.BURN_UP_STEP = bu
            cfg_var.CLOUD.BURN_UP_STEP = bu
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      weights=ckpt)
            cfg_var.TPU.TEACHER_PRE_NMS_TOPK = 128
            cfg_var.TPU.TEACHER_POST_NMS_TOPK = 32
            cfg_var.TPU.TEACHER_REFRESH_EPOCHS = 4
            cfg_var.TPU.INT8_COLLECT = True
            if args.mode == "shipped_i8":
                cfg_var.TPU.INT8_TRAIN = True
            var_ap, var_t = run_one(cfg_var, store, cache=True,
                                    weights=ckpt)
        else:  # batch_live: both arms with the LIVE teacher (step_two
            # phase) — the cached-phase variant is the std 'batch' mode;
            # a mixed-batch recipe needs each phase's own verdict.
            assert args.mode == "batch_live", args.mode
            names = ("batch_base_live", "batch_double_live")
            base_ap, base_t = run_one(cfg_base, store, cache=False,
                                      weights=ckpt)
            cfg_dbl = build_cfg(root, cfg_var.OUTPUT_DIR,
                                args.iters // 2,
                                max(args.eval_every // 2, 1),
                                batch=2 * cfg_base.SOLVER
                                .IMG_PER_BATCH_UNLABEL,
                                base_lr=2 * cfg_base.SOLVER.BASE_LR,
                                fixture=args.fixture)
            cfg_dbl.SEED = cfg_var.SEED
            cfg_dbl.SOLVER.WARMUP_ITERS = \
                cfg_base.SOLVER.WARMUP_ITERS // 2
            var_ap, var_t = run_one(cfg_dbl, store, cache=False,
                                    weights=ckpt)
        return names, pre_ap, base_ap, var_ap, base_t, var_t

    if args.multi:
        run_multi(args, root, store)
        return

    per_seed = []
    names = None
    if args.resume_from:
        names, per_seed = load_resume(args.resume_from, args.mode,
                                      args.fixture, args.seed_start)

    for s in range(args.seed_start, args.seeds):
        names, pre_ap, base_ap, var_ap, base_t, var_t = run_seed(s)
        row = seed_row(names, s, pre_ap, base_ap, var_ap, base_t, var_t)
        per_seed.append(row)
        print(f"[seed {s}] final {names[0]}={row['final_base']} "
              f"{names[1]}={row['final_var']}"
              f"{' EXCLUDED (pretrain flatlined)' if row['excluded'] else ''}")
        write_partial(args.out, args.mode, args, names, per_seed)

    aggregate_and_write(args.mode, args, args.out, names, per_seed)


def last_k_mean(ap, k=3):
    """Secondary endpoint (pre-registered for round-3+ seeds): mean
    AP50 over the last k evals — a single final eval on this tiny
    fixture swings tens of AP in the last 100 iters (the cache A/B's
    seed-0 collapse, the budget A/B's seed-4 flip), so a smoothed
    endpoint separates knob effects from late-fixture noise. For
    fixture v3 this IS the primary endpoint (pre-registered round 4);
    for v2 the final eval stays primary for comparability."""
    if not ap:
        return None
    vals = [ap[k2] for k2 in sorted(ap, key=int)[-k:]]
    return float(sum(vals) / len(vals))


def seed_row(names, s, pre_ap, base_ap, var_ap, base_t, var_t):
    fb = base_ap[max(base_ap, key=int)] if base_ap else None
    fv = var_ap[max(var_ap, key=int)] if var_ap else None
    ab, av = last_k_mean(base_ap), last_k_mean(var_ap)
    return {
        "seed": s, "pretrain_ap50": pre_ap,
        "excluded": pre_ap < EXCLUDE_PRETRAIN_AP_BELOW,
        f"{names[0]}_ap50": base_ap, f"{names[1]}_ap50": var_ap,
        "final_base": fb, "final_var": fv,
        "delta": (fv - fb) if fb is not None and fv is not None
        else None,
        "avg3_base": ab, "avg3_var": av,
        "delta_avg3": (av - ab) if ab is not None and av is not None
        else None,
        f"{names[0]}_seconds": base_t, f"{names[1]}_seconds": var_t,
    }


def load_resume(path, mode, fixture, seed_start):
    with open(path) as f:
        prior = json.load(f)
    assert prior["mode"] == mode, "resume artifact mode mismatch"
    assert prior.get("fixture", "v2") == fixture, \
        "resume artifact fixture mismatch"
    per_seed = [r for r in prior["per_seed"] if r["seed"] < seed_start]
    print(f"[resume] {mode}: merged {len(per_seed)} prior seeds from "
          f"{path}")
    return tuple(prior["arms"]), per_seed


def write_partial(out, mode, args, names, per_seed, seeds=None):
    """Incremental artifact: a cut-short campaign still leaves
    analyzable per-seed evidence, self-describing enough for a resume
    consumer to verify the setup matched (eval-set size, seed plan,
    platform — round-4 advisor finding)."""
    import jax as _jax
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out + ".partial", "w") as f:
        json.dump({"mode": mode, "fixture": args.fixture,
                   "iters": args.iters,
                   "pretrain_iters": args.pre_iters,
                   "images": args.images,
                   "eval_images": args.eval_images,
                   "seeds": seeds or args.seeds,
                   "platform": (args.platform
                                or _jax.default_backend()),
                   "arms": list(names),
                   "completed_seeds": len(per_seed),
                   "per_seed": per_seed}, f, indent=2)


def parse_multi(spec):
    """'mode:LO-HI[:resume.json]' comma-list; HI inclusive."""
    out = []
    for part in spec.split(","):
        bits = part.split(":")
        lo, hi = (int(x) for x in bits[1].split("-"))
        out.append({"mode": bits[0], "lo": lo, "hi": hi + 1,
                    "resume": bits[2] if len(bits) > 2 else ""})
    return out


def run_multi(args, root, store):
    """Sweep several STANDARD-BASE campaign modes over shared seeds in
    one process: per seed, the CLIPDET pretrain and the cached-fp base
    arm run ONCE and every active mode's variant arm is paired against
    that same base realization. Statistically each campaign's per-seed
    delta distribution is unchanged (the pairing is what matters);
    operationally this cuts a k-mode sweep's chip time ~(2+k)/(1+k/3)x
    and — because all arms run in one process — keeps exactly the
    same cross-arm determinism guarantees as the single-mode harness.
    Artifacts disclose the sharing (base_arm_shared)."""
    import tempfile

    specs = parse_multi(args.multi)
    for sp in specs:
        assert sp["mode"] in STD_BASE_MODES, \
            f"--multi supports standard-base modes only, got {sp}"
        sp["rows"], sp["names"] = [], None
        sp["out"] = os.path.join(
            os.path.dirname(os.path.abspath(args.out)),
            f"ab_{sp['mode']}_{args.fixture}_s{sp['hi']}.json")
        if sp["resume"]:
            sp["names"], sp["rows"] = load_resume(
                sp["resume"], sp["mode"], args.fixture, sp["lo"])

    for s in range(min(sp["lo"] for sp in specs),
                   max(sp["hi"] for sp in specs)):
        active = [sp for sp in specs if sp["lo"] <= s < sp["hi"]]
        if not active:
            continue
        cfg_pre = build_cfg(root, tempfile.mkdtemp(prefix="ab_pre_"),
                            args.pre_iters, 10 ** 9,
                            fixture=args.fixture)
        cfg_base = build_cfg(root, tempfile.mkdtemp(prefix="ab_base_"),
                             args.iters, args.eval_every,
                             fixture=args.fixture)
        for c in (cfg_pre, cfg_base):
            c.SEED = 2024 + 101 * s
        ckpt, pre_ap = pretrain(cfg_pre, store, args.pre_iters)
        print(f"[seed {s}] pretrain AP50 = {pre_ap:.2f} (shared by "
              f"{[sp['mode'] for sp in active]})", flush=True)
        base_ap, base_t = run_one(cfg_base, store, cache=True,
                                  weights=ckpt)
        for sp in active:
            cfg_var = build_cfg(root,
                                tempfile.mkdtemp(prefix="ab_var_"),
                                args.iters, args.eval_every,
                                fixture=args.fixture)
            cfg_var.SEED = 2024 + 101 * s
            names, runner = std_var(sp["mode"], cfg_base, cfg_var,
                                    args, root)
            var_ap, var_t = runner(store, ckpt)
            sp["names"] = names
            row = seed_row(names, s, pre_ap, base_ap, var_ap,
                           base_t, var_t)
            row["base_shared"] = True
            sp["rows"].append(row)
            print(f"[seed {s}] {sp['mode']}: final {names[0]}="
                  f"{row['final_base']} {names[1]}={row['final_var']}"
                  f" d_avg3={row['delta_avg3']}", flush=True)
            write_partial(sp["out"], sp["mode"], args, names,
                          sp["rows"], seeds=sp["hi"])

    shared_note = ("pretrain + cached-fp base arm run once per seed, "
                   "shared across modes "
                   + str([sp["mode"] for sp in specs])
                   + " (same-process pairing; per-campaign delta "
                     "distributions unchanged)")
    for sp in specs:
        aggregate_and_write(sp["mode"], args, sp["out"], sp["names"],
                            sp["rows"], seeds=sp["hi"],
                            extra={"base_arm_shared": shared_note})


def aggregate_and_write(mode, args, out, names, per_seed, seeds=None,
                        extra=None):
    import numpy as np
    v3 = args.fixture == "v3"
    used = [r for r in per_seed
            if not r["excluded"] and r["delta"] is not None]
    deltas = [r["delta"] for r in used]
    n = len(deltas)
    mean = float(np.mean(deltas)) if n else None
    sd = float(np.std(deltas, ddof=1)) if n > 1 else None
    half = (_T95.get(n - 1, 1.96) * sd / math.sqrt(n)
            if n > 1 else None)
    ci = ([mean - half, mean + half] if half is not None else None)

    # secondary (smoothed) endpoint over seeds that carry it
    d3 = [r["delta_avg3"] for r in used if r.get("delta_avg3") is not None]
    n3 = len(d3)
    mean3 = float(np.mean(d3)) if n3 else None
    sd3 = float(np.std(d3, ddof=1)) if n3 > 1 else None
    half3 = (_T95.get(n3 - 1, 1.96) * sd3 / math.sqrt(n3)
             if n3 > 1 else None)
    ci3 = ([mean3 - half3, mean3 + half3] if half3 is not None else None)
    # Primary endpoint (pre-registered): v2 campaigns keep the final
    # single eval (comparability with rounds 2-3); v3 campaigns use the
    # SMOOTHED endpoint (mean AP50 of the last 3 evals) — the round-3
    # campaigns showed single final evals swing tens of AP in the last
    # 100 iters on the small fixture.
    if v3:
        p_mean, p_sd, p_ci = mean3, sd3, ci3
        primary = "avg3"
    else:
        p_mean, p_sd, p_ci = mean, sd, ci
        primary = "final"
    report = {
        "mode": mode, "fixture": args.fixture, "iters": args.iters,
        "pretrain_iters": args.pre_iters, "images": args.images,
        "eval_images": args.eval_images,
        "seeds": seeds or args.seeds, "arms": list(names),
        "exclusion_rule": f"pretrain AP50 < {EXCLUDE_PRETRAIN_AP_BELOW}"
                          " (pre-registered)",
        "n_functional": n,
        "excluded_seeds": [r["seed"] for r in per_seed if r["excluded"]],
        "primary_endpoint": primary,
        "delta_mean": mean, "delta_sd": sd, "delta_ci95": ci,
        "delta_avg3_mean": mean3, "delta_avg3_sd": sd3,
        "delta_avg3_ci95": ci3, "n_avg3": n3,
        # per-endpoint sign counts, so prose summaries cannot silently
        # quote the wrong endpoint's tally (the round-4 roibatch75
        # write-up swapped endpoints — VERDICT r4 weak-1)
        "n_positive_primary": sum(
            1 for d in (d3 if v3 else deltas) if d > 0),
        "n_negative_primary": sum(
            1 for d in (d3 if v3 else deltas) if d < 0),
        "n_positive_secondary": sum(
            1 for d in (deltas if v3 else d3) if d > 0),
        "n_negative_secondary": sum(
            1 for d in (deltas if v3 else d3) if d < 0),
        "avg3_note": "mean AP50 of the last 3 evals per arm — the "
                     "PRIMARY endpoint for fixture v3 (pre-registered "
                     "round 4); secondary for v2, where the verdict "
                     "stays the final-eval rule for comparability.",
        "final_base_mean": float(np.mean([r["final_base"]
                                          for r in used])) if n else None,
        "final_var_mean": float(np.mean([r["final_var"]
                                         for r in used])) if n else None,
        "verdict": (None if p_ci is None else
                    ("PASS" if p_ci[0] > -2.0 else
                     ("FAIL" if p_ci[1] < 0.0 else "INCONCLUSIVE"))),
        "verdict_rule": f"on the {primary} endpoint: PASS iff CI95 lower"
                        " bound > -2 AP50; FAIL iff CI95 upper bound"
                        " < 0",
        "per_seed": per_seed,
    }
    if extra:
        report.update(extra)
    if mode == "aa":
        # noise-floor statement: the fixture can adjudicate knobs whose
        # true effect exceeds ~the CI half-width at the campaign's n
        report["noise_floor_sd"] = p_sd
        report["noise_floor_ok"] = (p_sd is not None and p_sd <= 2.0)
        report["verdict"] = None
        report["verdict_rule"] = ("aa mode measures the noise floor; "
                                  "target: primary-endpoint delta SD "
                                  "<= 2 AP50")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "per_seed"}, indent=2))


if __name__ == "__main__":
    main()
