#!/usr/bin/env python
"""Collection pass CLI: run the cloud teacher over the unlabeled train set
and write the collect stores (stage 1, knowledge dissemination).

Produces:
  $OUTPUT_DIR/GDINO_collect.npz   — raw cloud detections (online teacher)
  $OUTPUT_DIR/CLIP_collect.npz    — CLIP-rescored detections (offline
                                    knowledge for pre-training)

Requires user-supplied weights: MODEL.TEACHER_CLOUD.WEIGHT (GroundingDINO
checkpoint) + TPU.BERT_VOCAB (BERT vocab.txt) + TPU.CLIP_WEIGHTS /
TPU.CLIP_BPE_VOCAB for the re-scoring pass.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--skip-clip", action="store_true",
                   help="only the raw cloud collection")
    p.add_argument("--synthetic-teacher", action="store_true",
                   help="random-weight tiny GDINO + stub CLIP scorer — "
                        "zero-asset pipeline rehearsal (no checkpoints "
                        "needed; detections are meaningless)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args(argv)

    import jax
    # honor JAX_PLATFORMS even when a sitecustomize pins an accelerator
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from coin_tpu.config import load_config
    from coin_tpu.data.loader import TestLoader
    from coin_tpu.data.voc import get_dataset, register_pascal_voc
    from coin_tpu.engine import collect as collect_mod

    logging.basicConfig(level=logging.INFO)
    cfg = load_config(args.config, args.opts)
    for spec in cfg.DATASETS.get("CUSTOM", []):
        register_pascal_voc(spec["NAME"], spec["DIRNAME"], spec["SPLIT"],
                            spec["CLASSES"], spec.get("EXT", ".jpg"))
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    train_name = cfg.DATASETS.TRAIN_UNLABEL[0]
    spec = get_dataset(train_name)
    class_names = spec.class_names

    # --- cloud teacher backend ---
    arch = cfg.MODEL.TEACHER_CLOUD.META_ARCHITECTURE
    loader = TestLoader(train_name, cfg.DATASETS.ROOT, batch_size=4,
                        min_size=cfg.INPUT.TEACHER_CLOUD.MIN_SIZE_TEST,
                        max_size=cfg.INPUT.TEACHER_CLOUD.MAX_SIZE_TEST
                        if "MAX_SIZE_TEST" in cfg.INPUT.TEACHER_CLOUD
                        else 1333)
    if args.synthetic_teacher:
        detector = build_synthetic_detector(class_names)
    else:
        detector = build_cloud_detector(cfg, arch, class_names)

    store = collect_mod.collect_cloud(
        detector, loader, len(class_names),
        nms_method=cfg.CLOUD.NMS_METHOD,
        collect_aug=cfg.INPUT.TEACHER_CLOUD.get("COLLECT_AUG", ""),
        min_zoom=cfg.INPUT.TEACHER_CLOUD.get("MIN_CENTER_ZOOM_SIZE", 320),
        collect_nms_thresh=cfg.CLOUD.TEACHER_CLOUD.COLLECT_NMS_THRESH,
        rcnn_thresh=cfg.CLOUD.TEACHER_CLOUD.RCNN_THRESH,
        rpn_thresh=cfg.CLOUD.TEACHER_CLOUD.RPN_THRESH
        if cfg.CLOUD.TEACHER_CLOUD.RPN_SEPARATE_COLLECT
        else cfg.CLOUD.TEACHER_CLOUD.RCNN_THRESH)
    out = os.path.join(cfg.OUTPUT_DIR, f"{arch}_collect.npz")
    store.save(out)
    print(f"saved cloud collection: {out}")

    if args.skip_clip:
        return

    # --- CLIP re-scoring pass ---
    if args.synthetic_teacher:
        scorer_apply = build_stub_scorer(len(class_names))
    else:
        scorer_apply = build_clip_scorer(cfg, class_names)
    clip_store = collect_mod.rescore_with_clip(
        scorer_apply, store, loader,
        capacity=cfg.get_path("TPU.CAP_TEACHER", 128))
    out2 = os.path.join(cfg.OUTPUT_DIR, "CLIP_collect.npz")
    clip_store.save(out2)
    print(f"saved CLIP-rescored collection: {out2}")


from coin_tpu.engine.cloud_factory import (  # noqa: E402
    build_cloud_detector, build_clip_scorer, build_stub_scorer,
    build_synthetic_detector)


if __name__ == "__main__":
    main()
