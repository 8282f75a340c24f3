"""Eval-only trainers (replaces coin/engine/test.py: GDINOTrainer /
GLIPTrainer / CLIPTrainer / ModelZoo_test dispatch).

- ``StoreEvalTrainer`` evaluates cached collect results (a ResultStore)
  against a dataset's GT — the collector ``test()`` path of
  gdino_collector.py:88-92 (and the ModelZoo verification flow).
- ``CLIPZeroShotTrainer`` re-scores cached cloud boxes with the frozen
  CLIP scorer and evaluates the result (CLIPTrainer.collect_results →
  test, coin/engine/test.py:124-162). The collection pass itself lives in
  engine/collect.py.
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import numpy as np

from coin_tpu.data.voc import get_dataset, load_voc_instances
from coin_tpu.engine.results_store import ResultStore
from coin_tpu.evaluation import VOCEvaluator

logger = logging.getLogger(__name__)


class StoreEvalTrainer:
    """Evaluate a ResultStore's RCNN view against a VOC dataset."""

    def __init__(self, cfg, view: str = "RCNN"):
        self.cfg = cfg
        self.view = view
        path = cfg.get_path("CLOUD.COLLECT_FILE", "")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "StoreEvalTrainer needs CLOUD.COLLECT_FILE pointing at a "
                "collected ResultStore (.npz)")
        self.store = ResultStore.load(path)

    def resume_or_load(self, resume: bool = False):
        pass

    def test(self) -> Dict[str, float]:
        name = self.cfg.DATASETS.TEST[0]
        spec = get_dataset(name)
        records = load_voc_instances(
            os.path.join(self.cfg.DATASETS.ROOT, spec.dirname), spec.split,
            spec.class_names, spec.image_ext)
        evaluator = VOCEvaluator(spec.class_names)
        missing = 0
        for rec in records:
            if rec["image_id"] not in self.store:
                missing += 1
                continue
            view = self.store.get_view(rec["image_id"], self.view)
            evaluator.process(rec["image_id"], view["boxes"],
                              view["scores"], view["classes"],
                              rec["boxes"], rec["classes"],
                              rec["difficult"])
        if missing:
            logger.warning("%d/%d images missing from the store", missing,
                           len(records))
        return evaluator.evaluate()


class CloudLiveEvalTrainer:
    """Run the cloud model LIVE over ``DATASETS.TEST`` and evaluate VOC
    mAP — the reference's GDINOTrainer/GLIPTrainer.test flow
    (coin/engine/test.py:72-102 with GDINOMapper input sizes): no prior
    collect artifact needed. ``TPU.SYNTHETIC_TEACHER`` swaps in the
    random-weight rehearsal detector (zero-asset environments)."""

    def __init__(self, cfg):
        self.cfg = cfg

    def resume_or_load(self, resume: bool = False):
        pass

    def test(self) -> Dict[str, float]:
        import jax
        import jax.numpy as jnp

        from coin_tpu.data.loader import TestLoader
        from coin_tpu.engine.cloud_factory import (build_cloud_detector,
                                                   build_synthetic_detector)

        cfg = self.cfg
        name = cfg.DATASETS.TEST[0]
        spec = get_dataset(name)
        # teacher-cloud input sizes (INPUT.TEACHER_CLOUD.*, the
        # reference's GDINOMapper resize)
        tc = cfg.INPUT.TEACHER_CLOUD
        loader = TestLoader(
            name, cfg.DATASETS.ROOT,
            batch_size=cfg.get_path("TEST.IMS_PER_BATCH", 4),
            min_size=tc.MIN_SIZE_TEST,
            max_size=cfg.get_path("INPUT.TEACHER_CLOUD.MAX_SIZE_TEST",
                                  cfg.INPUT.MAX_SIZE))
        if cfg.get_path("TPU.SYNTHETIC_TEACHER", False):
            detector = build_synthetic_detector(spec.class_names)
        else:
            detector = build_cloud_detector(
                cfg, cfg.MODEL.TEACHER_CLOUD.META_ARCHITECTURE,
                spec.class_names)

        records = {rec["image_id"]: rec for rec in load_voc_instances(
            os.path.join(cfg.DATASETS.ROOT, spec.dirname), spec.split,
            spec.class_names, spec.image_ext)}
        evaluator = VOCEvaluator(spec.class_names)
        for batch, n_valid in loader:
            dets = jax.device_get(detector(jnp.asarray(batch.images),
                                           jnp.asarray(batch.image_hw)))
            for i in range(n_valid):
                rec = records[batch.image_ids[i]]
                valid = dets.valid[i]
                evaluator.process(
                    rec["image_id"],
                    dets.boxes[i][valid] / batch.scale[i],
                    dets.scores[i][valid], dets.classes[i][valid],
                    rec["boxes"], rec["classes"], rec["difficult"])
        return evaluator.evaluate()


def build_eval_trainer(cfg, name: str):
    if name in ("GDINO_test", "GLIP_test"):
        # a collected store evaluates directly; otherwise run the cloud
        # model live on the val split (the reference's one-shot
        # test/GDINO.sh flow needs no prior artifact either)
        path = cfg.get_path("CLOUD.COLLECT_FILE", "")
        if path and os.path.exists(path):
            return StoreEvalTrainer(cfg)
        return CloudLiveEvalTrainer(cfg)
    if name == "CLIP_test":
        return StoreEvalTrainer(cfg)  # CLIP-rescored store via COLLECT_FILE
    raise ValueError(name)
