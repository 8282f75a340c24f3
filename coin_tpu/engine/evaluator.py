"""Evaluation loop: jitted batched inference + host-side VOC accumulation
(replaces BASE_Trainer.test + inference_on_dataset, coin/engine/base.py:
151-204)."""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.data.augment import normalize_batch
from coin_tpu.data.loader import TestLoader
from coin_tpu.engine import pipelines
from coin_tpu.evaluation import VOCEvaluator

logger = logging.getLogger(__name__)


_INFER_CACHE: dict = {}


def _infer_for(model, cfg: pipelines.PipelineConfig):
    """Jitted inference memoized on (model, cfg) — both frozen
    dataclasses. Variables/tokens are CALL ARGUMENTS: a per-call
    closure would bake the weights in as HLO constants, forcing a full
    recompile (and relay round-trip) on every periodic eval."""
    try:
        fn = _INFER_CACHE.get((model, cfg))
    except TypeError:  # unhashable model/cfg variant — build fresh
        fn = None
    if fn is None:
        @jax.jit
        def fn(variables, images_u8, image_hw, tokens):
            images = normalize_batch(images_u8)
            return pipelines.inference(model, variables, images,
                                       image_hw, tokens, cfg)
        try:
            _INFER_CACHE[(model, cfg)] = fn
        except TypeError:
            pass
    return fn


def evaluate_detector(model, variables, loader: TestLoader,
                      class_tokens: np.ndarray,
                      cfg: pipelines.PipelineConfig,
                      save_pkl: Optional[str] = None) -> Dict[str, float]:
    tokens = jnp.asarray(class_tokens)
    infer = _infer_for(model, cfg)

    evaluator = VOCEvaluator(loader.spec.class_names)
    for batch, n_valid in loader:
        dets = infer(variables, jnp.asarray(batch.images),
                     jnp.asarray(batch.image_hw), tokens)
        dets = jax.device_get(dets)
        for i in range(n_valid):
            valid = dets.valid[i]
            boxes = dets.boxes[i][valid] / batch.scale[i]
            scores = dets.scores[i][valid]
            classes = dets.classes[i][valid]
            gt_valid = batch.gt_valid[i]
            evaluator.process(
                batch.image_ids[i], boxes, scores, classes,
                batch.gt_boxes[i][gt_valid] / batch.scale[i],
                batch.gt_classes[i][gt_valid],
                batch.gt_difficult[i][gt_valid])
    if save_pkl:
        from coin_tpu.evaluation.dump import save_detections_pkl
        save_detections_pkl(evaluator, save_pkl)
        logger.info("dumped detections to %s", save_pkl)
    results = evaluator.evaluate()
    logger.info("eval: AP50=%.2f AP=%.2f", results["AP50"], results["AP"])
    return results
