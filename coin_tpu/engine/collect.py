"""Collection passes (knowledge dissemination, stage 1).

Replaces the collector/processor stack (coin/modeling/meta_arch/
gdino_collector.py + gdino_processor.py + clip_collector.py):

- ``collect_cloud``: run a cloud detector once over a dataset; per image
  apply the Probabilistic-Fusion NMS (CLOUD.NMS_METHOD, collect threshold
  0.6) and split into the RCNN / RPN score-threshold views
  (gdino_processor.py:164-302); results go into a ResultStore
  (≙ GDINO_collect.pth).
- ``rescore_with_clip``: zero-shot CLIP re-scoring of every cached box —
  classes/scores/probs replaced, background-classified boxes dropped
  (clip_rcnn.py:106-132) — producing the offline-knowledge store the
  pre-train stage consumes (≙ CLIP_-000001.pth).

The cloud detector is a callable ``detect(images_u8, image_hw) →
batched Detections`` in canvas coordinates (see models/gdino.py); any
teacher backend (GDINO / GLIP / remote API) plugs in behind this
interface.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.data.loader import TestLoader
from coin_tpu.engine.results_store import ResultStore
from coin_tpu.ops import nms as nms_ops
from coin_tpu.structures import Detections

logger = logging.getLogger(__name__)

_NMS_METHODS = {"p": "probEn", "a": "avg", "m": "max"}
_BOX_METHODS = {"s": "s-avg", "a": "avg", "m": "max"}


def parse_nms_method(method: str):
    """coin/layers/nms.py:61-82 method-string semantics; 'nms' or
    ('mm') → plain hard NMS."""
    if method == "nms":
        return None
    assert len(method) == 2, method
    score_m = _NMS_METHODS[method[0]]
    box_m = _BOX_METHODS[method[1]]
    if score_m == "max" and box_m == "max":
        return None
    return score_m, box_m


def collect_cloud(detector: Callable, loader: TestLoader,
                  num_classes: int, nms_method: str = "ms",
                  collect_nms_thresh: float = 0.6,
                  rcnn_thresh: float = 0.25,
                  rpn_thresh: float = 0.25) -> ResultStore:
    """One pass of the cloud detector over ``loader``; detections are
    stored in ORIGINAL image coordinates."""
    store = ResultStore(num_classes)
    fusion = parse_nms_method(nms_method)

    @jax.jit
    def postprocess(det: Detections):
        if fusion is not None:
            return jax.vmap(lambda d: nms_ops.fusion_nms(
                d, collect_nms_thresh, fusion[0], fusion[1]))(det)
        keep = jax.vmap(lambda d: nms_ops.nms_keep_mask(
            d.boxes, d.scores, d.valid, collect_nms_thresh,
            classes=d.classes, plus1=True))(det)
        return det.mask(keep)

    for batch, n_valid in loader:
        dets = detector(jnp.asarray(batch.images),
                        jnp.asarray(batch.image_hw))
        dets = postprocess(dets)
        dets = jax.device_get(dets)
        for i in range(n_valid):
            valid = dets.valid[i]
            boxes = dets.boxes[i][valid] / batch.scale[i]  # → original
            classes = dets.classes[i][valid]
            scores = dets.scores[i][valid]
            probs = dets.probs[i][valid]
            for view, thresh in (("RCNN", rcnn_thresh),
                                 ("RPN", rpn_thresh)):
                keep = scores >= thresh
                store.put(batch.image_ids[i], view, boxes[keep],
                          classes[keep], scores[keep], probs[keep])
    logger.info("collected cloud results for %d images", len(store))
    return store


def rescore_with_clip(scorer_apply: Callable, store: ResultStore,
                      loader: TestLoader, capacity: int = 128
                      ) -> ResultStore:
    """CLIP re-scoring pass. ``scorer_apply(images, boxes)`` returns
    (B, N, C+1) probs for canvas-coordinate boxes."""
    out = ResultStore(store.num_classes)
    bg = store.num_classes
    for batch, n_valid in loader:
        packs = {view: [store.pack_view(
            batch.image_ids[i], view, capacity, float(batch.scale[i]),
            False, float(batch.image_hw[i][1]))
            for i in range(len(batch.image_ids))]
            for view in ("RCNN", "RPN")}
        for view in ("RCNN", "RPN"):
            boxes = jnp.asarray(np.stack([p["boxes"]
                                          for p in packs[view]]))
            probs = scorer_apply(jnp.asarray(batch.images), boxes)
            probs = np.asarray(probs)
            for i in range(n_valid):
                pv = packs[view][i]
                valid = pv["valid"]
                p = probs[i][valid]
                classes = p.argmax(-1)
                scores = p.max(-1)
                fg = classes != bg      # drop background-classified boxes
                out.put(batch.image_ids[i], view,
                        (pv["boxes"][valid] / batch.scale[i])[fg],
                        classes[fg], scores[fg], p[fg])
    logger.info("CLIP re-scored %d images", len(out))
    return out
