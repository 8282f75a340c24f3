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
                  rpn_thresh: float = 0.25,
                  collect_aug: str = "",
                  min_zoom: int = 320) -> ResultStore:
    """One pass of the cloud detector over ``loader``; detections are
    stored in ORIGINAL image coordinates.

    collect_aug: '' | 'ZOOM' | 'AUG' | 'ZOOM&AUG' — the optional extra
    collection views (OFF in the paper; gdino_processor.py:184-302).
    ZOOM runs the detector on a center crop and merges; AUG runs it on a
    photometric-augmented view and appends to the RPN view.
    """
    store = ResultStore(num_classes)
    fusion = parse_nms_method(nms_method)
    use_zoom = "ZOOM" in collect_aug
    use_aug = "AUG" in collect_aug

    @jax.jit
    def postprocess(det: Detections):
        if fusion is not None:
            return jax.vmap(lambda d: nms_ops.fusion_nms(
                d, collect_nms_thresh, fusion[0], fusion[1]))(det)
        # plain NMS path = detectron2 batched_nms (half-open IoU); the +1
        # convention is only used inside the fusion NMS
        keep = jax.vmap(lambda d: nms_ops.nms_keep_mask(
            d.boxes, d.scores, d.valid, collect_nms_thresh,
            classes=d.classes))(det)
        return det.mask(keep)

    for batch, n_valid in loader:
        dets = detector(jnp.asarray(batch.images),
                        jnp.asarray(batch.image_hw))
        aug_dets = None
        if use_aug:
            import jax.random as jrandom
            from coin_tpu.data.augment import strong_augment_single
            img = jnp.asarray(batch.images).astype(jnp.float32) / 255.0
            keys = jrandom.split(jrandom.key(0), img.shape[0])
            aug = jax.vmap(strong_augment_single)(img, keys)
            aug_u8 = (aug * 255.0).astype(jnp.uint8)
            aug_dets = jax.device_get(detector(
                aug_u8, jnp.asarray(batch.image_hw)))
        zoom_dets = None
        zoom_geom = []
        if use_zoom:
            from coin_tpu.engine.zoom_merge import center_zoom_box
            images = np.asarray(batch.images)
            crops = np.zeros_like(images)
            for i in range(images.shape[0]):
                ch, cw = int(batch.image_hw[i][0]), int(
                    batch.image_hw[i][1])
                x1, y1, zw, zh = center_zoom_box(ch, cw, min_zoom)
                zoom_geom.append((x1, y1, zw, zh))
                crops[i, :zh, :zw] = images[i, y1:y1 + zh, x1:x1 + zw]
            zoom_hw = jnp.asarray([[g[3], g[2]] for g in zoom_geom],
                                  jnp.float32)
            zoom_dets = jax.device_get(detector(jnp.asarray(crops),
                                                zoom_hw))
        dets = postprocess(dets)
        dets = jax.device_get(dets)
        for i in range(n_valid):
            valid = dets.valid[i]
            ori = {
                "boxes": dets.boxes[i][valid] / batch.scale[i],
                "scores": dets.scores[i][valid],
                "classes": dets.classes[i][valid],
                "probs": dets.probs[i][valid],
            }
            if zoom_dets is not None:
                from coin_tpu.engine.zoom_merge import merge_zoom
                zvalid = zoom_dets.valid[i]
                x1, y1, zw, zh = zoom_geom[i]
                s = batch.scale[i]
                zoom = {
                    "boxes": (zoom_dets.boxes[i][zvalid]
                              + np.asarray([x1, y1, x1, y1])) / s,
                    "scores": zoom_dets.scores[i][zvalid],
                    "classes": zoom_dets.classes[i][zvalid],
                    "probs": zoom_dets.probs[i][zvalid],
                }
                ori = merge_zoom(ori, zoom,
                                 (int(x1 / s), int(y1 / s),
                                  int(zw / s), int(zh / s)))
            for view, thresh in (("RCNN", rcnn_thresh),
                                 ("RPN", rpn_thresh)):
                keep = ori["scores"] >= thresh
                boxes = ori["boxes"][keep]
                classes = ori["classes"][keep]
                scores = ori["scores"][keep]
                probs = ori["probs"][keep]
                if view == "RPN" and aug_dets is not None:
                    avalid = aug_dets.valid[i]
                    akeep = aug_dets.scores[i][avalid] >= thresh
                    boxes = np.concatenate(
                        [boxes, (aug_dets.boxes[i][avalid]
                                 / batch.scale[i])[akeep]])
                    classes = np.concatenate(
                        [classes, aug_dets.classes[i][avalid][akeep]])
                    scores = np.concatenate(
                        [scores, aug_dets.scores[i][avalid][akeep]])
                    probs = np.concatenate(
                        [probs, aug_dets.probs[i][avalid][akeep]])
                store.put(batch.image_ids[i], view, boxes, classes,
                          scores, probs)
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
