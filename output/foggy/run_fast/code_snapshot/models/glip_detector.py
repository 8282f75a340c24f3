"""GLIP detector adapter: anchors, decoding, NMS, caption handling.

Mirrors the reference's GLIP wrapper semantics (coin/modeling/meta_arch/
glip.py + glip_model.py): class-name caption, per-phrase token positive
map, sigmoid token logits → per-class scores (max over the phrase's
tokens), centerness-weighted, ATSS anchor decoding, class-aware NMS;
labels are 0-based and probabilities synthesized from scores
(glip.py:96-105 → gdino_variants.synthetic_probs).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.models.gdino_detector import (build_captions_and_spans,
                                            positive_map_from_spans)
from coin_tpu.models.gdino_variants import synthetic_probs
from coin_tpu.ops import boxes as box_ops
from coin_tpu.ops import nms as nms_ops
from coin_tpu.structures import Detections

ANCHOR_SIZES = (64, 128, 256, 512, 1024)   # octave base per level (ATSS)
STRIDES = (8, 16, 32, 64, 128)
DELTA_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def glip_anchors(shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    out = []
    for (h, w), stride, size in zip(shapes, STRIDES, ANCHOR_SIZES):
        sy, sx = np.meshgrid(np.arange(h) * stride + stride // 2,
                             np.arange(w) * stride + stride // 2,
                             indexing="ij")
        half = size / 2.0
        a = np.stack([sx - half, sy - half, sx + half, sy + half],
                     axis=-1).reshape(-1, 4)
        out.append(a.astype(np.float32))
    return np.concatenate(out, axis=0)


def postprocess_glip(logits: jnp.ndarray, deltas: jnp.ndarray,
                     centerness: jnp.ndarray, anchors: jnp.ndarray,
                     positive_map: jnp.ndarray, image_hw: jnp.ndarray,
                     num_classes: int, threshold: float = 0.25,
                     pre_topk: int = 1000, capacity: int = 256,
                     nms_thresh: float = 0.6) -> Detections:
    """One image (R anchors): token logits (R, T) → per-class scores via
    the phrase max, × centerness; top-k → decode → class-aware NMS."""
    sig = jax.nn.sigmoid(logits)
    # per-class score: max over the phrase's tokens (GLIP convention)
    pm = positive_map > 0
    cls_scores = jnp.max(
        jnp.where(pm[None, :, :], sig[:, None, :], 0.0), axis=-1)
    cls_scores = cls_scores * jax.nn.sigmoid(centerness)[:, None]
    scores = jnp.max(cls_scores, axis=-1)
    classes = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)

    k = min(pre_topk, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    boxes = box_ops.decode_deltas(jnp.take(anchors, idx, axis=0),
                                  jnp.take(deltas, idx, axis=0),
                                  DELTA_WEIGHTS)
    h, w = image_hw[0], image_hw[1]
    boxes = jnp.stack([jnp.clip(boxes[:, 0], 0, w),
                       jnp.clip(boxes[:, 1], 0, h),
                       jnp.clip(boxes[:, 2], 0, w),
                       jnp.clip(boxes[:, 3], 0, h)], axis=-1)
    cls_top = jnp.take(classes, idx)
    valid = top_scores > threshold
    keep = nms_ops.nms_keep_mask(boxes, top_scores, valid, nms_thresh,
                                 classes=cls_top)
    det = Detections(boxes=boxes, scores=jnp.where(keep, top_scores, 0.0),
                     classes=jnp.where(keep, cls_top, -1), valid=keep,
                     probs=None)
    order = jnp.argsort(~det.valid, stable=True)[:capacity]
    det = det.gather(order, jnp.take(det.valid, order))
    probs = synthetic_probs(det.classes, det.scores, num_classes,
                            det.valid)
    return det.replace(probs=probs)


class GLIPDetector:
    """Callable cloud-detector backend (engine/collect.py interface)."""

    IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
    IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

    def __init__(self, model, params, bert_apply: Callable,
                 class_names: Sequence[str], tokenizer,
                 threshold: float = 0.25, capacity: int = 256):
        self.model = model
        self.params = params
        self.bert_apply = bert_apply
        self.num_classes = len(class_names)
        self.threshold = threshold
        self.capacity = capacity
        _, ids, spans = build_captions_and_spans(class_names, tokenizer)
        self.text_ids = np.asarray(ids)[None]
        self.text_mask = np.ones((1, len(ids)), bool)
        self.positive_map = positive_map_from_spans(spans, len(ids))

        @jax.jit
        def _run(images, image_hw):
            embeds = self.bert_apply(jnp.asarray(self.text_ids),
                                     jnp.asarray(self.text_mask))
            b = images.shape[0]
            embeds = jnp.broadcast_to(embeds, (b,) + embeds.shape[1:])
            mask = jnp.broadcast_to(jnp.asarray(self.text_mask),
                                    (b, self.text_ids.shape[1]))
            logits, deltas, centerness, shapes = self.model.apply(
                {"params": self.params}, images, embeds, mask)
            anchors = jnp.asarray(glip_anchors(shapes))
            pm = jnp.asarray(self.positive_map)
            return jax.vmap(
                lambda lg, dl, ct, hw: postprocess_glip(
                    lg, dl, ct, anchors, pm, hw, self.num_classes,
                    self.threshold, capacity=self.capacity)
            )(logits, deltas, centerness, image_hw)

        self._run = _run

    def __call__(self, images_u8, image_hw) -> Detections:
        img = images_u8.astype(jnp.float32) / 255.0
        img = (img - self.IMAGENET_MEAN) / self.IMAGENET_STD
        return self._run(img, image_hw)
