"""Dual-teacher RPN, TPU-native.

Replaces coin/modeling/proposal_generator/rpn.py (DualTeacherRPN): the
standard RPN head + branch-aware anchor labeling:

- ``pre_train``: anchors labeled against the cached cloud RPN-view boxes.
- ``step_one/step_two``: labels come from the A (consistent) set; anchors
  whose best match is a C (private) box are *ignored* for the cls/loc loss
  but become distillation targets whose soft objectness is the C box's
  foreground probability mass (rpn.py:199-254; KL at :326-340).

All labeling is masked tensor math on a fixed anchor grid; sampling is the
balanced subsampler from coin_tpu.ops.matcher.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from coin_tpu.ops import boxes as box_ops
from coin_tpu.ops import losses as L
from coin_tpu.ops import matcher as M
from coin_tpu.ops import nms as nms_ops
from coin_tpu.structures import Detections

RPN_DELTA_WEIGHTS = (1.0, 1.0, 1.0, 1.0)


class RPNHead(nn.Module):
    """3x3 conv + two 1x1 heads (detectron2 StandardRPNHead)."""
    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray):
        # feat: (B, H, W, C)
        t = nn.Conv(feat.shape[-1], (3, 3), padding=1, name="conv",
                    dtype=self.dtype)(feat)
        t = nn.relu(t)
        obj = nn.Conv(self.num_anchors, (1, 1), name="objectness_logits",
                      dtype=self.dtype)(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="anchor_deltas",
                         dtype=self.dtype)(t)
        b, h, w, _ = obj.shape
        obj = obj.reshape(b, h * w * self.num_anchors)
        deltas = deltas.reshape(b, h * w * self.num_anchors, 4)
        return obj.astype(jnp.float32), deltas.astype(jnp.float32)


class RPNTargets(NamedTuple):
    labels: jnp.ndarray            # (R,) int8: -1 ignore / 0 neg / 1 pos
    matched_boxes: jnp.ndarray     # (R, 4) matched gt box per anchor
    distill_labels: jnp.ndarray    # (R,) bool: anchors distilled from C
    teacher_probs: jnp.ndarray     # (R,) soft objectness target


def label_anchors_single(anchors: jnp.ndarray, gt_a: Detections,
                         gt_c: Optional[Detections], rng: jax.Array,
                         batch_size: int = 256,
                         positive_fraction: float = 0.5,
                         thresholds=(0.3, 0.7)) -> RPNTargets:
    """Anchor labeling for one image.

    gt_a: the positive box set (pre_train: cached RPN boxes; step_*: A set).
    gt_c: the private set (step_* only) — matched anchors are ignored for
    cls/loc and receive soft distillation targets.
    """
    r = anchors.shape[0]
    if gt_c is not None:
        all_boxes = jnp.concatenate([gt_a.boxes, gt_c.boxes], axis=0)
        all_valid = jnp.concatenate([gt_a.valid, gt_c.valid], axis=0)
    else:
        all_boxes, all_valid = gt_a.boxes, gt_a.valid

    quality = box_ops.pairwise_iou(all_boxes, anchors)
    matched_idx, labels = M.match(quality, all_valid, thresholds,
                                  (0, -1, 1), allow_low_quality=True)

    na = gt_a.capacity

    def _take_small(table, idx):
        """table[idx] for a LARGE idx (one row per anchor) and a tiny
        table: an exact one-hot matmul. jnp.take at this shape lowers to
        a TPU gather custom-call (~ms per head per step — measured in
        the round-3 trace); the one-hot contraction rides the MXU and is
        bit-exact (each output row is a single product with 1.0)."""
        oh = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
        t2 = table[:, None] if table.ndim == 1 else table
        out = oh @ t2.astype(jnp.float32)
        return out[:, 0] if table.ndim == 1 else out

    if gt_c is not None:
        is_c = matched_idx >= na
        fg_c = is_c & (labels != 0)
        labels = jnp.where(fg_c, jnp.int8(-1), labels)
        # distillation: soft objectness = Σ fg probs of the matched C box
        c_fg_prob = jnp.sum(gt_c.probs[:, :-1], axis=-1)
        t_probs = jnp.where(fg_c,
                            _take_small(c_fg_prob,
                                        jnp.clip(matched_idx - na, 0,
                                                 None)),
                            0.0)
        distill = fg_c
        matched_idx = jnp.where(is_c, 0, matched_idx)
    else:
        distill = jnp.zeros((r,), bool)
        t_probs = jnp.zeros((r,), jnp.float32)

    # no positive gt at all (rpn.py:184-191, 244-248): everything ignored,
    # except — in the dual-teacher branch — anchors whose best match is a
    # C box yet labeled background stay negative
    any_a = jnp.any(gt_a.valid)
    if gt_c is not None:
        fallback = jnp.where(is_c & (labels == 0), jnp.int8(0),
                             jnp.int8(-1))
    else:
        fallback = jnp.full_like(labels, -1)
    labels = jnp.where(any_a, labels, fallback)

    pos, neg = M.subsample_labels(labels, batch_size, positive_fraction, rng)
    labels = jnp.where(pos, jnp.int8(1),
                       jnp.where(neg, jnp.int8(0), jnp.int8(-1)))
    matched_boxes = _take_small(gt_a.boxes,
                                jnp.clip(matched_idx, 0, na - 1))
    return RPNTargets(labels, matched_boxes, distill, t_probs)


def rpn_losses(anchors: jnp.ndarray, obj_logits: jnp.ndarray,
               deltas: jnp.ndarray, targets: RPNTargets,
               batch_size: int = 256, calc_bg: bool = True,
               with_distillation: bool = False) -> dict:
    """Batched RPN losses. obj_logits (B, R); deltas (B, R, 4); targets are
    batched RPNTargets (leading B on every field)."""
    labels = targets.labels
    num_images = labels.shape[0]
    pos = labels == 1
    valid = (labels >= 0) if calc_bg else pos

    # objectness BCE, sum over sampled anchors
    logp = jax.nn.log_sigmoid(obj_logits)
    log1mp = jax.nn.log_sigmoid(-obj_logits)
    y = (labels == 1).astype(jnp.float32)
    bce = -(y * logp + (1.0 - y) * log1mp)
    obj_loss = jnp.sum(jnp.where(valid, bce, 0.0))

    normalizer = batch_size * num_images
    cls_norm = normalizer if calc_bg else jnp.maximum(jnp.sum(valid), 1.0)

    gt_deltas = box_ops.encode_deltas(anchors[None], targets.matched_boxes,
                                      RPN_DELTA_WEIGHTS)
    loc = jnp.sum(L.smooth_l1(deltas, gt_deltas, beta=0.0), axis=-1)
    loc_loss = jnp.sum(jnp.where(pos, loc, 0.0))

    out = {
        "loss_rpn_cls": obj_loss / cls_norm,
        "loss_rpn_loc": loc_loss / normalizer,
    }

    if with_distillation:
        # KL between (p, 1-p) and (q, 1-q) on distilled anchors; torch
        # KLDivLoss(reduction='mean') averages over *elements* (2 per
        # anchor), coin rpn.py:326-340
        p = jax.nn.sigmoid(obj_logits)
        q = targets.teacher_probs
        mask = targets.distill_labels

        def kl_term(qq, pp):
            return qq * (jnp.log(jnp.maximum(qq, 1e-20))
                         - jnp.log(pp + 1e-7))
        kl = kl_term(q, p) + kl_term(1.0 - q, 1.0 - p)
        cnt = jnp.sum(mask)
        out["loss_rpn_distillation"] = jnp.where(
            cnt > 0, jnp.sum(jnp.where(mask, kl, 0.0))
            / jnp.maximum(2.0 * cnt, 1.0), 0.0)
    return out


def predict_proposals(anchors: jnp.ndarray, obj_logits: jnp.ndarray,
                      deltas: jnp.ndarray, image_hw: jnp.ndarray,
                      pre_nms_topk: int, post_nms_topk: int,
                      nms_thresh: float = 0.7,
                      min_size: float = 0.0) -> Detections:
    """Decode + topk + NMS → fixed post_nms_topk proposals per image.

    anchors (R,4); obj_logits (B,R); deltas (B,R,4); image_hw (B,2) true
    (unpadded) image sizes. Mirrors d2 find_top_rpn_proposals.
    """
    def single(obj, dl, hw):
        k = min(pre_nms_topk, obj.shape[0])
        scores, idx = jax.lax.top_k(obj, k)
        boxes = box_ops.decode_deltas(jnp.take(anchors, idx, axis=0),
                                      jnp.take(dl, idx, axis=0),
                                      RPN_DELTA_WEIGHTS)
        h, w = hw[0], hw[1]
        x1 = jnp.clip(boxes[:, 0], 0, w)
        y1 = jnp.clip(boxes[:, 1], 0, h)
        x2 = jnp.clip(boxes[:, 2], 0, w)
        y2 = jnp.clip(boxes[:, 3], 0, h)
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
        valid = ((x2 - x1) > min_size) & ((y2 - y1) > min_size) \
            & jnp.isfinite(scores)
        keep = nms_ops.nms_keep_mask(boxes, scores, valid, nms_thresh)
        kept_scores = jnp.where(keep, scores, nms_ops.NEG_INF)
        kk = min(post_nms_topk, kept_scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(kept_scores, kk)
        pad = post_nms_topk - kk
        if pad:
            top_scores = jnp.pad(top_scores, (0, pad),
                                 constant_values=nms_ops.NEG_INF)
            top_idx = jnp.pad(top_idx, (0, pad))
        top_valid = top_scores > nms_ops.NEG_INF / 2
        return Detections(
            boxes=jnp.take(boxes, top_idx, axis=0),
            scores=jnp.where(top_valid, top_scores, 0.0),
            classes=jnp.where(top_valid, 0, -1).astype(jnp.int32),
            valid=top_valid,
        )

    return jax.vmap(single)(obj_logits, deltas, image_hw)
