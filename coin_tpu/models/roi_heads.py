"""Res5 ROI heads + FastRCNN output layers, TPU-native.

Covers the reference's OpenVocabularyRes5ROIHeads + FastRCNNOutputLayers
(coin/modeling/roi_heads/clip_roi_heads.py, fast_rcnn.py): RoIAlign(res4) →
res5 → mean/attention pool → `trans` MLP → cosine classification against
learnable-prompt text features, class-agnostic box regression, and the full
branch-aware loss stack (pre_train / step_one / step_two).

Everything that was per-image Python lists of Instances is a fixed-size
sampled proposal block with group tags:

    group: 0 = A/fg, 1 = B (inconsistent), 2 = background, -1 = padding
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
from coin_tpu.ops.roi_align import roi_align
from coin_tpu.structures import Detections

GROUP_A = 0
GROUP_B = 1
GROUP_BG = 2
GROUP_PAD = -1

BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class BoxPredictor(nn.Module):
    """FastRCNNOutputLayers' neural part (fast_rcnn.py:318-353):
    trans 3-layer MLP → cls_score (to text dim) + bbox_pred; classification
    is cosine similarity with text features divided by a fixed logit scale
    (0.01)."""
    text_dim: int
    box_dim: int = 4            # class-agnostic regression
    logit_scale: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d = x.shape[-1]
        h = nn.Dense(d // 2, name="trans_0")(x)
        h = nn.leaky_relu(h)
        h = nn.Dense(d // 2, name="trans_1")(h)
        h = nn.leaky_relu(h)
        h = nn.Dense(d, name="trans_2")(h)
        class_feats = nn.Dense(self.text_dim, name="cls_score",
                               kernel_init=nn.initializers.normal(0.01))(h)
        deltas = nn.Dense(self.box_dim, name="bbox_pred",
                          kernel_init=nn.initializers.normal(0.001))(h)
        return class_feats, deltas

    def classify(self, class_feats: jnp.ndarray,
                 text_features: jnp.ndarray) -> jnp.ndarray:
        """cosine(image, text) / logit_scale → (N, C+1) raw scores."""
        img = class_feats / jnp.maximum(
            jnp.linalg.norm(class_feats, axis=-1, keepdims=True), 1e-8)
        txt = text_features / jnp.maximum(
            jnp.linalg.norm(text_features, axis=-1, keepdims=True), 1e-8)
        return (img @ txt.T) / self.logit_scale


# ------------------------------------------------------------------ #
# proposal sampling (label_and_sample_proposals, masked)
# ------------------------------------------------------------------ #
class SampledProposals(NamedTuple):
    boxes: jnp.ndarray           # (S, 4)
    group: jnp.ndarray           # (S,) int8
    gt_boxes: jnp.ndarray        # (S, 4) matched target box
    cls_offline: jnp.ndarray     # (S,) int32 (bg rows = num_classes)
    cls_online: jnp.ndarray      # (S,) int32
    probs_offline: jnp.ndarray   # (S, C+1)
    probs_online: jnp.ndarray    # (S, C+1)


def _empty_probs(n, c1):
    return jnp.zeros((n, c1), jnp.float32)


def sample_proposals_single(
    proposals: Detections,
    gt_a: Detections,
    gt_b: Optional[Tuple[Detections, jnp.ndarray, jnp.ndarray]],
    gt_c: Optional[Detections],
    num_classes: int,
    rng: jax.Array,
    batch_size: int = 512,
    positive_fraction: float = 0.25,
    iou_threshold: float = 0.5,
    b_cls_online: Optional[jnp.ndarray] = None,
    b_probs_online: Optional[jnp.ndarray] = None,
    append_gt: bool = True,
    bg_train: bool = True,
) -> SampledProposals:
    """One image's ROI sampling.

    pre_train: gt_a = cached RCNN detections (classes/probs = offline);
               gt_b = gt_c = None.
    step_*:    gt_a = A set (classes + online/offline probs);
               gt_b = B set (Detections whose .classes = offline classes,
               .probs = offline probs) with b_cls_online / b_probs_online;
               gt_c = C set (ignored rows, never sampled).
    Mirrors clip_roi_heads.py:282-399.
    """
    c1 = num_classes + 1
    cand = proposals
    if append_gt:
        from coin_tpu import structures as S
        cand = S.concatenate(cand, gt_a.replace(probs=None))
        if gt_b is not None:
            cand = S.concatenate(cand, gt_b.replace(probs=None))

    # gt union: [A; B; C]
    parts_boxes = [gt_a.boxes]
    parts_valid = [gt_a.valid]
    if gt_b is not None:
        parts_boxes.append(gt_b.boxes)
        parts_valid.append(gt_b.valid)
    if gt_c is not None:
        parts_boxes.append(gt_c.boxes)
        parts_valid.append(gt_c.valid)
    union_boxes = jnp.concatenate(parts_boxes, axis=0)
    union_valid = jnp.concatenate(parts_valid, axis=0)

    na = gt_a.capacity
    nb = gt_b.capacity if gt_b is not None else 0

    quality = box_ops.pairwise_iou(union_boxes, cand.boxes)
    quality = jnp.where(cand.valid[None, :], quality, 0.0)
    matched_idx, matched_labels = M.match(
        quality, union_valid, (iou_threshold,), (0, 1),
        allow_low_quality=False)

    if gt_c is not None:
        is_c = matched_idx >= na + nb
        fg_c = is_c & (matched_labels != 0)
        matched_labels = jnp.where(fg_c, jnp.int8(-1), matched_labels)

    # invalid candidate rows can never be sampled
    matched_labels = jnp.where(cand.valid, matched_labels, jnp.int8(-1))

    pos, neg = M.subsample_labels(matched_labels, batch_size,
                                  positive_fraction, rng)
    sampled = pos | neg
    # compact sampled rows to the front, fixed size S = batch_size
    order = jnp.argsort(~sampled, stable=True)[:batch_size]
    sel_valid = jnp.take(sampled, order)

    boxes = jnp.take(cand.boxes, order, axis=0)
    midx = jnp.take(matched_idx, order)
    is_pos = jnp.take(pos, order)

    in_a = is_pos & (midx < na)
    in_b = is_pos & (midx >= na) & (midx < na + nb) if gt_b is not None \
        else jnp.zeros_like(in_a)
    is_bg = jnp.take(neg, order)

    group = jnp.full((batch_size,), GROUP_PAD, jnp.int8)
    group = jnp.where(in_a & sel_valid, jnp.int8(GROUP_A), group)
    group = jnp.where(in_b & sel_valid, jnp.int8(GROUP_B), group)
    if bg_train:
        group = jnp.where(is_bg & sel_valid, jnp.int8(GROUP_BG), group)

    a_idx = jnp.clip(midx, 0, na - 1)
    gt_boxes = jnp.take(gt_a.boxes, a_idx, axis=0)
    cls_off = jnp.take(gt_a.classes, a_idx)
    probs_off = (jnp.take(gt_a.probs, a_idx, axis=0)
                 if gt_a.probs is not None else _empty_probs(batch_size, c1))
    # online view of A: identical classes, online probs if provided
    cls_on = cls_off
    probs_on = probs_off

    if gt_b is not None:
        b_idx = jnp.clip(midx - na, 0, nb - 1)
        inb = in_b
        gt_boxes = jnp.where(inb[:, None],
                             jnp.take(gt_b.boxes, b_idx, axis=0), gt_boxes)
        cls_off = jnp.where(inb, jnp.take(gt_b.classes, b_idx), cls_off)
        probs_off = jnp.where(inb[:, None],
                              jnp.take(gt_b.probs, b_idx, axis=0), probs_off)
        cls_on = jnp.where(inb, jnp.take(b_cls_online, b_idx), cls_on)
        probs_on = jnp.where(inb[:, None],
                             jnp.take(b_probs_online, b_idx, axis=0),
                             probs_on)

    bg_cls = jnp.int32(num_classes)
    is_fg = (group == GROUP_A) | (group == GROUP_B)
    cls_off = jnp.where(is_fg, cls_off, bg_cls)
    cls_on = jnp.where(is_fg, cls_on, bg_cls)
    # padding rows: mark with -1 so losses can mask them
    cls_off = jnp.where(group == GROUP_PAD, -1, cls_off)
    cls_on = jnp.where(group == GROUP_PAD, -1, cls_on)

    return SampledProposals(boxes, group, gt_boxes, cls_off, cls_on,
                            probs_off, probs_on)


# ------------------------------------------------------------------ #
# losses
# ------------------------------------------------------------------ #
def one_hot_c1(classes: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(jnp.clip(classes, 0, num_classes),
                          num_classes + 1, dtype=jnp.float32)


def classification_loss(scores: jnp.ndarray, sp: SampledProposals,
                        num_classes: int, bg_weight: float,
                        loss_type: str = "MILCrossEntropy",
                        classes_weight: Optional[jnp.ndarray] = None,
                        prob_weighted: bool = False) -> jnp.ndarray:
    """MIL CE over fg(A)+bg rows (fast_rcnn.py:461-475 / class_cross_loss).
    ``prob_weighted`` selects the clipart variant class_cross_loss1
    (targets scaled by max offline prob; avg_positives=False)."""
    rows = (sp.group == GROUP_A) | (sp.group == GROUP_BG)
    target = one_hot_c1(sp.cls_offline, num_classes)
    weights = jnp.where(sp.group == GROUP_BG, bg_weight, 1.0)
    if prob_weighted:
        fg = sp.group == GROUP_A
        scale = jnp.where(fg, jnp.max(sp.probs_offline, axis=-1), 1.0)
        target = target * scale[:, None]
        return L.mil_cross_entropy(scores, target, rows, weights=weights,
                                   avg_positives=False)
    if loss_type == "MILFocalLoss":
        return L.mil_focal_loss(scores, target, rows, alpha=classes_weight,
                                avg_positives=True)
    return L.mil_cross_entropy(scores, target, rows, weights=weights,
                               avg_positives=True)


def box_reg_loss(sp: SampledProposals, deltas: jnp.ndarray,
                 num_classes: int, use_online_classes: bool = True,
                 normalizer: Optional[float] = None) -> jnp.ndarray:
    """Smooth-l1 box regression over fg rows, normalized by the total
    sampled count (fast_rcnn.py:601-646).

    ``deltas`` is (S, 4) for class-agnostic regression or (S, 4·C) for
    per-class columns — the fg row's own class selects its column
    (fast_rcnn.py:614-616), which is where the online and offline
    variants of this loss diverge on B rows (fast_rcnn.py:567-569)."""
    cls = sp.cls_online if use_online_classes else sp.cls_offline
    fg = (cls >= 0) & (cls < num_classes)
    if deltas.shape[-1] != 4:
        per_cls = deltas.reshape(deltas.shape[0], num_classes, 4)
        col = jnp.clip(cls, 0, num_classes - 1)
        deltas = jnp.take_along_axis(per_cls, col[:, None, None],
                                     axis=1)[:, 0]
    gt_deltas = box_ops.encode_deltas(sp.boxes, sp.gt_boxes, BOX_REG_WEIGHTS)
    per_row = jnp.sum(L.smooth_l1(deltas, gt_deltas, beta=0.0), axis=-1)
    total = jnp.sum(jnp.where(fg, per_row, 0.0))
    if normalizer is None:
        denom = jnp.maximum(jnp.sum(sp.group != GROUP_PAD), 1.0)
    else:
        denom = normalizer
    return total / denom


def kl_mean_elements(log_p: jnp.ndarray, q: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """torch nn.KLDivLoss(reduction='mean') semantics: sum over valid rows
    of Σc q·(log q − log p), divided by (#valid rows × C)."""
    per_elem = q * (jnp.log(jnp.maximum(q, 1e-20)) - log_p)
    total = jnp.sum(jnp.where(valid[:, None], per_elem, 0.0))
    cnt = jnp.sum(valid) * log_p.shape[-1]
    return jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)


def masked_mse(p: jnp.ndarray, q: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    se = (p - q) ** 2
    total = jnp.sum(jnp.where(valid[:, None], se, 0.0))
    cnt = jnp.sum(valid) * p.shape[-1]
    return jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)


# ------------------------------------------------------------------ #
# inference
# ------------------------------------------------------------------ #
def fast_rcnn_inference_single(boxes: jnp.ndarray, scores: jnp.ndarray,
                               proposal_valid: jnp.ndarray,
                               image_hw: jnp.ndarray,
                               score_thresh: float = 0.05,
                               nms_thresh: float = 0.5,
                               topk: int = 100,
                               pre_nms_candidates: int = 1024
                               ) -> Detections:
    """fast_rcnn_inference_single_image (fast_rcnn.py:116-175), masked.

    boxes (R,4) decoded class-agnostic boxes — or (R,C,4) per-class boxes
    when regression is class-specific; scores (R, C+1) softmax probs
    incl. background. Per-class thresholding → class-aware NMS → top-k;
    `probs` rows carried through (the method needs full prob vectors).

    ``pre_nms_candidates`` bounds the (row, class) set entering the tiled
    NMS: with only the top-k survivors reported, restricting to the
    top-1024 scoring candidates is lossless in practice and cuts the
    sequential NMS tile count ~8×.
    """
    r, c1 = scores.shape
    c = c1 - 1
    h, w = image_hw[0], image_hw[1]
    boxes = jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)],
        axis=-1)

    # flatten (row, class) candidates: R*C entries, row-major
    cand_scores = scores[:, :c].reshape(-1)                  # (R*C,)
    cand_classes = jnp.tile(jnp.arange(c, dtype=jnp.int32), (r,))
    cand_boxes = (jnp.repeat(boxes, c, axis=0) if boxes.ndim == 2
                  else boxes.reshape(r * c, 4))
    cand_rows = jnp.repeat(jnp.arange(r, dtype=jnp.int32), c)
    cand_valid = (cand_scores > score_thresh) \
        & jnp.repeat(proposal_valid, c)

    if pre_nms_candidates and pre_nms_candidates < r * c:
        _, sel = jax.lax.top_k(
            jnp.where(cand_valid, cand_scores, nms_ops.NEG_INF),
            pre_nms_candidates)
        cand_scores = jnp.take(cand_scores, sel)
        cand_classes = jnp.take(cand_classes, sel)
        cand_boxes = jnp.take(cand_boxes, sel, axis=0)
        cand_rows = jnp.take(cand_rows, sel)
        cand_valid = jnp.take(cand_valid, sel)

    n_cand = cand_scores.shape[0]
    keep = nms_ops.nms_keep_mask(cand_boxes, cand_scores, cand_valid,
                                 nms_thresh, classes=cand_classes)
    kept_scores = jnp.where(keep, cand_scores, nms_ops.NEG_INF)
    top_scores, top_idx = jax.lax.top_k(kept_scores, min(topk, n_cand))
    top_valid = top_scores > nms_ops.NEG_INF / 2
    take_rows = jnp.take(cand_rows, top_idx)
    return Detections(
        boxes=jnp.take(cand_boxes, top_idx, axis=0),
        scores=jnp.where(top_valid, top_scores, 0.0),
        classes=jnp.where(top_valid, jnp.take(cand_classes, top_idx), -1),
        valid=top_valid,
        probs=jnp.take(scores, take_rows, axis=0),
    )
