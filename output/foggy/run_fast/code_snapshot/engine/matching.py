"""Dual-teacher A/B/C matching as masked tensor math.

Re-designs CoinTrainer.match_dual_teacher (coin/engine/trainer.py:338-478)
for fixed shapes:

Per image, given the cached cloud ("online") detections O and the EMA
teacher ("offline") predictions F:

- pairs: for each valid online box i, its best offline match
  j*(i) = argmax over {j : IoU(i,j) ≥ thr} preferring same-class matches,
  then IoU (this folds the reference's duplicate-box preference rules,
  trainer.py:371-391, into one selection).
- A (consistent):  pairs with equal classes → fused box (online box at
  weight 1.0, score-weighted WBF after burn-up, trainer.py:480-485),
  classes + both probs/scores kept.
- B (inconsistent): pairs with different classes (RCNN view only) →
  fused box, both class/prob views kept.
- C (private): offline boxes overlapping no online box ∪ online boxes
  with no offline match.
- Degenerate images (trainer.py:343-361): no online boxes → offline with
  score > 0.8 becomes A (self-paired), the rest C; no offline boxes →
  online becomes A (self-paired), C empty.

Layouts (capacities No = online cap, Nf = offline cap):
  A: capacity No + Nf — slots [0, No) hold online-paired entries, slots
     [No, No+Nf) hold the degenerate offline-sourced entries.
  B: capacity No.
  C: capacity Nf + No — offline-only slots then online-only slots.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from coin_tpu.ops import boxes as box_ops
from coin_tpu.ops.nms import weighted_box_fusion_pair
from coin_tpu.structures import Detections


class MatchedSets(NamedTuple):
    a: Detections                 # probs = offline probs
    a_probs_online: jnp.ndarray   # (No+Nf, C+1)
    b: Detections                 # classes/probs = offline view
    b_cls_online: jnp.ndarray     # (No,)
    b_probs_online: jnp.ndarray   # (No, C+1)
    c: Detections                 # probs carried (distillation targets)


def match_dual_teacher_single(online: Detections, offline: Detections,
                              iou_threshold: float,
                              box_a_weight: jnp.ndarray,
                              with_b: bool = True) -> MatchedSets:
    """One image's A/B/C split. ``box_a_weight`` 1.0 → fused box = online
    box; otherwise score-weighted fusion (WEIGHT_FOR_BOX_A schedule)."""
    no = online.capacity
    nf = offline.capacity
    c1 = online.probs.shape[-1]

    iou = box_ops.pairwise_iou(online.boxes, offline.boxes)
    pair_ok = (iou >= iou_threshold) & online.valid[:, None] \
        & offline.valid[None, :]
    same_cls = online.classes[:, None] == offline.classes[None, :]
    # preference: same-class beats IoU; +2 dominates any iou in [0,1]
    pref = jnp.where(pair_ok, iou + 2.0 * same_cls, -1.0)
    jstar = jnp.argmax(pref, axis=1)                       # (No,)
    has_match = jnp.max(pref, axis=1) >= 0.0

    any_online = jnp.any(online.valid)
    any_offline = jnp.any(offline.valid)
    general = any_online & any_offline

    take_off = lambda arr: jnp.take(arr, jstar, axis=0)
    off_boxes = take_off(offline.boxes)
    off_classes = take_off(offline.classes)
    off_scores = take_off(offline.scores)
    off_probs = take_off(offline.probs)

    fused = jnp.where(
        box_a_weight >= 1.0,
        online.boxes,
        weighted_box_fusion_pair(online.boxes, off_boxes, online.scores,
                                 off_scores))
    cls_match = has_match & (off_classes == online.classes)
    cls_differ = has_match & (off_classes != online.classes) & with_b

    # ---------- A (paired region, slots [0, No)) ----------
    a_valid_pair = jnp.where(general, cls_match if with_b else has_match,
                             False)
    # degenerate region (slots [No, No+Nf)):
    #   no online → offline score > 0.8 self-paired
    #   no offline → online self-paired lives in the paired region below
    deg_off_valid = (~any_online) & offline.valid & (offline.scores > 0.8)
    only_online = any_online & (~any_offline)
    a_valid_pair = a_valid_pair | (only_online & online.valid)
    a_box_pair = jnp.where(general, fused, online.boxes)
    a_cls_pair = jnp.where(general, off_classes, online.classes)

    a = Detections(
        boxes=jnp.concatenate([a_box_pair, offline.boxes], axis=0),
        scores=jnp.concatenate([jnp.where(general, off_scores,
                                          online.scores),
                                offline.scores], axis=0),
        classes=jnp.concatenate([a_cls_pair, offline.classes], axis=0),
        valid=jnp.concatenate([a_valid_pair, deg_off_valid], axis=0),
        probs=jnp.concatenate([jnp.where(general, off_probs, online.probs),
                               offline.probs], axis=0),
    )
    a_probs_online = jnp.concatenate([online.probs, offline.probs], axis=0)

    # ---------- B (slots per online box) ----------
    b_valid = jnp.where(general, cls_differ, False)
    b = Detections(boxes=fused, scores=off_scores, classes=off_classes,
                   valid=b_valid, probs=off_probs)
    # identical-box guard (trainer.py:434-439): drop B whose box equals a
    # valid A box exactly
    eq = jnp.all(b.boxes[:, None, :] == a.boxes[None, :, :], axis=-1)
    dup_with_a = jnp.any(eq & a.valid[None, :], axis=1)
    b = b.mask(~dup_with_a)

    # ---------- C (offline-only then online-only) ----------
    off_matched = jnp.any(pair_ok, axis=0)
    c_off_valid = jnp.where(general, offline.valid & ~off_matched,
                            (~any_online) & offline.valid
                            & (offline.scores <= 0.8))
    c_on_valid = jnp.where(general, online.valid & ~has_match, False)
    c = Detections(
        boxes=jnp.concatenate([offline.boxes, online.boxes], axis=0),
        scores=jnp.concatenate([offline.scores, online.scores], axis=0),
        classes=jnp.concatenate([offline.classes, online.classes], axis=0),
        valid=jnp.concatenate([c_off_valid, c_on_valid], axis=0),
        probs=jnp.concatenate([offline.probs, online.probs], axis=0),
    )

    return MatchedSets(a, a_probs_online, b, online.classes, online.probs,
                       c)
