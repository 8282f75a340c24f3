"""Masked, shape-static NMS for TPU.

Replaces the reference's CUDA ``batched_nms`` and the Probabilistic-Fusion
NMS family of coin/layers/nms.py (``MyNMS.nms_bayesian`` :84-194,
``Probabilistic_Fusion`` :213-238, fusion helpers :6-53).

Two implementations:

- ``nms_keep_mask`` — exact greedy hard-NMS as a *tiled* algorithm: boxes are
  sorted by score and processed in tiles; each tile is first suppressed by
  all surviving earlier boxes with one batched IoU, then self-suppressed by
  an iterated fixpoint operator. Sequential trips = num_tiles (+ tiny inner
  fixpoint loops) instead of one per box, so XLA sees big batched IoU
  contractions instead of thousands of scalar steps.

- ``fusion_nms`` — the Probabilistic-Fusion greedy NMS: instead of
  discarding suppressed boxes it *fuses* each cluster's probabilities
  (Bayesian log-sum / mean / max) and boxes (score-weighted avg / avg / max).
  Runs once per image at collection time (not in the train hot loop), so a
  per-cluster sequential loop is acceptable; all cluster math is masked
  vector ops.

Class-awareness uses the coordinate-offset trick (coin/layers/nms.py:
196-203): shift each class's boxes into a disjoint coordinate range so
cross-class IoU is exactly zero.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from coin_tpu.ops import boxes as box_ops
from coin_tpu.structures import Detections

NEG_INF = -1e30


def _offset_by_class(boxes: jnp.ndarray, classes: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0))
    return boxes + (classes.astype(boxes.dtype) * (max_coord + 1.0))[..., None]


# ------------------------------------------------------------------ #
# exact greedy hard NMS (tiled)
# ------------------------------------------------------------------ #
def _self_suppress(iou_mask: jnp.ndarray) -> jnp.ndarray:
    """Greedy suppression inside one tile.

    iou_mask[i, j] == True iff box i (higher score, i<j enforced by caller)
    overlaps box j above threshold. Returns suppressed mask of shape (T,).
    Iterates ``supp' = any_i(~supp_i & mask_ij)`` to its (greedy) fixpoint;
    converges in at most chain-depth steps, early-exits via while_loop.
    """
    T = iou_mask.shape[0]

    def cond(state):
        supp, prev, it = state
        return (it == 0) | ((it < T) & jnp.any(supp != prev))

    def body(state):
        supp, _, it = state
        new = jnp.any(iou_mask & ~supp[:, None], axis=0)
        return new, supp, it + 1

    init = (jnp.zeros((T,), bool), jnp.ones((T,), bool), jnp.array(0))
    supp, _, _ = jax.lax.while_loop(cond, body, init)
    return supp


@partial(jax.jit, static_argnames=("tile", "plus1"))
def _nms_sorted(sboxes: jnp.ndarray, iou_threshold: jnp.ndarray,
                tile: int = 256, plus1: bool = False) -> jnp.ndarray:
    """Keep mask over boxes already sorted by descending score.

    Suppressed/invalid boxes must be all-zero (they then have zero IoU with
    everything and are filtered by the caller's valid mask).
    """
    n = sboxes.shape[0]
    pad = (-n) % tile
    sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
    num_tiles = (n + pad) // tile
    iou_fn = box_ops.pairwise_iou_plus1 if plus1 else box_ops.pairwise_iou

    def body(i, acc):
        # acc: boxes with suppressed rows zeroed
        cur = jax.lax.dynamic_slice(acc, (i * tile, 0), (tile, 4))
        # cross suppression by all earlier boxes (zeroed rows → IoU 0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (num_tiles * tile, 1),
                                           0)[:, 0]
        earlier = jnp.where((row_ids < i * tile)[:, None], acc, 0.0)
        cross = jnp.any(iou_fn(earlier, cur) > iou_threshold, axis=0)
        cur = jnp.where(cross[:, None], 0.0, cur)
        # self suppression (strict upper triangle: i suppresses j>i)
        iou_self = iou_fn(cur, cur)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
               < jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1))
        supp = _self_suppress((iou_self > iou_threshold) & tri)
        cur = jnp.where(supp[:, None], 0.0, cur)
        return jax.lax.dynamic_update_slice(acc, cur, (i * tile, 0))

    out = jax.lax.fori_loop(0, num_tiles, body, sboxes)
    return jnp.any(out[:n] != 0.0, axis=-1)


def nms_keep_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                  valid: jnp.ndarray, iou_threshold: float,
                  classes: Optional[jnp.ndarray] = None,
                  plus1: bool = False) -> jnp.ndarray:
    """Exact greedy NMS. Returns a boolean keep mask aligned with the input
    rows (class-aware when ``classes`` is given — detectron2 batched_nms
    semantics). Ties broken by input order, matching torch stable sort.
    """
    n = boxes.shape[0]
    if classes is not None:
        boxes = _offset_by_class(boxes, jnp.maximum(classes, 0), valid)
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    # shift so all real coordinates are strictly positive: an all-zero row is
    # then never confused with a real box at the origin
    boxes = jnp.where(valid[:, None], boxes + 1.0, 0.0)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores, stable=True)
    keep_sorted = _nms_sorted(jnp.take(boxes, order, axis=0),
                              jnp.asarray(iou_threshold, boxes.dtype),
                              plus1=plus1)
    inv = jnp.argsort(order, stable=True)
    return jnp.take(keep_sorted, inv, axis=0) & valid


# ------------------------------------------------------------------ #
# probabilistic fusion NMS
# ------------------------------------------------------------------ #
def fusion_nms(det: Detections, iou_threshold: float,
               score_method: str = "probEn",
               box_method: str = "s-avg") -> Detections:
    """Greedy NMS that fuses each suppression cluster instead of dropping it.

    Semantics match coin/layers/nms.py:84-194 (``nms_bayesian``): IoU uses
    the inclusive +1 convention; clusters are same-class only (coordinate
    offset); the fused set is re-sorted by fused score descending.

    score_method: 'probEn' | 'avg' | 'max'; box_method: 's-avg'|'avg'|'max'.
    """
    n = det.capacity
    assert det.probs is not None
    classes = jnp.maximum(det.classes, 0)
    off_boxes = _offset_by_class(det.boxes, classes, det.valid)
    off_boxes = jnp.where(det.valid[:, None], off_boxes, 0.0)
    iou = box_ops.pairwise_iou_plus1(off_boxes, off_boxes)
    # reference scores = probs[:, label] (coin/layers/nms.py:93)
    scores = jnp.take_along_axis(det.probs, classes[:, None],
                                 axis=-1)[:, 0]
    scores = jnp.where(det.valid, scores, NEG_INF)

    def fuse(cluster: jnp.ndarray, top: jnp.ndarray):
        """cluster: (N,) bool; top: scalar index of the cluster seed."""
        csz = jnp.sum(cluster)
        w = jnp.where(cluster, scores, 0.0)
        if score_method == "probEn":
            logp = jnp.where(cluster[:, None],
                             jnp.log(jnp.maximum(det.probs, 1e-20)), 0.0)
            summed = jnp.sum(logp, axis=0)
            fprob = jax.nn.softmax(summed)
            fcls = det.classes[top]
            fscore = fprob[jnp.maximum(fcls, 0)]
        elif score_method == "avg":
            fprob = jnp.sum(jnp.where(cluster[:, None], det.probs, 0.0),
                            axis=0) / jnp.maximum(csz, 1)
            fscore = jnp.sum(w) / jnp.maximum(csz, 1)
            fcls = det.classes[top]
        elif score_method == "max":
            mi = jnp.argmax(jnp.where(cluster, scores, NEG_INF))
            fprob = det.probs[mi]
            fscore = scores[mi]
            fcls = det.classes[mi]
        else:
            raise NotImplementedError(score_method)

        if box_method == "s-avg":
            bw = w / jnp.maximum(jnp.sum(w), 1e-20)
            fbox = jnp.sum(det.boxes * bw[:, None], axis=0)
        elif box_method == "avg":
            fbox = jnp.sum(jnp.where(cluster[:, None], det.boxes, 0.0),
                           axis=0) / jnp.maximum(csz, 1)
        elif box_method == "max":
            mi = jnp.argmax(jnp.where(cluster, scores, NEG_INF))
            fbox = det.boxes[mi]
        else:
            raise NotImplementedError(box_method)
        return fbox, fscore, fprob, fcls

    def body(k, state):
        alive, out_boxes, out_scores, out_probs, out_classes, out_valid = state
        cur_scores = jnp.where(alive, scores, NEG_INF)
        top = jnp.argmax(cur_scores)
        any_alive = cur_scores[top] > NEG_INF / 2
        cluster = alive & (iou[top] > iou_threshold)
        cluster = cluster.at[top].set(alive[top])
        fbox, fscore, fprob, fcls = fuse(cluster, top)
        write = any_alive
        out_boxes = out_boxes.at[k].set(jnp.where(write, fbox, 0.0))
        out_scores = out_scores.at[k].set(jnp.where(write, fscore, 0.0))
        out_probs = out_probs.at[k].set(jnp.where(write, fprob, 0.0))
        out_classes = out_classes.at[k].set(jnp.where(write, fcls, -1))
        out_valid = out_valid.at[k].set(write)
        alive = alive & ~cluster
        return alive, out_boxes, out_scores, out_probs, out_classes, out_valid

    init = (det.valid,
            jnp.zeros_like(det.boxes),
            jnp.zeros_like(det.scores),
            jnp.zeros_like(det.probs),
            jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), bool))
    _, b, s, p, c, v = jax.lax.fori_loop(0, n, body, init)
    # already emitted in descending fused-seed order, but the reference
    # re-sorts by *fused* score (coin/layers/nms.py:192)
    order = jnp.argsort(-jnp.where(v, s, NEG_INF), stable=True)
    out = Detections(boxes=b, scores=s, classes=c, valid=v, probs=p)
    return out.gather(order, jnp.take(v, order))


# ------------------------------------------------------------------ #
# pairwise fusion helpers (A-set merging in the dual-teacher matcher)
# ------------------------------------------------------------------ #
def merge_probs_bayesian(probs_a: jnp.ndarray,
                         probs_b: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
    """log-mean fusion (coin/layers/nms.py:6-12)."""
    summed = (jnp.log(jnp.maximum(probs_a, 1e-20))
              + jnp.log(jnp.maximum(probs_b, 1e-20))) / 2.0
    probs = jax.nn.softmax(summed, axis=-1)
    return probs, jnp.max(probs, axis=-1)


def merge_probs_max(probs_a: jnp.ndarray,
                    probs_b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """max-score winner takes the whole row (coin/layers/nms.py:14-22)."""
    sa = jnp.max(probs_a, axis=-1)
    sb = jnp.max(probs_b, axis=-1)
    take_a = (sa > sb)[..., None]
    probs = jnp.where(take_a, probs_a, probs_b)
    return probs, jnp.where(sa > sb, sa, sb)


def weighted_box_fusion_pair(box_a: jnp.ndarray, box_b: jnp.ndarray,
                             score_a: jnp.ndarray,
                             score_b: jnp.ndarray) -> jnp.ndarray:
    """score-weighted average of two aligned box sets
    (coin/layers/nms.py:24-31)."""
    total = jnp.maximum(score_a + score_b, 1e-20)
    wa = (score_a / total)[..., None]
    wb = (score_b / total)[..., None]
    return box_a * wa + box_b * wb
