"""Box de-duplication / cluster utilities.

Masked, shape-static counterparts of coin/utils/util.py:434-507:
``delete_duplicate_boxes`` (exact-coordinate collapse),
``filter_result`` (transitive IoU≥0.95 self-clustering), and
``online_boxes_merging`` (resolving an online box matched to several
near-identical offline boxes). The dual-teacher matcher folds most of
these rules into its pair selection (engine/matching.py); these standalone
versions serve the collection/processor paths and external users.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from coin_tpu.ops import boxes as box_ops
from coin_tpu.structures import Detections


def duplicate_mask(boxes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """True for rows whose exact box coordinates already appeared at a
    lower index (first occurrence kept — the deterministic stand-in for
    the reference's random pick, util.py:434-457)."""
    n = boxes.shape[0]
    eq = jnp.all(boxes[:, None, :] == boxes[None, :, :], axis=-1)
    eq = eq & valid[:, None] & valid[None, :]
    lower = jnp.tril(jnp.ones((n, n), bool), k=-1)
    return jnp.any(eq & lower, axis=1)


def delete_duplicate_boxes(det: Detections) -> Detections:
    return det.mask(~duplicate_mask(det.boxes, det.valid))


def self_cluster_index(boxes: jnp.ndarray, valid: jnp.ndarray,
                       iou_threshold: float = 0.95):
    """Cluster boxes at IoU ≥ thr (transitive closure); returns
    (keep, rep) where keep marks each cluster's first member and rep[i]
    is the index of i's representative (itself if keep[i])."""
    n = boxes.shape[0]
    iou = box_ops.pairwise_iou(boxes, boxes)
    adj = (iou >= iou_threshold) & valid[:, None] & valid[None, :]
    adj = adj | jnp.eye(n, dtype=bool)
    reach = adj
    for _ in range(max(1, math.ceil(math.log2(max(n, 2))))):
        reach = reach | (reach @ reach)
    rep = jnp.argmax(reach, axis=1)  # lowest reachable index
    keep = (rep == jnp.arange(n)) & valid
    return keep, rep


def self_cluster_mask(det: Detections, iou_threshold: float = 0.95
                      ) -> jnp.ndarray:
    """filter_result (util.py:466-482): cluster boxes whose IoU ≥ thr via
    transitive closure; keep the first member of each cluster.

    Closure computed by boolean matrix powers (log₂ n squarings)."""
    n = det.capacity
    iou = box_ops.pairwise_iou(det.boxes, det.boxes)
    adj = (iou >= iou_threshold) & det.valid[:, None] & det.valid[None, :]
    adj = adj | jnp.eye(n, dtype=bool)
    # transitive closure via log2(n) boolean squarings
    reach = adj
    for _ in range(max(1, math.ceil(math.log2(max(n, 2))))):
        reach = reach | (reach @ reach)
    first = jnp.argmax(reach, axis=1)  # lowest reachable index
    keep = first == jnp.arange(n)
    return keep & det.valid


def online_boxes_merging(online: Detections, offline_matched: Detections,
                         online_matched_idx: jnp.ndarray
                         ) -> jnp.ndarray:
    """util.py:484-507 semantics: when one online box is matched by
    multiple near-identical offline boxes, keep only the first offline
    partner per online box. Returns a keep mask over the matched pairs."""
    n = offline_matched.capacity
    same_online = (online_matched_idx[:, None]
                   == online_matched_idx[None, :])
    near_ident = jnp.all(
        jnp.abs(offline_matched.boxes[:, None, :]
                - offline_matched.boxes[None, :, :]) < 1.0, axis=-1)
    redundant = same_online & near_ident \
        & offline_matched.valid[:, None] & offline_matched.valid[None, :]
    lower = jnp.tril(jnp.ones((n, n), bool), k=-1)
    return offline_matched.valid & ~jnp.any(redundant & lower, axis=1)
