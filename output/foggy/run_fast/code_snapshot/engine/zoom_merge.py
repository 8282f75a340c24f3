"""ZOOM/AUG collection views (host-side numpy).

Faithful re-implementation of GDINO_PROCESSOR.post_process
(coin/modeling/meta_arch/gdino_processor.py:184-302) — the optional
center-crop ("ZOOM") and photometric ("AUG") collection views and their
merging into the ORI detections. OFF by default (the paper sets
COLLECT_AUG=''); runs once per image at collection time, so plain numpy
is the right tool (no jit pressure).

All detection dicts are {boxes (n,4), scores (n,), classes (n,),
probs (n, C+1)} in original-image coordinates.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def _take(det: Dict, idx) -> Dict:
    return {k: det[k][idx] for k in ("boxes", "scores", "classes", "probs")}


def _cat(*dets) -> Dict:
    return {k: np.concatenate([d[k] for d in dets], axis=0)
            for k in ("boxes", "scores", "classes", "probs")}


def center_zoom_box(h: int, w: int, min_zoom: int = 320
                    ) -> Tuple[int, int, int, int]:
    """Center crop geometry (GDINOZOOM, coin/data/transforms/
    augmentation_impl.py:46-61): aspect-preserving center crop with the
    short side = min_zoom."""
    ratio = w / h
    if ratio >= 1:
        cw = int(round(min_zoom * ratio))
        ch = min_zoom
    else:
        cw = min_zoom
        ch = int(round(min_zoom / ratio))
    cw = min(cw, w)
    ch = min(ch, h)
    y1 = (h - ch) // 2
    x1 = (w - cw) // 2
    return x1, y1, cw, ch


def merge_zoom(ori: Dict, zoom: Dict, zoom_xywh: Tuple[int, int, int, int],
               match_thresh: float = 0.6, border_px: float = 5.0) -> Dict:
    """Merge ZOOM-view detections into ORI (post_process :193-284):
    1. keep ORI boxes fully outside the zoom;
    2. border boxes (clipped by the zoom window) keep their geometry but
       Bayesian-fuse probs with matching zoom boxes of the same class;
    3. interior ORI boxes must be confirmed by a zoom match — class
       mismatches defer to zoom entirely, class matches WBF the boxes and
       max-fuse the probs;
    4. zoom-only boxes (not at the crop border) are appended.
    """
    from coin_tpu.ops.nms import (merge_probs_bayesian, merge_probs_max,
                                  weighted_box_fusion_pair)
    import jax.numpy as jnp

    if len(zoom["boxes"]) == 0:
        return ori
    x1, y1, cw, ch = zoom_xywh
    shift = np.asarray([x1, y1, x1, y1], np.float32)

    clipped = ori["boxes"] - shift
    clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, cw)
    clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, ch)
    nonempty = ((clipped[:, 2] > clipped[:, 0])
                & (clipped[:, 3] > clipped[:, 1]))
    if nonempty.sum() == 0:
        return _cat(ori, zoom)

    inside = _take(ori, nonempty)
    inside_clipped = clipped[nonempty] + shift
    keep = _take(ori, ~nonempty)
    border_mask = np.any(inside_clipped != inside["boxes"], axis=1)

    border = _take(inside, border_mask)
    # fuse border probs with matched zoom boxes (same class only)
    iou = _iou_matrix(zoom["boxes"], inside_clipped[border_mask])
    if iou.size:
        best = iou.argmax(0)
        matched = iou.max(0) >= match_thresh
        for j in np.nonzero(matched)[0]:
            zi = best[j]
            probs, scores = merge_probs_bayesian(
                jnp.asarray(zoom["probs"][zi][None]),
                jnp.asarray(border["probs"][j][None]))
            probs = np.asarray(probs)[0]
            if probs.argmax() == border["classes"][j]:
                border["probs"][j] = probs
                border["scores"][j] = float(np.asarray(scores)[0])

    change = _take(inside, ~border_mask)
    change["boxes"] = inside_clipped[~border_mask]
    iou = _iou_matrix(zoom["boxes"], change["boxes"])
    matched_zoom = iou.argmax(0) if iou.size else np.zeros(0, int)
    confirmed = iou.max(0) >= match_thresh if iou.size else np.zeros(0,
                                                                     bool)
    change = _take(change, confirmed)
    mz = matched_zoom[confirmed]
    used_zoom = set(mz.tolist())
    if len(mz):
        same = zoom["classes"][mz] == change["classes"]
        change["classes"] = zoom["classes"][mz]
        # class mismatch → zoom wins outright
        change["scores"][~same] = zoom["scores"][mz][~same]
        change["probs"][~same] = zoom["probs"][mz][~same]
        change["boxes"][~same] = zoom["boxes"][mz][~same]
        if same.any():
            fused = np.asarray(weighted_box_fusion_pair(
                jnp.asarray(zoom["boxes"][mz][same]),
                jnp.asarray(change["boxes"][same]),
                jnp.asarray(zoom["scores"][mz][same]),
                jnp.asarray(change["scores"][same])))
            change["boxes"][same] = fused
            probs, scores = merge_probs_max(
                jnp.asarray(zoom["probs"][mz][same]),
                jnp.asarray(change["probs"][same]))
            change["probs"][same] = np.asarray(probs)
            change["scores"][same] = np.asarray(scores)

    # zoom-only additions, excluding boxes hugging the crop border that
    # overlap an ORI border box
    zb = zoom["boxes"] - shift
    at_border = ((zb[:, 0] < border_px) | (zb[:, 1] < border_px)
                 | (zb[:, 2] > cw - border_px)
                 | (zb[:, 3] > ch - border_px))
    iou_b = _iou_matrix(zoom["boxes"], inside_clipped[border_mask])
    overlaps_border = (iou_b > 0.1).any(1) if iou_b.size else \
        np.zeros(len(zoom["boxes"]), bool)
    excluded = used_zoom | set(np.nonzero(at_border
                                          & overlaps_border)[0].tolist())
    add_idx = [i for i in range(len(zoom["boxes"])) if i not in excluded]
    parts = [keep, change, border]
    if add_idx:
        parts.append(_take(zoom, np.asarray(add_idx)))
    return _cat(*parts)
