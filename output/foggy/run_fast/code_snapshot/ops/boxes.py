"""Box algebra: areas, pairwise IoU, delta transforms.

Pure jnp, shape-static, mask-aware. Replaces detectron2's Boxes/pairwise_iou
and Box2BoxTransform used throughout the reference (e.g.
coin/engine/trainer.py:338-478 matching, coin/modeling/proposal_generator/
rpn.py anchor matching, roi head box regression).

Two IoU conventions exist in the reference and both are preserved:
- ``pairwise_iou`` — half-open boxes, w = x2-x1 (detectron2/torchvision).
- ``pairwise_iou_plus1`` — inclusive pixel convention, w = x2-x1+1 — used by
  the Probabilistic-Fusion NMS (coin/layers/nms.py:91,110-111) and the VOC
  evaluator.
"""

from __future__ import annotations

import jax.numpy as jnp

LOG_MAX_SCALE = jnp.log(1000.0 / 16.0)  # detectron2 dw/dh clamp


def area(boxes: jnp.ndarray, plus1: bool = False) -> jnp.ndarray:
    off = 1.0 if plus1 else 0.0
    return ((boxes[..., 2] - boxes[..., 0] + off)
            * (boxes[..., 3] - boxes[..., 1] + off))


def _pairwise_intersection(a: jnp.ndarray, b: jnp.ndarray,
                           off: float) -> jnp.ndarray:
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt + off, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix of shape (..., Na, Nb); half-open convention."""
    inter = _pairwise_intersection(a, b, 0.0)
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def pairwise_iou_plus1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix with the inclusive +1 pixel convention."""
    inter = _pairwise_intersection(a, b, 1.0)
    union = (area(a, True)[..., :, None] + area(b, True)[..., None, :]
             - inter)
    return jnp.where(union > 0, inter / union, 0.0)


def centers(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., :2] + boxes[..., 2:]) / 2.0


def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


# --------------------------------------------------------------------- #
# Box2Box delta transform (Faster-RCNN parameterisation)
# --------------------------------------------------------------------- #
def encode_deltas(src: jnp.ndarray, target: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """deltas such that decode(src, deltas) == target."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    sw = jnp.maximum(sw, 1e-6)
    sh = jnp.maximum(sh, 1e-6)
    return jnp.stack([
        wx * (tcx - scx) / sw,
        wy * (tcy - scy) / sh,
        ww * jnp.log(jnp.maximum(tw, 1e-6) / sw),
        wh * jnp.log(jnp.maximum(th, 1e-6) / sh),
    ], axis=-1)


def decode_deltas(src: jnp.ndarray, deltas: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, LOG_MAX_SCALE)
    dh = jnp.minimum(deltas[..., 3] / wh, LOG_MAX_SCALE)
    pcx = dx * sw + scx
    pcy = dy * sh + scy
    pw = jnp.exp(dw) * sw
    ph = jnp.exp(dh) * sh
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)
