"""Pure forward/loss pipelines composing the detector's neural parts with
the masked target/ops layer. Each trainer's jitted step is built from
these. (They replace the branch logic inside clip_rcnn.py forward /
clip_roi_heads.py / fast_rcnn.py losses.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from coin_tpu.models import roi_heads as rh
from coin_tpu.models import rpn as rpn_lib
from coin_tpu.models.anchors import grid_anchors
from coin_tpu.ops import boxes as box_ops
from coin_tpu.ops import losses as L
from coin_tpu.structures import Detections


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    num_classes: int
    # RPN
    rpn_batch_size: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_thresholds: Tuple[float, float] = (0.3, 0.7)
    rpn_nms_thresh: float = 0.7
    pre_nms_topk_train: int = 6000
    post_nms_topk_train: int = 1000
    pre_nms_topk_test: int = 6000
    post_nms_topk_test: int = 1000
    # ROI
    roi_batch_size: int = 512
    roi_positive_fraction: float = 0.25
    roi_iou_threshold: float = 0.5
    pooler_resolution: int = 14
    # test
    test_score_thresh: float = 0.05
    test_nms_thresh: float = 0.5
    test_topk: int = 100
    # loss weights (CLOUD.* in the reference config)
    bg_weight: float = 1.0
    loss_type: str = "MILCrossEntropy"
    classes_weight: Optional[Tuple[float, ...]] = None  # focal alpha
    bg_train: bool = True
    stride: int = 16
    # MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG (True in every shipped
    # reference config). False activates per-class delta columns and the
    # dual online/offline box-reg losses (fast_rcnn.py:547-569).
    cls_agnostic_bbox_reg: bool = True
    # res5-crop sharing at inference (TPU throughput lever, BENCH.md):
    # pool only cluster representatives (IoU ≥ thresh) up to a static
    # budget and broadcast features to cluster members. 0 = off (exact
    # reference parity). Members whose representative overflows the
    # budget receive the clamped slot's features (approximate).
    share_crops_budget: int = 0
    share_crops_thresh: float = 0.9
    # fast head at inference (the measured crop-count lever): res5 over
    # the full image once + RoIAlign on the res5 map, instead of res5
    # per 14×14 crop. Approximate (crop-boundary context differs);
    # False = exact C4 parity. Used for the TEACHER via
    # TPU.TEACHER_FAST_HEAD after AP validation.
    fast_head: bool = False


def _anchors_for(images: jnp.ndarray, cfg: PipelineConfig) -> jnp.ndarray:
    h, w = images.shape[1] // cfg.stride, images.shape[2] // cfg.stride
    return jnp.asarray(grid_anchors(h, w, cfg.stride))


def rpn_forward(model, variables, feats, images_hw, anchors,
                cfg: PipelineConfig, train: bool):
    obj, deltas = model.apply(variables, feats, method="rpn")
    proposals = rpn_lib.predict_proposals(
        anchors, jax.lax.stop_gradient(obj), jax.lax.stop_gradient(deltas),
        images_hw,
        cfg.pre_nms_topk_train if train else cfg.pre_nms_topk_test,
        cfg.post_nms_topk_train if train else cfg.post_nms_topk_test,
        cfg.rpn_nms_thresh)
    return obj, deltas, proposals


def oracle_train_losses(model, variables, images, images_hw,
                        gt: Detections, class_tokens: jnp.ndarray,
                        rng: jax.Array, cfg: PipelineConfig
                        ) -> Dict[str, jnp.ndarray]:
    """Supervised oracle branch: standard Faster-RCNN losses with the
    cosine classifier (fast_rcnn_oracle.py:316-356 + plain RPN)."""
    b = images.shape[0]
    feats = model.apply(variables, images, method="features")
    anchors = _anchors_for(images, cfg)
    obj, rpn_deltas, proposals = rpn_forward(model, variables, feats,
                                             images_hw, anchors, cfg, True)

    rng_rpn, rng_roi = jax.random.split(rng)
    rpn_targets = jax.vmap(
        lambda g, k: rpn_lib.label_anchors_single(
            anchors, g, None, k, cfg.rpn_batch_size,
            cfg.rpn_positive_fraction, cfg.rpn_thresholds)
    )(gt, jax.random.split(rng_rpn, b))
    losses = rpn_lib.rpn_losses(anchors, obj, rpn_deltas, rpn_targets,
                                cfg.rpn_batch_size)

    sp = jax.vmap(
        lambda p, g, k: rh.sample_proposals_single(
            p, g, None, None, cfg.num_classes, k, cfg.roi_batch_size,
            cfg.roi_positive_fraction, cfg.roi_iou_threshold)
    )(proposals, gt, jax.random.split(rng_roi, b))

    pooled = model.apply(variables, feats, sp.boxes,
                         cfg.pooler_resolution, method="pool_boxes")
    text = model.apply(variables, class_tokens, method="text_features")
    scores, deltas, _ = model.apply(variables, pooled, text,
                                    method="predict")

    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    sp_flat = rh.SampledProposals(*[flat(x) for x in sp])
    scores_f = flat(scores)
    valid = sp_flat.group != rh.GROUP_PAD
    labels = jnp.clip(sp_flat.cls_offline, 0, cfg.num_classes)
    logp = jax.nn.log_softmax(scores_f, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    losses["loss_cls"] = L.masked_mean(ce, valid)
    losses["loss_box_reg"] = rh.box_reg_loss(sp_flat, flat(deltas),
                                             cfg.num_classes,
                                             use_online_classes=False)
    return losses


def shared_pool(model, variables, feats, boxes, valid,
                cfg: PipelineConfig) -> jnp.ndarray:
    """Pool res5 features for cluster REPRESENTATIVES only (boxes with
    IoU ≥ share_crops_thresh share one crop) and broadcast them to the
    members — the crop-count lever from BENCH.md. Exact for IoU=1
    duplicates; approximate within a cluster otherwise."""
    from coin_tpu.ops.dedup import self_cluster_index

    def plan(b, v):
        keep, rep = self_cluster_index(b, v, cfg.share_crops_thresh)
        order = jnp.argsort(~keep, stable=True)   # reps to the front
        inv = jnp.argsort(order)                  # orig idx -> sorted pos
        rep_pos = jnp.minimum(inv[rep], cfg.share_crops_budget - 1)
        return jnp.take(b, order[:cfg.share_crops_budget], axis=0), rep_pos

    rep_boxes, rep_pos = jax.vmap(plan)(boxes, valid)
    pooled = model.apply(variables, feats, rep_boxes,
                         cfg.pooler_resolution, method="pool_boxes")
    return jnp.take_along_axis(pooled, rep_pos[..., None], axis=1)


def inference(model, variables, images, images_hw,
              class_tokens: jnp.ndarray, cfg: PipelineConfig,
              text_features: Optional[jnp.ndarray] = None) -> Detections:
    """Test branch (clip_rcnn.py:381-426 → fast_rcnn_inference).

    Returns batched Detections in canvas coordinates (caller rescales to
    original image size on host)."""
    feats = model.apply(variables, images, method="features")
    anchors = _anchors_for(images, cfg)
    _, _, proposals = rpn_forward(model, variables, feats, images_hw,
                                  anchors, cfg, False)
    if cfg.fast_head:
        pooled = model.apply(variables, feats, proposals.boxes,
                             method="pool_boxes_fast")
    elif cfg.share_crops_budget:
        pooled = shared_pool(model, variables, feats, proposals.boxes,
                             proposals.valid, cfg)
    else:
        pooled = model.apply(variables, feats, proposals.boxes,
                             cfg.pooler_resolution, method="pool_boxes")
    if text_features is None:
        text_features = model.apply(variables, class_tokens,
                                    method="text_features")
    scores, deltas, _ = model.apply(variables, pooled, text_features,
                                    method="predict")
    probs = jax.nn.softmax(scores, axis=-1)
    if deltas.shape[-1] == 4:
        boxes = box_ops.decode_deltas(proposals.boxes, deltas,
                                      rh.BOX_REG_WEIGHTS)
    else:  # per-class columns: (B, R, C, 4) candidate boxes
        per_cls = deltas.reshape(deltas.shape[:-1] + (-1, 4))
        boxes = box_ops.decode_deltas(proposals.boxes[..., None, :],
                                      per_cls, rh.BOX_REG_WEIGHTS)
    return jax.vmap(
        lambda bx, pr, v, hw: rh.fast_rcnn_inference_single(
            bx, pr, v, hw, cfg.test_score_thresh, cfg.test_nms_thresh,
            cfg.test_topk)
    )(boxes, probs, proposals.valid, images_hw)
