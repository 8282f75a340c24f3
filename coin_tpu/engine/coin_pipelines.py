"""Pre-train and final-adaptation loss pipelines (the TPU re-design of the
branch logic in clip_rcnn.py / clip_roi_heads.py / fast_rcnn.py losses and
the merge training flow of trainer.py:160-218).

Everything is one jitted step per trainer; prototypes / EMA are functional
state threading through.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from coin_tpu.engine import pipelines
from coin_tpu.engine.matching import MatchedSets, match_dual_teacher_single
from coin_tpu.engine.state import Prototypes, prototype_ema
from coin_tpu.models import roi_heads as rh
from coin_tpu.models import rpn as rpn_lib
from coin_tpu.ops import losses as L
from coin_tpu.structures import Detections


def _normalize(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True),
                           1e-8)


def text_align_loss(text_features: jnp.ndarray,
                    proto: jnp.ndarray) -> jnp.ndarray:
    """L1 between learnable-prompt text features and the (frozen w.r.t.
    this loss) class prototypes (fast_rcnn.py:342-353 do_classify)."""
    target = jax.lax.stop_gradient(_normalize(proto))
    return jnp.mean(jnp.abs(text_features - target))


def _flat(a):
    return a.reshape((-1,) + a.shape[2:])


class StudentForward(NamedTuple):
    losses: Dict[str, jnp.ndarray]
    sp: rh.SampledProposals          # flattened over batch
    scores: jnp.ndarray              # (R, C+1)
    class_feats: jnp.ndarray         # (R, text_dim)
    pooled: jnp.ndarray              # (R, D) region features
    c_scores: jnp.ndarray            # (Rc, C+1) private-box scores
    c_probs: jnp.ndarray             # (Rc, C+1) distillation targets
    c_valid: jnp.ndarray             # (Rc,)


# ------------------------------------------------------------------ #
# pre-train branch
# ------------------------------------------------------------------ #
def pretrain_losses(model, variables, images, images_hw,
                    rcnn: Detections, rpn_gt: Detections,
                    proto: jnp.ndarray, class_tokens: jnp.ndarray,
                    rng: jax.Array, cfg: pipelines.PipelineConfig,
                    update_prototype: jnp.ndarray,
                    prototype_rate: float = 0.9996,
                    prob_weighted: bool = False,
                    loss_weights: Optional[Dict[str, float]] = None
                    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Branch 'pre_train' (clip_rcnn.py:334-353 + fast_rcnn.py:366-438):
    cached cloud RCNN dets supervise the heads (MIL CE + box reg), cached
    RPN view supervises the RPN; returns (losses, new_proto)."""
    b = images.shape[0]
    feats = model.apply(variables, images, method="features")
    anchors = pipelines._anchors_for(images, cfg)
    obj, rpn_deltas, proposals = pipelines.rpn_forward(
        model, variables, feats, images_hw, anchors, cfg, True)

    rng_rpn, rng_roi = jax.random.split(rng)
    rpn_targets = jax.vmap(
        lambda g, k: rpn_lib.label_anchors_single(
            anchors, g, None, k, cfg.rpn_batch_size,
            cfg.rpn_positive_fraction, cfg.rpn_thresholds)
    )(rpn_gt, jax.random.split(rng_rpn, b))
    losses = rpn_lib.rpn_losses(anchors, obj, rpn_deltas, rpn_targets,
                                cfg.rpn_batch_size)

    sp = jax.vmap(
        lambda p, g, k: rh.sample_proposals_single(
            p, g, None, None, cfg.num_classes, k, cfg.roi_batch_size,
            cfg.roi_positive_fraction, cfg.roi_iou_threshold)
    )(proposals, rcnn, jax.random.split(rng_roi, b))

    pooled = model.apply(variables, feats, sp.boxes,
                         cfg.pooler_resolution, method="pool_boxes")
    text = model.apply(variables, class_tokens, method="text_features")
    scores, deltas, class_feats = model.apply(variables, pooled, text,
                                              method="predict")

    sp_f = rh.SampledProposals(*[_flat(x) for x in sp])
    scores_f = _flat(scores)
    losses["loss_text_align"] = text_align_loss(text, proto)
    # loss_cls is gated on any sampled foreground across the batch
    # (fast_rcnn.py:390-396)
    any_fg = jnp.any(sp_f.group == rh.GROUP_A)
    cw = (jnp.asarray(cfg.classes_weight)
          if cfg.classes_weight else None)
    losses["loss_cls"] = jnp.where(
        any_fg,
        rh.classification_loss(scores_f, sp_f, cfg.num_classes,
                               cfg.bg_weight, cfg.loss_type,
                               classes_weight=cw,
                               prob_weighted=prob_weighted), 0.0)
    losses["loss_box_reg"] = rh.box_reg_loss(
        sp_f, _flat(deltas), cfg.num_classes, use_online_classes=False)

    # prototype EMA (fast_rcnn.py:399-412) over fg+bg rows
    feats_n = _normalize(jax.lax.stop_gradient(_flat(class_feats)))
    rows = (sp_f.group == rh.GROUP_A) | (sp_f.group == rh.GROUP_BG)
    one_hot = rh.one_hot_c1(sp_f.cls_offline, cfg.num_classes)
    new_proto = prototype_ema(proto, feats_n, one_hot, rows,
                              prototype_rate)
    new_proto = jnp.where(update_prototype, new_proto, proto)

    losses = apply_loss_weights(losses, loss_weights)
    return losses, new_proto


# ------------------------------------------------------------------ #
# final adaptation (step_one / step_two)
# ------------------------------------------------------------------ #
def student_forward(model, variables, images, images_hw,
                    matched_rcnn: MatchedSets, matched_rpn: MatchedSets,
                    class_tokens: jnp.ndarray, rng: jax.Array,
                    cfg: pipelines.PipelineConfig,
                    step_two: jnp.ndarray, proto: jnp.ndarray,
                    merge_probs_fn=None,
                    cls_b_thresh: float = 0.7) -> StudentForward:
    """The student's single forward with all non-merge losses (branch
    step_one/step_two of clip_roi_heads.py:178-256 + fast_rcnn.py:440-571;
    RPN per rpn.py:87-109). ``merge_probs_fn(feats_b, probs_off, probs_on)``
    computes the detached CKG fusion used by loss_cls_b."""
    b = images.shape[0]
    feats = model.apply(variables, images, method="features")
    anchors = pipelines._anchors_for(images, cfg)
    obj, rpn_deltas, proposals = pipelines.rpn_forward(
        model, variables, feats, images_hw, anchors, cfg, True)

    rng_rpn, rng_roi = jax.random.split(rng)
    rpn_targets = jax.vmap(
        lambda a, c, k: rpn_lib.label_anchors_single(
            anchors, a, c, k, cfg.rpn_batch_size,
            cfg.rpn_positive_fraction, cfg.rpn_thresholds)
    )(matched_rpn.a, matched_rpn.c, jax.random.split(rng_rpn, b))
    losses = rpn_lib.rpn_losses(anchors, obj, rpn_deltas, rpn_targets,
                                cfg.rpn_batch_size, calc_bg=cfg.bg_train,
                                with_distillation=True)

    sp = jax.vmap(
        lambda p, a, bb, bco, bpo, c, k: rh.sample_proposals_single(
            p, a, bb, c, cfg.num_classes, k, cfg.roi_batch_size,
            cfg.roi_positive_fraction, cfg.roi_iou_threshold,
            b_cls_online=bco, b_probs_online=bpo, bg_train=cfg.bg_train)
    )(proposals, matched_rcnn.a, matched_rcnn.b,
      matched_rcnn.b_cls_online, matched_rcnn.b_probs_online,
      matched_rcnn.c, jax.random.split(rng_roi, b))

    # sampled + private (C) boxes share ONE pool/res5/predict tower:
    # same math as two passes (RoIAlign and res5 are per-roi), but the
    # crops batch into one GEMM stream and the backward carries a single
    # res5 program instead of two (fast_rcnn.py runs them separately)
    n_sp = sp.boxes.shape[1]
    all_boxes = jnp.concatenate([sp.boxes, matched_rcnn.c.boxes], axis=1)
    all_pooled = model.apply(variables, feats, all_boxes,
                             cfg.pooler_resolution, method="pool_boxes")
    text = model.apply(variables, class_tokens, method="text_features")
    all_scores, all_deltas, all_feats = model.apply(
        variables, all_pooled, text, method="predict")
    scores, c_scores = all_scores[:, :n_sp], all_scores[:, n_sp:]
    deltas = all_deltas[:, :n_sp]
    class_feats = all_feats[:, :n_sp]
    pooled = all_pooled[:, :n_sp]

    sp_f = rh.SampledProposals(*[_flat(x) for x in sp])
    scores_f = _flat(scores)
    class_feats_f = _flat(class_feats)
    pooled_f = _flat(pooled)
    c_scores_f = _flat(c_scores)
    c_probs_f = _flat(matched_rcnn.c.probs)
    c_valid_f = _flat(matched_rcnn.c.valid)

    losses["loss_text_align"] = text_align_loss(text, proto)
    cw = (jnp.asarray(cfg.classes_weight)
          if cfg.classes_weight else None)
    losses["loss_cls"] = rh.classification_loss(
        scores_f, sp_f, cfg.num_classes, cfg.bg_weight, cfg.loss_type,
        classes_weight=cw)

    # C-box probability distillation (fast_rcnn.py:540-545)
    any_c = jnp.any(c_valid_f)
    logp_c = jax.nn.log_softmax(c_scores_f, axis=-1)
    losses["loss_distillation"] = jnp.where(
        any_c, rh.kl_mean_elements(jnp.log(
            jax.nn.softmax(c_scores_f, axis=-1) + 1e-7),
            c_probs_f, c_valid_f), 0.0)

    # loss_cls_b (step_two only, fast_rcnn.py:535-538): KL(log p_b || CKG)
    if merge_probs_fn is not None:
        b_rows = sp_f.group == rh.GROUP_B
        merge_b = jax.lax.stop_gradient(merge_probs_fn(
            jax.lax.stop_gradient(class_feats_f), sp_f.probs_offline,
            sp_f.probs_online))
        conf = (jnp.max(merge_b, axis=-1) >= cls_b_thresh) & b_rows
        p_b = jax.nn.softmax(scores_f, axis=-1)
        kl_b = rh.kl_mean_elements(jnp.log(p_b + 1e-7), merge_b, conf)
        losses["loss_cls_b"] = jnp.where(step_two & jnp.any(conf), kl_b,
                                         0.0)

    # box regression (fast_rcnn.py:565-569): class-agnostic → one loss
    # with the online classes; per-class columns → dual online/offline
    # losses (they share the fused gt box — trainer.py:427-429 sets B's
    # gt_boxes to the WBF merge — and differ only in which class picks
    # the fg mask / delta column on B rows)
    calc_bg = jnp.any(sp_f.group == rh.GROUP_BG)
    norm_fallback = float(cfg.roi_batch_size * b)
    total_rows = jnp.maximum(jnp.sum(sp_f.group != rh.GROUP_PAD), 1.0)
    denom = jnp.where(calc_bg, total_rows, norm_fallback)
    deltas_f = _flat(deltas)
    if cfg.cls_agnostic_bbox_reg:
        losses["loss_box_reg"] = rh.box_reg_loss(
            sp_f, deltas_f, cfg.num_classes, use_online_classes=True,
            normalizer=denom)
    else:
        losses["loss_box_reg_online"] = rh.box_reg_loss(
            sp_f, deltas_f, cfg.num_classes, use_online_classes=True,
            normalizer=denom)
        losses["loss_box_reg_offline"] = rh.box_reg_loss(
            sp_f, deltas_f, cfg.num_classes, use_online_classes=False,
            normalizer=denom)

    return StudentForward(losses, sp_f, scores_f, class_feats_f, pooled_f,
                          c_scores_f, c_probs_f, c_valid_f)


def merge_losses(merge_model, merge_params, student_variables, model,
                 fw: StudentForward, prototypes: Prototypes,
                 num_classes: int, text_features: jnp.ndarray,
                 grad_loss_scale: float = 1e4
                 ) -> Dict[str, jnp.ndarray]:
    """CKG training losses (fast_rcnn.py:519-533 + trainer.py:192-197):
    loss_merge_base (KL of fused A probs vs one-hot), loss_merge_a/b
    (MSEs), and loss_merge_grad — the gradient-direction alignment between
    the grads that loss_merge_a and loss_merge_b induce on the `trans` MLP
    (coin/utils/losses.py:75-96). Differentiable w.r.t. merge_params
    (second-order through trans)."""
    a_rows = fw.sp.group == rh.GROUP_A
    b_rows = fw.sp.group == rh.GROUP_B
    feats = jax.lax.stop_gradient(fw.class_feats)
    one_hot_a = rh.one_hot_c1(fw.sp.cls_offline, num_classes)

    def merge_apply(x, p_off, p_on):
        return merge_model.apply(
            {"params": merge_params}, x,
            jax.lax.stop_gradient(prototypes.b_offline),
            jax.lax.stop_gradient(prototypes.b_online), p_off, p_on)

    # one fused call covers both A rows (loss_merge_base target) and B
    # rows (alignment loss target) — rows are masked, not split
    merge_out = merge_apply(feats, fw.sp.probs_offline, fw.sp.probs_online)
    merge_b = merge_out

    losses = {}
    losses["loss_merge_base"] = rh.kl_mean_elements(
        jnp.log(merge_out + 1e-7), jax.lax.stop_gradient(one_hot_a),
        a_rows)

    # recompute scores as a function of the trans params for the
    # second-order alignment loss
    params = traverse_util.flatten_dict(student_variables["params"])
    trans_keys = [k for k in params
                  if "box_predictor" in "/".join(k) and "trans" in
                  "/".join(k)]
    trans_sub = {k: params[k] for k in trans_keys}

    def scores_with_trans(trans_params):
        merged = dict(params)
        merged.update(trans_params)
        sg = {k: (v if k in trans_params else jax.lax.stop_gradient(v))
              for k, v in merged.items()}
        variables2 = {"params": traverse_util.unflatten_dict(sg)}
        s, _, _ = model.apply(
            variables2, jax.lax.stop_gradient(fw.pooled),
            jax.lax.stop_gradient(text_features), method="predict")
        return s

    def loss_a_fn(tp):
        p_a = jax.nn.softmax(scores_with_trans(tp), axis=-1)
        return grad_loss_scale * rh.masked_mse(
            p_a, jax.lax.stop_gradient(one_hot_a), a_rows)

    def loss_b_fn(tp):
        p_b = jax.nn.softmax(scores_with_trans(tp), axis=-1)
        return grad_loss_scale * rh.masked_mse(p_b, merge_b, b_rows)

    grads_a = jax.grad(loss_a_fn)(trans_sub)
    grads_b = jax.grad(loss_b_fn)(trans_sub)
    losses["loss_merge_grad"] = L.gradient_discrepancy(grads_a, grads_b)

    # metric-only student-side merge MSEs (computed for parity logging)
    p_all = jax.nn.softmax(jax.lax.stop_gradient(fw.scores), axis=-1)
    losses["loss_merge_a"] = rh.masked_mse(
        p_all, jax.lax.stop_gradient(one_hot_a), a_rows)
    losses["loss_merge_b"] = rh.masked_mse(
        p_all, jax.lax.stop_gradient(merge_b), b_rows)
    return losses


def update_prototypes(prototypes: Prototypes, fw: StudentForward,
                      num_classes: int, rate: float,
                      enabled: jnp.ndarray) -> Prototypes:
    """The three EMA prototype updates (fast_rcnn.py:477-517)."""
    feats = _normalize(jax.lax.stop_gradient(fw.class_feats))
    a_rows = fw.sp.group == rh.GROUP_A
    b_rows = fw.sp.group == rh.GROUP_B
    bg_rows = fw.sp.group == rh.GROUP_BG
    any_b = jnp.any(b_rows)

    oh_off = rh.one_hot_c1(fw.sp.cls_offline, num_classes)
    oh_on = rh.one_hot_c1(fw.sp.cls_online, num_classes)

    proto = prototype_ema(prototypes.proto, feats, oh_off,
                          a_rows | bg_rows, rate)
    b_online = prototype_ema(prototypes.b_online, feats, oh_on,
                             a_rows | b_rows | bg_rows, rate)
    b_offline = prototype_ema(prototypes.b_offline, feats, oh_off,
                              a_rows | b_rows | bg_rows, rate)
    b_online = jnp.where(any_b, b_online, prototypes.b_online)
    b_offline = jnp.where(any_b, b_offline, prototypes.b_offline)

    sel = lambda new, old: jnp.where(enabled, new, old)
    return Prototypes(sel(proto, prototypes.proto),
                      sel(b_online, prototypes.b_online),
                      sel(b_offline, prototypes.b_offline))


def apply_loss_weights(losses: Dict[str, jnp.ndarray],
                       weights: Optional[Dict[str, float]]
                       ) -> Dict[str, jnp.ndarray]:
    if not weights:
        return losses
    return {k: v * weights.get(k, 1.0) for k, v in losses.items()}
