"""Break down the adaptation train step cost on the real TPU.

Usage: python tools/profile_step.py [variant ...]
Variants: full, backbone_only, rpn_props, roi_only
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import optax

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from coin_tpu.engine import pipelines
from coin_tpu.engine.common import simple_class_tokens
from coin_tpu.engine.state import (default_freeze_predicate, merge_params,
                                   partition_params)
from coin_tpu.models.detector import OpenVocabularyRCNN
from coin_tpu.models import rpn as rpn_lib
from coin_tpu.models.anchors import grid_anchors
from coin_tpu.structures import Detections

NUM_CLASSES, B, H, W = 8, 3, 608, 1216


def build():
    model = OpenVocabularyRCNN(num_classes=NUM_CLASSES, depth=50,
                               compute_dtype=jnp.bfloat16)
    pcfg = pipelines.PipelineConfig(
        num_classes=NUM_CLASSES, pre_nms_topk_train=6000,
        post_nms_topk_train=1000, roi_batch_size=512, rpn_batch_size=256)
    tokens = jnp.asarray(simple_class_tokens(NUM_CLASSES + 1))
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    hw = jnp.tile(jnp.asarray([[H, W]], jnp.float32), (B, 1))
    gt = Detections(
        boxes=jnp.tile(jnp.asarray([[[16., 16., 160., 160.]]]),
                       (B, 16, 1)),
        scores=jnp.ones((B, 16)), classes=jnp.zeros((B, 16), jnp.int32),
        valid=jnp.ones((B, 16), bool), probs=None)
    variables = model.init(jax.random.key(0), images[:1], tokens,
                           jnp.asarray([[[0, 0, 64, 64]]], jnp.float32))
    params, frozen = partition_params(variables,
                                      default_freeze_predicate(True))
    return model, pcfg, tokens, images, hw, gt, params, frozen


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    variants = sys.argv[1:] or ["full", "backbone_only", "rpn_props",
                                "roi_only"]
    model, pcfg, tokens, images, hw, gt, params, frozen = build()
    variables = merge_params(params, frozen)
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)
    results = {}

    if "full" in variants:
        @jax.jit
        def full(params, opt_state, images):
            def loss_fn(p):
                losses = pipelines.oracle_train_losses(
                    model, merge_params(p, frozen), images, hw, gt,
                    tokens, jax.random.key(1), pcfg)
                return sum(losses.values())
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, o2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), o2, loss
        results["full"] = timeit(lambda im: full(params, opt_state, im),
                                 images)

    if "backbone_only" in variants:
        @jax.jit
        def bb(images):
            return model.apply(variables, images, method="features")
        results["backbone_fwd"] = timeit(bb, images)

        @jax.jit
        def bb_grad(params, images):
            def f(p):
                feats = model.apply(merge_params(p, frozen), images,
                                    method="features")
                return jnp.sum(feats.astype(jnp.float32) ** 2)
            return jax.grad(f)(params)
        results["backbone_fwdbwd"] = timeit(
            lambda im: bb_grad(params, im), images)

    if "rpn_props" in variants:
        feats = jax.jit(lambda im: model.apply(variables, im,
                                               method="features"))(images)
        anchors = jnp.asarray(grid_anchors(H // 16, W // 16, 16))

        @jax.jit
        def props(feats):
            obj, deltas = model.apply(variables, feats, method="rpn")
            return rpn_lib.predict_proposals(anchors, obj, deltas, hw,
                                             6000, 1000, 0.7)
        results["rpn_head+nms"] = timeit(props, feats)

    if "roi_only" in variants:
        feats = jax.jit(lambda im: model.apply(variables, im,
                                               method="features"))(images)
        rois = jnp.tile(jnp.asarray([[[10., 10., 200., 200.]]]),
                        (B, 512, 1))

        @jax.jit
        def roi(feats, rois):
            pooled = model.apply(variables, feats, rois, 14,
                                 method="pool_boxes")
            text = model.apply(variables, tokens, method="text_features")
            return model.apply(variables, pooled, text, method="predict")
        results["roi_pool_res5_heads_fwd"] = timeit(roi, feats, rois)

    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
