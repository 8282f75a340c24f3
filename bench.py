#!/usr/bin/env python
"""Benchmark: adaptation-step throughput (images/sec/chip) on the flagship
detector train step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no throughput; the
north-star target is ≥5× the reference PyTorch adaptation step per chip.
``REF_IMAGES_PER_SEC`` is an estimate of the reference on its published
hardware (1× RTX 3090, batch 3, detectron2 C4 R50 dual-forward step ≈ 3
it/s ≈ 9 img/s); vs_baseline = ours / that estimate.
"""

from __future__ import annotations

import json
import time

REF_IMAGES_PER_SEC = 9.0


def main():
    import os

    import jax
    import jax.numpy as jnp
    import optax

    # persistent compilation cache: repeated bench runs skip the slow
    # remote compile
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from coin_tpu.engine import pipelines
    from coin_tpu.engine.common import simple_class_tokens
    from coin_tpu.engine.state import (default_freeze_predicate,
                                       merge_params, partition_params)
    from coin_tpu.models.detector import OpenVocabularyRCNN
    from coin_tpu.structures import Detections

    num_classes = 8           # Cityscapes/Foggy class count
    b = 3                     # reference batch size (foggy.yaml:15)
    h, w = 608, 1216          # foggy 600-short-side canvas

    model = OpenVocabularyRCNN(num_classes=num_classes, depth=50,
                               compute_dtype=jnp.bfloat16)
    pcfg = pipelines.PipelineConfig(
        num_classes=num_classes,
        pre_nms_topk_train=6000, post_nms_topk_train=1000,
        roi_batch_size=512, rpn_batch_size=256)
    tokens = jnp.asarray(simple_class_tokens(num_classes + 1))

    images = jnp.zeros((b, h, w, 3), jnp.float32)
    image_hw = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (b, 1))
    gt = Detections(
        boxes=jnp.tile(jnp.asarray([[[16.0, 16.0, 160.0, 160.0]]]),
                       (b, 16, 1)),
        scores=jnp.ones((b, 16)),
        classes=jnp.zeros((b, 16), jnp.int32),
        valid=jnp.ones((b, 16), bool),
        probs=None)

    variables = model.init(jax.random.key(0), images[:1], tokens,
                           jnp.asarray([[[0, 0, 64, 64]]], jnp.float32))
    params, frozen = partition_params(variables,
                                      default_freeze_predicate(True))
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, rng, images, image_hw, gt):
        def loss_fn(p):
            losses = pipelines.oracle_train_losses(
                model, merge_params(p, frozen), images, image_hw, gt,
                tokens, rng, pcfg)
            return sum(losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.key(0)
    # warmup/compile
    params, opt_state, loss = train_step(params, opt_state, rng, images,
                                         image_hw, gt)
    loss.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        rng = jax.random.fold_in(rng, i)
        params, opt_state, loss = train_step(params, opt_state, rng,
                                             images, image_hw, gt)
    loss.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = b * iters / dt
    print(json.dumps({
        "metric": "train_step_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REF_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
