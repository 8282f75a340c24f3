#!/usr/bin/env python
"""Benchmark: FULL adaptation throughput (images/sec/chip).

Measures BOTH flavors of the CoinTrainer jitted step at the reference's
production shapes (Foggy-Cityscapes: batch 3, 600-short-side canvas,
8 classes; foggy.yaml:15):

- **live** — EMA teacher update, teacher forward + NMS on the weak
  view, dual-teacher A/B/C matching, student forward/backward with the
  complete loss stack, CKG merge training (second-order gradient
  alignment), prototype EMA. This is every step of the reference's
  training loop.
- **cached-teacher** — identical step minus the teacher tower, fed by
  the one-time teacher-prediction cache. Exact for the step_one phase
  (the teacher is frozen until burn-up; trainer.py:169-172), which is
  45k of foggy's 65k iterations.

The headline value is the schedule-weighted production rate of a foggy
run (45k cached + 20k live); the per-flavor rates are included in the
same JSON line.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference publishes no throughput; BASELINE.json's north
star is ≥5× its PyTorch adaptation step per chip. REF_IMAGES_PER_SEC
estimates the reference on its published hardware (1× RTX 3090: teacher
forward + student double-backward at batch 3 ≈ 2.5 it/s ≈ 7.5 img/s).
"""

from __future__ import annotations

import json
import os
import time

REF_IMAGES_PER_SEC = 7.5
BURN_UP, MAX_ITER = 45000, 65000  # foggy.yaml schedule


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from coin_tpu.engine import coin_pipelines, pipelines
    from coin_tpu.engine.common import simple_class_tokens
    from coin_tpu.engine.matching import match_dual_teacher_single
    from coin_tpu.engine.state import (Prototypes, default_freeze_predicate,
                                       merge_params, partition_params)
    from coin_tpu.models.ckg import CKGNet
    from coin_tpu.models.detector import OpenVocabularyRCNN
    from coin_tpu.structures import Detections, truncate

    num_classes = 8
    # COIN_BENCH_BATCH: informational batch-scaling runs (TPUs amortize
    # fixed step cost over larger per-chip batches; the reference's
    # batch 3 is a GPU-memory artifact). Default 3 = headline parity.
    b = int(os.environ.get("COIN_BENCH_BATCH", "3"))
    h, w = 608, 1216
    cap = 128

    model = OpenVocabularyRCNN(num_classes=num_classes, depth=50,
                               compute_dtype=jnp.bfloat16)
    pcfg = pipelines.PipelineConfig(
        num_classes=num_classes,
        pre_nms_topk_train=6000, post_nms_topk_train=1000,
        pre_nms_topk_test=6000, post_nms_topk_test=1000,
        roi_batch_size=512, rpn_batch_size=256)
    tokens = jnp.asarray(simple_class_tokens(num_classes + 1))
    merge_model = CKGNet(hidden_size=1024, num_classes=num_classes + 1)

    rng0 = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng0.randint(0, 255, (b, h, w, 3), np.uint8))
    image_hw = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (b, 1))
    flip = jnp.zeros((b,), bool)

    def synth_online(n):
        boxes = rng0.uniform(0, 500, (b, cap, 4)).astype(np.float32)
        boxes[..., 2:] = boxes[..., :2] + rng0.uniform(
            32, 160, (b, cap, 2))
        classes = rng0.randint(0, num_classes, (b, cap))
        probs = np.full((b, cap, num_classes + 1), 0.02, np.float32)
        for i in range(b):
            probs[i, np.arange(cap), classes[i]] = 0.8
        valid = np.zeros((b, cap), bool)
        valid[:, :n] = True
        return Detections(
            boxes=jnp.asarray(boxes),
            scores=jnp.asarray(probs.max(-1)),
            classes=jnp.asarray(classes, jnp.int32)[..., :],
            valid=jnp.asarray(valid),
            probs=jnp.asarray(probs))

    online_rcnn = synth_online(24)
    online_rpn = synth_online(32)
    offline_sets = synth_online(40)
    offline_sets = jax.tree.map(lambda x: x[:, :100] if hasattr(
        x, "shape") and x.ndim >= 2 else x, offline_sets)

    variables = model.init(jax.random.key(0), images_u8[:1].astype(
        jnp.float32), tokens, jnp.asarray([[[0, 0, 64, 64]]], jnp.float32))
    params, frozen = partition_params(variables,
                                      default_freeze_predicate(True))
    merge_vars = merge_model.init(
        jax.random.key(1), jnp.zeros((2, 1024)),
        jnp.zeros((num_classes + 1, 1024)),
        jnp.zeros((num_classes + 1, 1024)),
        jnp.zeros((2, num_classes + 1)), jnp.zeros((2, num_classes + 1)))
    proto0 = jnp.asarray(rng0.randn(num_classes + 1, 1024), jnp.float32)
    protos = Prototypes(proto0, proto0, proto0)

    tx = optax.sgd(1e-3, momentum=0.9)
    merge_tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)
    merge_opt_state = merge_tx.init(merge_vars["params"])
    teacher = jax.tree.map(jnp.copy, params)

    from coin_tpu.data.augment import preprocess_batch

    def step_tail(params, frozen, teacher, merge_p, opt_state,
                  merge_opt_state, protos, rng, step, step_two, strong,
                  rng_fwd, offline, pcfg):
        """Matching + student update + CKG merge update + prototype EMA
        (shared by all step flavors); ``pcfg`` sets the student shapes
        (ROI batch)."""
        box_a_w = jnp.where(step_two, 0.5, 1.0)
        matched_rcnn = jax.vmap(lambda o, f: match_dual_teacher_single(
            o, f, 0.5, box_a_w, with_b=True))(online_rcnn, offline)
        matched_rpn = jax.vmap(lambda o, f: match_dual_teacher_single(
            o, f, 0.5, box_a_w, with_b=False))(online_rpn, offline)
        matched_rcnn = matched_rcnn._replace(
            c=truncate(matched_rcnn.c, 64))
        matched_rpn = matched_rpn._replace(
            c=truncate(matched_rpn.c, 64))

        def merge_probs_fn(feats_b, p_off, p_on):
            return merge_model.apply({"params": merge_p}, feats_b,
                                     protos.b_offline, protos.b_online,
                                     p_off, p_on)

        def loss_fn(p):
            fw = coin_pipelines.student_forward(
                model, merge_params(p, frozen), strong, image_hw,
                matched_rcnn, matched_rpn, tokens, rng_fwd, pcfg,
                step_two, protos.proto, merge_probs_fn, 0.7)
            return sum(fw.losses.values()), fw

        (loss, fw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        student_vars = merge_params(params, frozen)
        text = model.apply(student_vars, tokens, method="text_features")

        def merge_loss_fn(mp):
            ml = coin_pipelines.merge_losses(
                merge_model, mp, student_vars, model, fw, protos,
                num_classes, text)
            return ml["loss_merge_grad"] + ml["loss_merge_base"], ml

        (_, _), mgrads = jax.value_and_grad(merge_loss_fn, has_aux=True)(
            merge_p)
        mupdates, merge_opt_state = merge_tx.update(
            mgrads, merge_opt_state, merge_p)
        merge_p = optax.apply_updates(merge_p, mupdates)

        protos = coin_pipelines.update_prototypes(
            protos, fw, num_classes, 0.9996, jnp.asarray(True))
        return (new_params, teacher, merge_p, opt_state, merge_opt_state,
                protos, rng, step + 1, loss)

    @jax.jit
    def adaptation_step(params, frozen, teacher, merge_p, opt_state,
                        merge_opt_state, protos, rng, step):
        step_two = step >= 10
        rng, rng_aug, rng_fwd = jax.random.split(rng, 3)
        strong, weak = preprocess_batch(images_u8, flip, rng_aug)

        do_ema = step_two
        teacher = jax.tree.map(
            lambda t, s: jnp.where(do_ema, t * 0.9996 + s * 0.0004, t),
            teacher, params)

        teacher_vars = merge_params(teacher, frozen)
        offline = pipelines.inference(model, teacher_vars, weak, image_hw,
                                      tokens, pcfg)
        offline = jax.lax.stop_gradient(offline)
        return step_tail(params, frozen, teacher, merge_p, opt_state,
                         merge_opt_state, protos, rng, step, step_two,
                         strong, rng_fwd, offline, pcfg)

    import dataclasses as _dc
    # fast recipe (configs/coin/GDINO/foggy_fast.yaml): cached step_one
    # (AP-validated) + teacher proposal budget 512 for the live phase.
    # The teacher FAST HEAD and the ROI-256 student batch are measured
    # here for documentation but FAILED their AP A/Bs (BENCH.md) and
    # are NOT part of the recipe.
    pcfg_t512 = _dc.replace(pcfg, pre_nms_topk_test=3000,
                            post_nms_topk_test=512)
    pcfg_fast = _dc.replace(pcfg_t512, fast_head=True)
    pcfg_r256 = _dc.replace(pcfg, roi_batch_size=256)

    def make_live_step(teacher_pcfg, student_pcfg):
        @jax.jit
        def live_step(params, frozen, teacher, merge_p, opt_state,
                      merge_opt_state, protos, rng, step):
            step_two = step >= 10
            rng, rng_aug, rng_fwd = jax.random.split(rng, 3)
            strong, weak = preprocess_batch(images_u8, flip, rng_aug)
            teacher_t = jax.tree.map(
                lambda t, s: jnp.where(step_two,
                                       t * 0.9996 + s * 0.0004, t),
                teacher, params)
            teacher_vars = merge_params(teacher_t, frozen)
            offline = pipelines.inference(model, teacher_vars, weak,
                                          image_hw, tokens, teacher_pcfg)
            offline = jax.lax.stop_gradient(offline)
            return step_tail(params, frozen, teacher_t, merge_p,
                             opt_state, merge_opt_state, protos, rng,
                             step, step_two, strong, rng_fwd, offline,
                             student_pcfg)
        return live_step

    adaptation_step_fast = make_live_step(pcfg_fast, pcfg)
    adaptation_step_t512 = make_live_step(pcfg_t512, pcfg)

    def make_cached_step(student_pcfg):
        @jax.jit
        def cached_step(params, frozen, teacher, merge_p, opt_state,
                        merge_opt_state, protos, rng, step, offline_dets):
            step_two = step >= 10
            rng, rng_aug, rng_fwd = jax.random.split(rng, 3)
            strong, weak = preprocess_batch(images_u8, flip, rng_aug)
            offline = offline_dets  # cached teacher: no teacher tower
            return step_tail(params, frozen, teacher, merge_p, opt_state,
                             merge_opt_state, protos, rng, step, step_two,
                             strong, rng_fwd, offline, student_pcfg)
        return cached_step

    cached_step = make_cached_step(pcfg)
    cached_step_r256 = make_cached_step(pcfg_r256)

    def measure(step_fn, extra, iters=10):
        """Per-iteration device sync. A single block_until_ready on the
        tail of an async chain is NOT reliable through the remote-TPU
        relay (observed: a 10-step chain 'completing' in 24 ms), so each
        step is synced; the dispatch bubble makes this a conservative
        number."""
        st = [params, teacher, merge_vars["params"], opt_state,
              merge_opt_state, protos, jax.random.key(2), jnp.asarray(0)]

        def call(s):
            out = step_fn(s[0], frozen, s[1], s[2], s[3], s[4], s[5],
                          s[6], s[7], *extra)
            return list(out[:8]), out[8]

        st, loss = call(st)
        jax.block_until_ready(loss)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            st, loss = call(st)
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)
        dt = min(times)  # best-of: strips stragglers/relay jitter
        assert dt > 0.005, f"implausible step time {dt*1e3:.1f} ms"
        return b / dt

    live = measure(adaptation_step, ())
    cached = measure(cached_step, (offline_sets,))
    live_fast = measure(adaptation_step_fast, ())
    cached_r256 = measure(cached_step_r256, (offline_sets,))
    live_t512 = measure(adaptation_step_t512, ())

    # schedule-weighted production rate: step_one runs cached (teacher
    # frozen pre-burn-up), step_two runs live
    w_cached = BURN_UP / MAX_ITER

    def sched(c, l):
        return 1.0 / (w_cached / c + (1.0 - w_cached) / l)

    # parity recipe: reference shapes (ROI 512, teacher budget 1000,
    # exact head), cached step_one (AP-equivalence validated —
    # tools/validate_cached_teacher.py, BENCH.md)
    weighted_parity = sched(cached, live)
    # fast recipe (foggy_fast.yaml): cached step_one + exact-head live
    # step_two at teacher budget 512 (reference ROI batch 512 kept —
    # the ROI-256 cut failed its AP A/B)
    weighted_fast = sched(cached, live_t512)
    print(json.dumps({
        "metric": "adaptation_images_per_sec_per_chip",
        "value": round(weighted_fast, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(weighted_fast / REF_IMAGES_PER_SEC, 3),
        "parity_recipe": round(weighted_parity, 3),
        "parity_vs_baseline": round(weighted_parity / REF_IMAGES_PER_SEC,
                                    3),
        "live_step": round(live, 3),
        "cached_teacher_step": round(cached, 3),
        "live_fast_head_step": round(live_fast, 3),
        "cached_roi256_step": round(cached_r256, 3),
        "live_t512_step": round(live_t512, 3),
        "schedule": f"{BURN_UP // 1000}k cached + "
                    f"{(MAX_ITER - BURN_UP) // 1000}k live (foggy)",
    }))


if __name__ == "__main__":
    main()
