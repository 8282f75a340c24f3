#!/usr/bin/env python
"""Measure cached/live adaptation-step rates at per-chip batch 3/6/12.

The cached step_one phase is 135k of foggy's 195k scheduled images, so
its rate dominates the weighted headline; TPUs amortize the step's
fixed cost over the per-chip batch (the reference's batch 3 is a GPU
memory artifact). bench.py measures b3 (recipe parity) and cached_b6
(the two-stage recipe's stage 1); this tool maps the curve further —
where does cached-step img/s saturate, and does the live step scale
too? Results feed the batch A/B decision (tools/validate_cached_teacher
--mode batch/batch_live) — a rate without an AP artifact ships as
headroom only.

  python tools/bench_batch_scaling.py [--batches 3,6,12] [--flavors cached,live]

Timing: dependency-chained async with tail device_get (bench.py note).
Relay 413 caveat: very large batches may exceed the remote-compile
payload limit; failures are reported per-batch, not fatal.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="3,6,12")
    p.add_argument("--flavors", default="cached,live")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from coin_tpu.engine import pipelines
    from coin_tpu.engine.common import simple_class_tokens
    from coin_tpu.engine.state import (Prototypes, TrainState,
                                       default_freeze_predicate,
                                       partition_params)
    from coin_tpu.engine.step_builder import (StepHyper,
                                              build_adaptation_steps)
    from coin_tpu.models.ckg import CKGNet
    from coin_tpu.models.detector import OpenVocabularyRCNN
    from coin_tpu.structures import Detections

    num_classes, h, w, cap = 8, 608, 1216, 128
    model = OpenVocabularyRCNN(num_classes=num_classes, depth=50,
                               compute_dtype=jnp.bfloat16)
    pcfg = pipelines.PipelineConfig(
        num_classes=num_classes, pre_nms_topk_train=6000,
        post_nms_topk_train=1000, pre_nms_topk_test=6000,
        post_nms_topk_test=1000, roi_batch_size=512, rpn_batch_size=256)
    # live flavor at the fast-recipe teacher budget (the shipped knob)
    pcfg_t512 = dataclasses.replace(pcfg, pre_nms_topk_test=3000,
                                    post_nms_topk_test=512)
    tokens = jnp.asarray(simple_class_tokens(num_classes + 1))
    merge_model = CKGNet(hidden_size=1024, num_classes=num_classes + 1)
    rng0 = np.random.RandomState(0)

    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, h, w, 3), jnp.float32), tokens,
        jnp.asarray([[[0, 0, 64, 64]]], jnp.float32))
    params, frozen = partition_params(variables,
                                      default_freeze_predicate(True))
    merge_vars = merge_model.init(
        jax.random.key(1), jnp.zeros((2, 1024)),
        jnp.zeros((num_classes + 1, 1024)),
        jnp.zeros((num_classes + 1, 1024)),
        jnp.zeros((2, num_classes + 1)), jnp.zeros((2, num_classes + 1)))
    proto0 = jnp.asarray(rng0.randn(num_classes + 1, 1024), jnp.float32)
    tx = optax.sgd(1e-3, momentum=0.9)
    merge_tx = optax.sgd(1e-3, momentum=0.9)

    def fresh_state():
        return TrainState(
            params=params, frozen=frozen, opt_state=tx.init(params),
            step=jnp.asarray(0), rng=jax.random.key(2),
            prototypes=Prototypes(proto0, proto0, proto0),
            teacher_params=jax.tree.map(jnp.copy, params),
            merge_params=merge_vars["params"],
            merge_opt_state=merge_tx.init(merge_vars["params"]))

    live, cached = build_adaptation_steps(
        model, merge_model, tx, merge_tx, tokens, pcfg, pcfg_t512,
        StepHyper(burn_up=10, proto_start=0))

    def make_inputs(bsz):
        images_u8 = jnp.asarray(
            rng0.randint(0, 255, (bsz, h, w, 3), np.uint8))
        image_hw = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (bsz, 1))

        def synth(n, capn):
            boxes = rng0.uniform(0, 500, (bsz, capn, 4)).astype(np.float32)
            boxes[..., 2:] = boxes[..., :2] + rng0.uniform(
                32, 160, (bsz, capn, 2))
            classes = rng0.randint(0, num_classes, (bsz, capn))
            probs = np.full((bsz, capn, num_classes + 1), 0.02, np.float32)
            for i in range(bsz):
                probs[i, np.arange(capn), classes[i]] = 0.8
            valid = np.zeros((bsz, capn), bool)
            valid[:, :n] = True
            return Detections(boxes=jnp.asarray(boxes),
                              scores=jnp.asarray(probs.max(-1)),
                              classes=jnp.asarray(classes, jnp.int32),
                              valid=jnp.asarray(valid),
                              probs=jnp.asarray(probs))

        return (images_u8, image_hw, synth(24, cap), synth(32, cap),
                synth(40, 100))

    def run_chain(fn, state, ins, extra, iters):
        t0 = time.perf_counter()
        losses = None
        for _ in range(iters):
            state, losses = fn(state, *ins, *extra)
        tail = float(sum(np.asarray(v)
                         for v in jax.device_get(losses).values()))
        assert np.isfinite(tail)
        return state, (time.perf_counter() - t0) / iters

    results = {}
    for bsz in [int(x) for x in args.batches.split(",")]:
        ins = make_inputs(bsz)
        for flavor in args.flavors.split(","):
            fn = cached if flavor == "cached" else live
            extra = (ins[5],) if flavor == "cached" else ()
            key = f"{flavor}_b{bsz}"
            try:
                st = fresh_state()
                t0 = time.perf_counter()
                st, losses = fn(st, *ins[:5], *extra)
                jax.device_get(jax.tree.leaves(losses)[0])
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(args.rounds):
                    st, dt = run_chain(fn, st, ins[:5], extra, args.iters)
                    best = min(best, dt)
                results[key] = {"img_per_s": round(bsz / best, 3),
                                "step_ms": round(best * 1e3, 2),
                                "compile_s": round(compile_s, 1)}
            except Exception as e:  # 413 / OOM: record, continue
                results[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(key, "->", results[key], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
