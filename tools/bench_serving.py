#!/usr/bin/env python
"""Serving-path throughput: targetDET inference, bf16 vs dynamic-int8.

Training throughput is bounded by A/B-validated semantics; SERVING is
not — the int8 MXU runs the hot conv shapes at ~1.8x bf16
(tools/bench_int8.py), and inference-only quantization (TPU.INT8_INFERENCE
/ models.clip_resnet.Int8Conv) applies it to 100% of the serving work.

Methodology (BENCH.md microbench rules): requests are dependency-chained
through a scalar carry folded into the next input at 1e-30 (runtime no-op,
not foldable), and the tail carry is fetched by VALUE — the relay cannot
report completion without executing the chain. Per-request sync numbers
are also reported (a serving system fetches every response).

  python tools/bench_serving.py [--batches 1,4,8] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--hw", default="608,1216")
    ap.add_argument("--out", default="bench_artifacts/bench_serving.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from coin_tpu.data.augment import normalize_batch
    from coin_tpu.engine import pipelines
    from coin_tpu.engine.common import simple_class_tokens
    from coin_tpu.models.detector import OpenVocabularyRCNN

    num_classes = 8
    h, w = (int(x) for x in args.hw.split(","))
    model = OpenVocabularyRCNN(num_classes=num_classes, depth=50,
                               compute_dtype=jnp.bfloat16)
    qmodel = model.clone(quant_convs=True)
    pcfg = pipelines.PipelineConfig(num_classes=num_classes)
    tokens = jnp.asarray(simple_class_tokens(num_classes + 1))

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randint(0, 255, (1, h, w, 3), np.uint8))
    variables = model.init(
        jax.random.key(0), normalize_batch(img1), tokens,
        jnp.asarray([[[0, 0, 64, 64]]], jnp.float32))

    def make_step(m):
        def step(variables, carry, images_u8, hw_arr):
            images = normalize_batch(images_u8) + (carry * 1e-30)
            dets = pipelines.inference(m, variables, images, hw_arr,
                                       tokens, pcfg)
            return jnp.sum(dets.scores.astype(jnp.float32)), dets
        return jax.jit(step)

    steps = {"bf16": make_step(model), "int8": make_step(qmodel)}
    results = {}
    for b in (int(x) for x in args.batches.split(",")):
        images = jnp.asarray(rng.randint(0, 255, (b, h, w, 3), np.uint8))
        hw_arr = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (b, 1))
        row = {}
        for name, fn in steps.items():
            carry = jnp.zeros((), jnp.float32)
            carry, dets = fn(variables, carry, images, hw_arr)  # compile
            jax.block_until_ready(dets)
            # chained (pipelined serving)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                carry, dets = fn(variables, carry, images, hw_arr)
            tail = float(jax.device_get(carry))
            dt = (time.perf_counter() - t0) / args.iters
            assert np.isfinite(tail)
            # per-request sync (request/response serving)
            ts = []
            for _ in range(max(args.iters // 3, 5)):
                t1 = time.perf_counter()
                carry, dets = fn(variables, carry, images, hw_arr)
                jax.block_until_ready(dets)
                ts.append(time.perf_counter() - t1)
            row[name] = {"images_per_sec_chained": round(b / dt, 2),
                         "images_per_sec_synced": round(b / min(ts), 2),
                         "ms_per_batch": round(dt * 1e3, 2)}
            print(f"b={b} {name}: {row[name]}", flush=True)
        row["int8_speedup"] = round(
            row["int8"]["images_per_sec_chained"]
            / row["bf16"]["images_per_sec_chained"], 3)
        results[f"batch_{b}"] = row

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
