#!/usr/bin/env python
"""Measure the Pallas fused normalize+flip kernel against the plain jnp
path on-chip (VERDICT r2 item 9): a "Pallas-native" framework should
know whether its one Pallas kernel beats XLA fusion, and by how much.

Times three variants at production preprocessing shapes (batch, 608,
1216, 3 uint8 -> two normalized float views):

  pallas — ops/preprocess.normalize_flip_pallas (fused HBM pass)
  jnp    — the dispatcher's jnp fallback (XLA-fused elementwise)
  batch  — data/augment.preprocess_batch (the production entry: strong
           + weak view, photometric aug) with each backend

  python tools/bench_preprocess.py [--batch 3] [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=3)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    from coin_tpu.utils.setup import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coin_tpu.ops.preprocess import normalize_flip

    b, h, w = args.batch, 608, 1216
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (b, h, w, 3), np.uint8))
    flip = jnp.asarray(rng.rand(b) > 0.5)
    mean = jnp.asarray([0.481, 0.457, 0.408], jnp.float32)
    std = jnp.asarray([0.268, 0.261, 0.275], jnp.float32)

    fns = {
        "pallas": lambda im, f: normalize_flip(
            im, f, mean, std, use_pallas=True),
        "jnp": lambda im, f: normalize_flip(
            im, f, mean, std, use_pallas=False),
    }

    # device-loop timing (BENCH.md "Microbenchmark methodology"): one
    # dispatch covers `iters` dependent executions — per-dispatch relay
    # latency would swamp a ~ms op, readiness events can be faked, and
    # a full-reduction feedback (runtime-zero, unfoldable) prevents
    # hoisting/narrowing.
    def timed(fn):
        iters = args.iters

        @jax.jit
        def loop(im, f):
            def body(i, im):
                y = fn(im, f)
                s = jnp.sum(y)
                return im + (s * 1e-30).astype(im.dtype)
            return jax.lax.fori_loop(0, iters, body, im)

        def run():
            return float(np.asarray(loop(images, flip).ravel()[0]))

        run()  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    res = {}
    for name, fn in fns.items():
        dt = timed(fn)
        out_bytes = b * h * w * 3 * 4
        res[name] = {"ms": round(dt * 1e3, 3),
                     "gbps": round(out_bytes * (1 + 0.25) / dt / 1e9, 1)}
    a = fns["pallas"](images, flip)
    bj = fns["jnp"](images, flip)
    max_diff = float(jnp.max(jnp.abs(a - bj)))
    report = {
        "shape": [b, h, w, 3],
        "pallas_ms": res["pallas"]["ms"],
        "jnp_ms": res["jnp"]["ms"],
        "speedup": round(res["jnp"]["ms"] / res["pallas"]["ms"], 3),
        "max_abs_diff": max_diff,
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
