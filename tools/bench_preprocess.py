#!/usr/bin/env python
"""Measure the normalize+flip preprocessing stage on-chip (VERDICT r2
item 9 resolution).

The Pallas variant of this op was DELETED in round 3 after being
debugged onto the real chip: Mosaic lacks u8->f32 casts and the `rev`
primitive, a vmapped SMEM scalar does not lower at all, and the
production step already XLA-fuses this stage to 0.5 ms/step (0.4% of
the cached step) — full story in BENCH.md "Pallas preprocess". This
tool times the surviving jnp path (device-loop methodology) so the
number stays reproducible.

  python tools/bench_preprocess.py [--batch 3] [--iters 30]
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
        "jnp": lambda im, f: normalize_flip(im, f, mean, std),
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
    report = {
        "shape": [b, h, w, 3],
        "jnp_ms": res["jnp"]["ms"],
        "jnp_gbps": res["jnp"]["gbps"],
        "note": "pallas variant deleted round 3 (BENCH.md)",
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
