#!/usr/bin/env python
"""Microbench: int8 MXU rate vs bf16 at the adaptation step's hot shapes.

TPU v5e quotes 2x peak for int8 vs bf16 (394 TOPS vs 197 TFLOP/s). If
XLA actually hits that on our shapes, an int8-quantized TEACHER tower
(inference-only — the student must stay bf16 for training) is a
~30%-of-step-FLOPs lever for the live phase.

Timing methodology for the remote-TPU relay: per-dispatch latency
through the relay is tens of ms, which swamps single-op timings (an
earlier per-dispatch version of this tool measured a 128 ms "matmul").
So the repeat loop runs ON DEVICE — ``lax.fori_loop`` around the op,
output fed back into the input so the loop cannot be collapsed — and
one dispatch times INNER_ITERS executions.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INNER = 30


def timeit_scan(step, x, w, iters=INNER, reps=3):
    """step(x, w) -> array castable back to x's dtype/shape leading slice.
    Runs `iters` dependent executions inside ONE jitted call."""

    @jax.jit
    def loop(x, w):
        def body(i, x):
            y = step(x, w)
            # route a scalar derived from ALL of y into the carried x:
            # a full reduction prevents XLA from narrowing the op to
            # the consumed slice (feeding back y[0] let XLA compute a
            # single conv output element per "iteration" — 1500 TF/s
            # mirages), and s*1e-30 is zero at RUNTIME but not foldable
            # at compile time, so iterations stay sequential (no
            # hoisting/CSE/DCE). Costs one ~memory-rate reduction per
            # iteration — a small overestimate of each op's time.
            s = jnp.sum(y.astype(jnp.float32))
            return x + (s * 1e-30).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    def fetch(o):
        # device_get of an actual VALUE: readiness events can be faked
        # by the relay (BENCH.md), produced bytes cannot
        return float(np.asarray(o.ravel()[0]))

    fetch(loop(x, w))                   # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(loop(x, w))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    rng = np.random.RandomState(0)

    def report(tag, dt, flops):
        print(f"{tag:44s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} T/s",
              flush=True)

    # ---- matmul shapes (the 1x1 convs of res5-over-crops) ----
    for m, k, n in ((3000 * 196, 1024, 512), (3000 * 49, 2048, 512)):
        a8 = jnp.asarray(rng.randint(-127, 127, (m, k), np.int8))
        b8 = jnp.asarray(rng.randint(-127, 127, (k, n), np.int8))
        abf = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        bbf = jnp.asarray(rng.randn(k, n) * 0.02, jnp.bfloat16)
        f = 2 * m * k * n

        def mm_i8(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def mm_bf(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        report(f"mm int8 ({m},{k})@({k},{n})",
               timeit_scan(mm_i8, a8, b8), f)
        report(f"mm bf16 ({m},{k})@({k},{n})",
               timeit_scan(mm_bf, abf, bbf), f)

    # ---- 3x3 conv at crop shapes (shape-preserving: y feeds back) ----
    ncrop = 3000
    x8 = jnp.asarray(rng.randint(-127, 127, (ncrop, 14, 14, 512), np.int8))
    w8 = jnp.asarray(rng.randint(-127, 127, (3, 3, 512, 512), np.int8))
    xbf = jnp.asarray(rng.randn(ncrop, 14, 14, 512), jnp.bfloat16)
    wbf = jnp.asarray(rng.randn(3, 3, 512, 512) * 0.02, jnp.bfloat16)
    f = 2 * ncrop * 14 * 14 * 9 * 512 * 512

    def conv(x, w, ptype):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype)

    report("conv3x3 int8 (3000,14,14,512)",
           timeit_scan(partial(conv, ptype=jnp.int32), x8, w8), f)
    report("conv3x3 bf16 (3000,14,14,512)",
           timeit_scan(partial(conv, ptype=jnp.float32), xbf, wbf), f)

    # im2col int8 (fallback if int8 conv doesn't hit the MXU int8 path)
    def im2col(x, w, ptype):
        n, h, wd, ci = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dy:dy + h, dx:dx + wd, :]
             for dy in range(3) for dx in range(3)], axis=-1)
        return jax.lax.dot_general(
            cols.reshape(-1, 9 * ci), w.reshape(9 * ci, co),
            (((1,), (0,)), ((), ())), preferred_element_type=ptype)

    report("im2col3x3 int8 (3000,14,14,512)",
           timeit_scan(partial(im2col, ptype=jnp.int32), x8, w8), f)
    report("im2col3x3 bf16 (3000,14,14,512)",
           timeit_scan(partial(im2col, ptype=jnp.float32), xbf, wbf), f)


if __name__ == "__main__":
    main()
