#!/usr/bin/env python
"""Microbench: alternative lowerings of the res5-over-crops convs.

res5 over RoI crops is ~91% of the adaptation step's FLOPs (BENCH.md
cost model), running at 66% MXU as XLA convolutions. This tool measures,
at the production crop shapes, whether a different lowering of the same
math beats XLA's conv:

  conv    — lax.conv_general_dilated (what flax nn.Conv emits today)
  shift9  — 3x3 conv as 9 shifted (N*H*W, Cin)@(Cin, Cout) matmuls
  im2col  — 3x3 conv as one (N*H*W, 9*Cin)@(9*Cin, Cout) matmul
  block   — the full bottleneck chain (conv1+bn+relu, conv2+bn+relu,
            avgpool, conv3+bn, downsample, relu) as conv vs matmul forms

Relative numbers only (run may share the chip with A/B campaigns);
timing = dependency-chained async with tail device_get (bench.py note).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        # chain: feed a scalar from the previous output into the input
        # so the relay cannot overlap/fake independent dispatches
        if prev is not None:
            args = (args[0] + prev * 0.0,) + args[1:]
        out = fn(*args)
        prev = out.ravel()[0]
    np.asarray(prev)  # force real execution of the whole chain
    return (time.perf_counter() - t0) / iters


def conv3x3_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv3x3_shift9(x, w):
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((n, h, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h, dx:dx + wd, :].reshape(-1, ci)
            out = out + jnp.dot(
                xs, w[dy, dx], preferred_element_type=jnp.float32
            ).reshape(n, h, wd, co)
    return out.astype(x.dtype)


def conv3x3_im2col(x, w):
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + wd, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    return jnp.dot(cols.reshape(-1, 9 * ci), w.reshape(9 * ci, co),
                   preferred_element_type=jnp.float32
                   ).reshape(n, h, wd, co).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    n = 3000
    dt = jnp.bfloat16
    x14 = jnp.asarray(rng.randn(n, 14, 14, 512), dt)
    w33 = jnp.asarray(rng.randn(3, 3, 512, 512) * 0.02, dt)
    w33m = w33  # same layout for matmul forms

    flops = 2 * n * 14 * 14 * 9 * 512 * 512

    for name, fn in (
        ("conv", jax.jit(conv3x3_xla)),
        ("shift9", jax.jit(conv3x3_shift9)),
        ("im2col", jax.jit(conv3x3_im2col)),
    ):
        dtm = timeit(fn, x14, w33m if name != "conv" else w33)
        print(f"3x3@14x14x512 {name:8s} {dtm*1e3:7.2f} ms  "
              f"{flops/dtm/1e12:6.1f} TF/s")

    # numerics cross-check
    a = conv3x3_xla(x14[:8], w33)
    b = conv3x3_shift9(x14[:8], w33m)
    c = conv3x3_im2col(x14[:8], w33m)
    print("max|conv-shift9| =", float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)))))
    print("max|conv-im2col| =", float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - c.astype(jnp.float32)))))

    # 1x1 convs as matmul (these should be near peak)
    x1 = jnp.asarray(rng.randn(n * 196, 1024), dt)
    wp = jnp.asarray(rng.randn(1024, 512) * 0.02, dt)

    @jax.jit
    def mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32
                       ).astype(x.dtype)

    dtm = timeit(mm, x1, wp)
    f = 2 * x1.shape[0] * 1024 * 512
    print(f"1x1 (588k,1024)@(1024,512)   {dtm*1e3:7.2f} ms  "
          f"{f/dtm/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
