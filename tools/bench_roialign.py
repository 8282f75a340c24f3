#!/usr/bin/env python
"""Microbench: RoIAlign formulations at the cached step's shapes.

VERDICT r3 item 4: the cached step spends ~15.4 ms in RoIAlign
fwd+bwd contractions, bandwidth-bound on the (N, 38, 14, 1024)
intermediate (1.9 GB/pass, BENCH.md step anatomy). This tool measures
candidate XLA-level reformulations at the production shapes
(B=3 images, 576 rois/image = 1728 crops, res4 (38, 64, 1024)):

  current   — two einsums, bf16 intermediate, long-dim-first
              (ops/roi_align.py as shipped)
  single    — one 3-operand einsum (XLA picks the contraction order)
  chunkK    — lax.map over roi-chunks of K (intermediate stays
              K-sized; tests whether XLA pipelines chunk compute
              against HBM traffic better than one huge dot)
  f32tmp    — the pre-round-3 f32 intermediate (regression guard for
              the bf16-intermediate win)

Each variant is measured fwd-only and fwd+bwd (grad wrt features —
the student path trains through RoIAlign; the boxes do not need
gradients). Device-loop methodology from tools/bench_int8.py: the
repeat loop runs on device with a full-reduction feedback so the
relay's per-dispatch latency and XLA's DCE cannot fake the number.

Run on the real chip:  python tools/bench_roialign.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.ops.roi_align import _interp_matrix, roi_align

INNER = 20
B, N, H, W, C = 3, 576, 38, 64, 1024
RES, SAMP = 14, 2


def _matrices(rois, h, w, scale=1.0 / 16.0):
    r = rois.astype(jnp.float32) * scale - 0.5
    x1, y1, x2, y2 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    ax = _interp_matrix(x1, (x2 - x1) / RES, RES, SAMP, w)
    ay = _interp_matrix(y1, (y2 - y1) / RES, RES, SAMP, h)
    return ay, ax


def v_current(feats, rois):
    return jax.vmap(lambda f, b: roi_align(f, b, 1.0 / 16.0, RES, SAMP))(
        feats, rois)


def v_single(feats, rois):
    def one(f, b):
        ay, ax = _matrices(b, f.shape[0], f.shape[1])
        dt = f.dtype
        return jnp.einsum("nrh,hwc,nsw->nrsc", ay.astype(dt), f,
                          ax.astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)
    return jax.vmap(one)(feats, rois)


def v_f32tmp(feats, rois):
    def one(f, b):
        ay, ax = _matrices(b, f.shape[0], f.shape[1])
        dt = f.dtype
        tmp = jnp.einsum("nsw,hwc->nhsc", ax.astype(dt), f,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("nrh,nhsc->nrsc", ay, tmp,
                          preferred_element_type=jnp.float32).astype(dt)
    return jax.vmap(one)(feats, rois)


def make_chunked(k):
    def v_chunked(feats, rois):
        def one(f, b):
            ay, ax = _matrices(b, f.shape[0], f.shape[1])
            dt = f.dtype

            def chunk(args):
                ayc, axc = args
                tmp = jnp.einsum("nsw,hwc->nhsc", axc.astype(dt), f,
                                 preferred_element_type=jnp.float32
                                 ).astype(dt)
                return jnp.einsum("nrh,nhsc->nrsc", ayc.astype(dt), tmp,
                                  preferred_element_type=jnp.float32
                                  ).astype(dt)

            n = ay.shape[0]
            ayc = ay.reshape(n // k, k, RES, f.shape[0])
            axc = ax.reshape(n // k, k, RES, f.shape[1])
            out = jax.lax.map(chunk, (ayc, axc))
            return out.reshape(n, RES, RES, -1)
        return jax.vmap(one)(feats, rois)
    return v_chunked


def timeit(fn, feats, rois, grad, iters=INNER, reps=3):
    if grad:
        def step(f):
            return jax.grad(
                lambda ff: jnp.sum(fn(ff, rois).astype(jnp.float32) ** 2)
            )(f)
    else:
        def step(f):
            return fn(f, rois)

    @jax.jit
    def loop(f):
        def body(i, f):
            y = step(f)
            s = jnp.sum(y.astype(jnp.float32))
            return f + (s * 1e-30).astype(f.dtype)
        return jax.lax.fori_loop(0, iters, body, f)

    def fetch(o):
        return float(np.asarray(o.ravel()[0]))

    fetch(loop(feats))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(loop(feats))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    xy = rng.rand(B, N, 2) * np.array([W * 16 - 64, H * 16 - 64])
    wh = 32 + rng.rand(B, N, 2) * np.array([W * 16 / 2, H * 16 / 2])
    rois = jnp.asarray(
        np.concatenate([xy, np.minimum(xy + wh,
                                       [W * 16 - 1, H * 16 - 1])], -1),
        jnp.float32)

    variants = {
        "current": v_current,
        "single": v_single,
        "f32tmp": v_f32tmp,
        "chunk64": make_chunked(64),
        "chunk144": make_chunked(144),
        "chunk288": make_chunked(288),
    }
    base = None
    ref = np.asarray(v_current(feats, rois), np.float32)
    results = {}
    for name, fn in variants.items():
        got = np.asarray(fn(feats, rois), np.float32)
        err = float(np.max(np.abs(got - ref)))
        fwd = timeit(fn, feats, rois, grad=False)
        fb = timeit(fn, feats, rois, grad=True)
        if base is None:
            base = fb
        results[name] = {"fwd_ms": fwd * 1e3, "fwdbwd_ms": fb * 1e3,
                         "max_abs_err_vs_current": err}
        print(f"{name:10s} fwd {fwd*1e3:7.2f} ms   fwd+bwd {fb*1e3:7.2f} ms"
              f"   ({base/fb:.2f}x vs current)   maxerr {err:.2e}",
              flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_artifacts",
        "bench_roialign.json")
    with open(out, "w") as f:
        json.dump({"shapes": {"B": B, "N": N, "H": H, "W": W, "C": C,
                              "res": RES},
                   "platform": jax.devices()[0].platform,
                   "results": results}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
