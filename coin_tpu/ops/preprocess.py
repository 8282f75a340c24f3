"""Device-side image preprocessing.

The reference resizes/normalizes per image on CPU (PIL in the mappers +
torchvision Compose inside the meta-arch forward — a flagged hot spot,
clip_rcnn.py:287-298). Here the whole stage runs on device:

- ``resize_bilinear``: aspect-preserving bilinear resize as two dense
  interpolation-matrix contractions (same MXU formulation as RoIAlign —
  resize is RoIAlign of the full-image box).
- ``normalize_flip``: microbenchmark fixture only (tools/
  bench_preprocess.py; BENCH.md "Pallas preprocess"). Production
  normalization lives in data/augment.py, and the horizontal flip is
  HOST-side in the loader (valid region, flip-before-pad) since round 3
  — a full-canvas device flip misaligns content and boxes whenever an
  image does not fill the canvas.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _resize_matrix(src: int, dst: int, scale: jnp.ndarray) -> jnp.ndarray:
    """(dst, src) PIL-BILINEAR weights: half-pixel centers with the
    triangle filter widened by 1/scale on downscale (PIL antialias) and
    row-normalized. Rows past round(src*scale) sample the clamped edge
    (callers mask them)."""
    scale = jnp.asarray(scale, jnp.float32)
    pos = (jnp.arange(dst, dtype=jnp.float32) + 0.5) / scale - 0.5
    pos = jnp.clip(pos, 0.0, src - 1)
    support = jnp.maximum(1.0, 1.0 / scale)
    grid = jnp.arange(src, dtype=jnp.float32)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - grid[None, :])
                       / support)
    return tent / jnp.maximum(jnp.sum(tent, axis=1, keepdims=True), 1e-8)


@partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear(image: jnp.ndarray, scale: jnp.ndarray,
                    out_hw: Tuple[int, int]) -> jnp.ndarray:
    """image (H0, W0, 3) uint8/float → (H1, W1, 3) float32, scaled by
    ``scale`` into the top-left corner of the static out canvas."""
    h0, w0, c = image.shape
    h1, w1 = out_hw
    img = image.astype(jnp.float32)
    ay = _resize_matrix(h0, h1, scale)            # (H1, H0)
    ax = _resize_matrix(w0, w1, scale)            # (W1, W0)
    tmp = jnp.einsum("yh,hwc->ywc", ay, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("ywc,xw->yxc", tmp, ax,
                     preferred_element_type=jnp.float32)
    # zero out the padding region beyond the scaled extent
    ys = jnp.arange(h1)[:, None, None]
    xs = jnp.arange(w1)[None, :, None]
    valid = (ys < jnp.round(h0 * scale)) & (xs < jnp.round(w0 * scale))
    return jnp.where(valid, out, 0.0)


# ------------------------------------------------------------------ #
# fused normalize + flip
# ------------------------------------------------------------------ #
def normalize_flip(images_u8: jnp.ndarray, flip: jnp.ndarray,
                   mean: jnp.ndarray, std: jnp.ndarray,
                   use_pallas: bool = None) -> jnp.ndarray:
    """(B, H, W, 3) uint8 + (B,) flip flags → normalized float32.

    Plain jnp by design — a Pallas version was built, debugged onto the
    real chip in round 3, and DELETED with measurements (BENCH.md
    "Pallas preprocess"): Mosaic lacks u8→f32 casts and the `rev`
    primitive (the flip), a vmapped SMEM scalar does not lower, and the
    in-step XLA fusion already runs this stage at 0.5 ms/step (0.4% of
    the cached step) — there is nothing material to win. The
    ``use_pallas`` parameter is kept (ignored) for call-site
    compatibility.
    """
    del use_pallas
    img = images_u8.astype(jnp.float32) / 255.0
    img = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
    return (img - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
