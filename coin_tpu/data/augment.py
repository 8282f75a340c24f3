"""Device-side fused augmentation + normalization.

The reference does per-image CPU torchvision transforms
(coin/data/detection_utils.py:22-45 strong SimCLR-style photometric;
coin/data/dataset_mapper.py:363-450 weak resize/flip; meta-arch
preprocess_image normalizes on CPU per image — a noted hot spot,
clip_rcnn.py:287-298). Here the whole photometric + normalize + flip stage
is one jitted batched function on device; the host only decodes and
resizes to the static canvas.

Strong recipe (same distribution as the reference):
  ColorJitter(0.4, 0.4, 0.4, 0.1) p=0.8 → RandomGrayscale p=0.2 →
  GaussianBlur σ∈[0.1, 2] p=0.5 → Solarize(0.5) p=0.2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CLIP_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
CLIP_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

_GRAY = jnp.asarray([0.299, 0.587, 0.114])


def _color_jitter(img, key):
    kb, kc, ks, kh, korder = jax.random.split(key, 5)
    # torchvision samples each factor uniformly; order shuffled — we apply
    # in fixed order (distributionally close, shape-static)
    b = jax.random.uniform(kb, (), minval=0.6, maxval=1.4)
    c = jax.random.uniform(kc, (), minval=0.6, maxval=1.4)
    s = jax.random.uniform(ks, (), minval=0.6, maxval=1.4)
    h = jax.random.uniform(kh, (), minval=-0.1, maxval=0.1)
    img = img * b
    mean = jnp.mean(_GRAY @ jnp.transpose(img, (2, 0, 1)).reshape(3, -1))
    img = (img - mean) * c + mean
    gray = (img @ _GRAY)[..., None]
    img = (img - gray) * s + gray
    # cheap hue shift: rotate channels toward their mean
    img = img + h * (jnp.roll(img, 1, axis=-1) - img)
    return jnp.clip(img, 0.0, 1.0)


def _grayscale(img):
    g = (img @ _GRAY)[..., None]
    return jnp.broadcast_to(g, img.shape)


def _band_matrix(size: int, k: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(size, size) banded matrix B[i, j] = k[j - i + radius] (zero
    outside the band) — the separable blur as a dense MXU contraction.
    Identical to a zero-padded depthwise conv with kernel ``k``."""
    d = (jnp.arange(size)[None, :] - jnp.arange(size)[:, None]) + radius
    taps = k.shape[0]
    band = jnp.zeros((size, size), jnp.float32)
    for t in range(taps):
        band = band + jnp.where(d == t, k[t], 0.0)
    return band


def _gaussian_blur(img, key):
    """Separable Gaussian blur as two banded-matrix contractions.

    A depthwise conv at C=3 starves the MXU (3 of 128 lanes) — the
    round-3 trace showed the blur convs dominating the augmentation
    scope. The (H,H)@(H,W·C) banded form is the same math (zero-padded,
    bit-matching the previous grouped-conv version) at MXU-friendly
    shapes — the identical trick ops/preprocess.resize_bilinear uses.
    """
    sigma = jax.random.uniform(key, (), minval=0.1, maxval=2.0)
    radius = 4  # static kernel, covers sigma<=2 well
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    h, w, _ = img.shape
    by = _band_matrix(h, k, radius)                    # (H, H)
    bx = _band_matrix(w, k, radius)                    # (W, W)
    out = jnp.einsum("yh,hwc->ywc", by, img,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("ywc,xw->yxc", out, bx,
                      preferred_element_type=jnp.float32)


def _solarize(img, threshold=0.5):
    return jnp.where(img >= threshold, 1.0 - img, img)


def strong_augment_single(img: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """img (H, W, 3) float in [0,1] → strongly augmented image."""
    k1, k2, k3, k4, p1, p2, p3, p4 = jax.random.split(key, 8)
    img = jax.lax.cond(jax.random.uniform(p1) < 0.8,
                       lambda im: _color_jitter(im, k1), lambda im: im, img)
    img = jax.lax.cond(jax.random.uniform(p2) < 0.2,
                       _grayscale, lambda im: im, img)
    img = jax.lax.cond(jax.random.uniform(p3) < 0.5,
                       lambda im: _gaussian_blur(im, k3), lambda im: im, img)
    img = jax.lax.cond(jax.random.uniform(p4) < 0.2,
                       _solarize, lambda im: im, img)
    return img


@partial(jax.jit, static_argnames=())
def preprocess_batch(images_u8: jnp.ndarray,
                     rng: jax.Array, strong: bool = True):
    """uint8 (B, H, W, 3) → (strong_normalized, weak_normalized), each
    (B, H, W, 3) float32, CLIP-normalized. One fused kernel stack under
    jit. The horizontal flip happens on the HOST in the loader (valid
    region only, before padding — reference order) so flipped canvases
    are bit-identical between the train step and any offline inference
    pass over the same images."""
    img = images_u8.astype(jnp.float32) / 255.0
    weak = (img - CLIP_MEAN) / CLIP_STD
    keys = jax.random.split(rng, img.shape[0])
    s = jax.vmap(strong_augment_single)(img, keys)
    strong_n = (s - CLIP_MEAN) / CLIP_STD
    return strong_n, weak


@jax.jit
def normalize_batch(images_u8: jnp.ndarray) -> jnp.ndarray:
    img = images_u8.astype(jnp.float32) / 255.0
    return (img - CLIP_MEAN) / CLIP_STD
