import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from coin_tpu.ops.preprocess import normalize_flip, resize_bilinear

MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def test_resize_matches_pil(rng):
    img = rng.randint(0, 255, (40, 60, 3)).astype(np.uint8)
    scale = 0.5
    out = np.asarray(resize_bilinear(jnp.asarray(img),
                                     jnp.asarray(scale), (32, 48)))
    ref = np.asarray(Image.fromarray(img).resize((30, 20), Image.BILINEAR),
                     np.float32)
    # interior pixels match PIL closely (PIL uses the same half-pixel
    # convention; borders may differ by clamping)
    np.testing.assert_allclose(out[1:19, 1:29], ref[1:19, 1:29], atol=2.0)
    # padding region zeroed
    assert np.abs(out[20:, :, :]).max() == 0.0
    assert np.abs(out[:, 30:, :]).max() == 0.0


def test_normalize_flip_jnp(rng):
    imgs = jnp.asarray(rng.randint(0, 255, (2, 16, 20, 3)).astype(
        np.uint8))
    flip = jnp.asarray([True, False])
    out = normalize_flip(imgs, flip, MEAN, STD, use_pallas=False)
    ref0 = (np.asarray(imgs)[0, :, ::-1].astype(np.float32) / 255.0
            - np.asarray(MEAN)) / np.asarray(STD)
    np.testing.assert_allclose(np.asarray(out)[0], ref0, rtol=1e-5,
                               atol=1e-5)


def test_normalize_flip_batch_consistency(rng):
    """Per-image flip flags act independently within a batch (the Pallas
    variant of this op was deleted in round 3 — see BENCH.md 'Pallas
    preprocess'; this pins the surviving jnp path)."""
    imgs = jnp.asarray(rng.randint(0, 255, (3, 32, 24, 3)).astype(
        np.uint8))
    flip = jnp.asarray([True, False, True])
    out = np.asarray(normalize_flip(imgs, flip, MEAN, STD))
    single = [np.asarray(normalize_flip(imgs[i:i + 1], flip[i:i + 1],
                                        MEAN, STD))[0] for i in range(3)]
    for i in range(3):
        np.testing.assert_allclose(out[i], single[i], rtol=1e-6, atol=1e-6)
