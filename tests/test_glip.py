"""Shape/sanity tests for the GLIP stack (tiny configuration)."""

import numpy as np
import jax
import jax.numpy as jnp

from coin_tpu.models import glip as G
from coin_tpu.models.glip_detector import (glip_anchors, postprocess_glip)


def test_deform_conv_identity(rng):
    """Zero offsets + unit center mask ≈ plain 3×3 conv."""
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 4, 5).astype(np.float32))
    offsets = jnp.zeros((1, 6, 6, 18))
    mask = jnp.ones((1, 6, 6, 9))
    got = G.deform_conv3x3(x, offsets, mask, kernel, None)
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # interior matches exactly; borders differ (deform taps clamp&zero)
    np.testing.assert_allclose(np.asarray(got)[0, 1:-1, 1:-1],
                               np.asarray(ref)[0, 1:-1, 1:-1],
                               rtol=1e-3, atol=1e-3)


def test_glip_tiny_forward(rng):
    model = G.GLIP(variant="swinT", num_blocks=1)
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    t = 8
    embeds = jnp.asarray(rng.randn(1, t, 768).astype(np.float32))
    mask = jnp.ones((1, t), bool)
    params = model.init(jax.random.key(0), img, embeds, mask)
    logits, deltas, centerness, shapes = model.apply(params, img, embeds,
                                                     mask)
    total = sum(h * w for h, w in shapes)
    assert logits.shape == (1, total, t)
    assert deltas.shape == (1, total, 4)
    assert centerness.shape == (1, total)
    anchors = glip_anchors(shapes)
    assert anchors.shape == (total, 4)


def test_glip_postprocess(rng):
    shapes = [(4, 4), (2, 2), (1, 1), (1, 1), (1, 1)]
    total = sum(h * w for h, w in shapes)
    t, c = 8, 2
    logits = jnp.asarray(rng.randn(total, t).astype(np.float32))
    deltas = jnp.zeros((total, 4))
    centerness = jnp.zeros((total,))
    anchors = jnp.asarray(glip_anchors(shapes))
    pm = np.zeros((c, t), np.float32)
    pm[0, 1:3] = 0.5
    pm[1, 4:6] = 0.5
    det = postprocess_glip(logits, deltas, centerness, anchors,
                           jnp.asarray(pm), jnp.asarray([64.0, 64.0]),
                           num_classes=c, threshold=0.0, pre_topk=16,
                           capacity=8)
    got = det.to_numpy()
    assert got["probs"].shape[-1] == c + 1
    assert (got["boxes"][:, 2] <= 64.0).all()


def test_synthetic_probs_reference_formula():
    """glip.py:101-104: probs[i,:-1]=(1-s)/(C-1); probs[i,label]=s;
    background column stays 0."""
    import jax.numpy as jnp
    from coin_tpu.models.gdino_variants import synthetic_probs
    C = 4
    classes = jnp.asarray([0, 2, 3])
    scores = jnp.asarray([0.9, 0.6, 0.5])
    valid = jnp.asarray([True, True, False])
    p = np.asarray(synthetic_probs(classes, scores, C, valid))
    # row 0: label col 0.9, other fg cols (1-0.9)/3, bg 0
    np.testing.assert_allclose(p[0, 0], 0.9)
    np.testing.assert_allclose(p[0, 1:4], (1 - 0.9) / 3, rtol=1e-5)
    assert p[0, 4] == 0.0
    np.testing.assert_allclose(p[1, 2], 0.6)
    np.testing.assert_allclose(p[1, [0, 1, 3]], (1 - 0.6) / 3, rtol=1e-5)
    assert p[1, 4] == 0.0
    assert (p[2] == 0).all()  # invalid row zeroed
