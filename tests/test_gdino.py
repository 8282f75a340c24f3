"""Shape/sanity tests for the Grounding-DINO stack (tiny configuration —
real-weight numerics require the user-supplied checkpoint)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coin_tpu.models import gdino as G
from coin_tpu.models.deformable import MSDeformAttention, ms_deform_sample
from coin_tpu.models.swin import SwinTransformer
from coin_tpu.models.gdino_detector import (build_captions_and_spans,
                                            phrase_self_attention_mask,
                                            positive_map_from_spans,
                                            postprocess_gdino)


class FakeTok:
    cls, sep = 101, 102

    def encode(self, text):
        if text == ".":
            return [1012]
        return [hash(w) % 1000 + 2000 for w in text.split()]


def test_captions_and_positive_map():
    tok = FakeTok()
    caption, ids, spans = build_captions_and_spans(["car", "traffic_light"],
                                                   tok)
    assert caption == "car . traffic light ."
    pm = positive_map_from_spans(spans, len(ids))
    assert pm.shape == (2, len(ids))
    np.testing.assert_allclose(pm.sum(1), 1.0)
    # spans don't overlap separators
    assert pm[:, 0].sum() == 0  # CLS
    mask = phrase_self_attention_mask(ids, [1012], [tok.cls, tok.sep])
    assert mask[0, 0] and not mask[0, 1]  # CLS attends only to itself
    s0, e0 = spans[0]
    s1, e1 = spans[1]
    assert mask[s0, s0]
    assert not mask[s0, s1]  # different phrases don't attend


def test_ms_deform_sample_matches_manual(rng):
    b, heads, d = 1, 2, 4
    shapes = [(4, 4), (2, 2)]
    starts = [0, 16]
    total = 20
    values = jnp.asarray(rng.randn(b, total, heads, d).astype(np.float32))
    q = 3
    locs = jnp.asarray(rng.uniform(0.2, 0.8,
                                   (b, q, heads, 2, 1, 2)).astype(
                                       np.float32))
    w = jnp.ones((b, q, heads, 2, 1), jnp.float32) * 0.5
    out = ms_deform_sample(values, shapes, starts, locs, w)
    assert out.shape == (b, q, heads, d)
    # manual bilinear for query 0, head 0, level 0
    x, y = np.asarray(locs)[0, 0, 0, 0, 0]
    h0, w0 = shapes[0]
    xf, yf = x * w0 - 0.5, y * h0 - 0.5
    x0, y0 = int(np.floor(xf)), int(np.floor(yf))
    fx, fy = xf - x0, yf - y0
    v = np.asarray(values)[0, :, 0]
    ref = ((1 - fy) * (1 - fx) * v[y0 * w0 + x0]
           + (1 - fy) * fx * v[y0 * w0 + x0 + 1]
           + fy * (1 - fx) * v[(y0 + 1) * w0 + x0]
           + fy * fx * v[(y0 + 1) * w0 + x0 + 1])
    lvl1 = np.asarray(
        ms_deform_sample(values, shapes, starts, locs,
                         jnp.asarray(np.stack(
                             [np.ones((b, q, heads, 1)),
                              np.zeros((b, q, heads, 1))],
                             axis=3).astype(np.float32))))[0, 0, 0]
    np.testing.assert_allclose(lvl1, ref, rtol=1e-4, atol=1e-5)


def test_swin_tiny_shapes(rng):
    model = SwinTransformer("swinT")
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    outs = model.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 8, 12, 192), (1, 4, 6, 384), (1, 2, 3, 768)]


@pytest.mark.slow
def test_gdino_forward_and_postprocess(rng):
    model = G.GroundingDINO(variant="swinT", num_queries=12, enc_layers=1,
                            dec_layers=1)
    img = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    t = 10
    embeds = jnp.asarray(rng.randn(1, t, 768).astype(np.float32))
    mask = jnp.ones((1, t), bool)
    params = model.init(jax.random.key(0), img, embeds, mask)
    logits, boxes = model.apply(params, img, embeds, mask)
    assert logits.shape == (1, 12, t)
    assert boxes.shape == (1, 12, 4)
    assert np.isfinite(np.asarray(boxes)).all()
    assert (np.asarray(boxes) >= 0).all() and (np.asarray(boxes) <= 1).all()

    pm = positive_map_from_spans([(1, 3), (4, 6)], t)
    det = postprocess_gdino(logits[0], boxes[0], jnp.asarray(pm),
                            jnp.asarray([64.0, 96.0]), threshold=0.0,
                            capacity=12)
    got = det.to_numpy()
    assert got["probs"].shape[-1] == 3  # 2 classes + bg
    np.testing.assert_allclose(got["probs"].sum(-1), 1.0, rtol=1e-5)


def test_postprocess_gdino_formulas(rng):
    """Numerical check of the probability construction (gdino.py:162-203):
    per-class prob = positive-map matmul of sigmoids; a ZERO bg column is
    appended and the row renormalized via softmax(log p) — so bg prob is
    exactly 0 and fg probs sum to 1 (the reference's torch.zeros column,
    gdino.py:186-188); boxes cxcywh->xyxy scaled."""
    nq, t = 6, 8
    logits = rng.randn(nq, t).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, (nq, 4)).astype(np.float32)
    pm = np.zeros((2, t), np.float32)
    pm[0, 1:3] = 0.5
    pm[1, 4] = 1.0
    det = postprocess_gdino(jnp.asarray(logits), jnp.asarray(boxes),
                            jnp.asarray(pm), jnp.asarray([100.0, 200.0]),
                            threshold=0.0, capacity=nq)
    sig = 1.0 / (1.0 + np.exp(-logits))
    fg = sig @ pm.T
    cls = fg.argmax(1)
    # torch: cat((p, zeros)) then softmax(log p) => fg renormalized, bg 0
    ref_fg = fg / fg.sum(1, keepdims=True)
    ref_probs = np.concatenate([ref_fg, np.zeros((nq, 1), np.float32)],
                               axis=1)
    got = jax.device_get(det)
    np.testing.assert_allclose(got.probs, ref_probs, rtol=1e-4,
                               atol=1e-5)
    assert np.all(got.probs[:, -1] < 1e-6)  # bg column exactly ~0
    np.testing.assert_array_equal(got.classes, cls)
    # scores = renormalized prob at the argmax class (gdino.py:189)
    np.testing.assert_allclose(
        got.scores, ref_fg[np.arange(nq), cls], rtol=1e-4)
    # box scaling: cx*w etc with (h=100, w=200)
    cx, cy, bw, bh = boxes[0]
    np.testing.assert_allclose(
        got.boxes[0],
        [cx * 200 - bw * 200 / 2, cy * 100 - bh * 100 / 2,
         cx * 200 + bw * 200 / 2, cy * 100 + bh * 100 / 2], rtol=1e-4)


def test_postprocess_gdino_type_filter(rng):
    """USE_DINO_TYPE_FILTER mode (gdino.py:193-203): one detection per
    (query, class) pair above the threshold, scores = renormalized prob
    at the pair's class."""
    nq, t = 4, 8
    logits = rng.randn(nq, t).astype(np.float32) * 2
    boxes = rng.uniform(0.2, 0.6, (nq, 4)).astype(np.float32)
    pm = np.zeros((3, t), np.float32)
    pm[0, 1] = 1.0
    pm[1, 3:5] = 0.5
    pm[2, 6] = 1.0
    thresh = 0.5
    det = postprocess_gdino(jnp.asarray(logits), jnp.asarray(boxes),
                            jnp.asarray(pm), jnp.asarray([100.0, 200.0]),
                            threshold=thresh, capacity=nq * 3,
                            type_filter=True)
    sig = 1.0 / (1.0 + np.exp(-logits))
    fg = sig @ pm.T                       # (nq, 3)
    ref_fg = fg / fg.sum(1, keepdims=True)
    got = jax.device_get(det)
    want = {(q, c) for q in range(nq) for c in range(3)
            if fg[q, c] > thresh}
    got_pairs = set()
    for i in range(len(got.valid)):
        if got.valid[i]:
            # recover the query via its prob row (rows are unique per q)
            q = int(np.argmin(np.abs(ref_fg[:, 0]
                                     - got.probs[i][0])))
            got_pairs.add((q, int(got.classes[i])))
            np.testing.assert_allclose(got.scores[i],
                                       ref_fg[q, got.classes[i]],
                                       rtol=1e-4)
    assert got_pairs == want
