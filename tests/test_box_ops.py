import numpy as np
import jax.numpy as jnp

from coin_tpu.ops import boxes as box_ops


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def iou_ref(a, b, plus1=False):
    off = 1.0 if plus1 else 0.0
    out = np.zeros((len(a), len(b)), np.float32)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            xx1 = max(bi[0], bj[0]); yy1 = max(bi[1], bj[1])
            xx2 = min(bi[2], bj[2]); yy2 = min(bi[3], bj[3])
            w = max(0.0, xx2 - xx1 + off); h = max(0.0, yy2 - yy1 + off)
            inter = w * h
            ua = ((bi[2] - bi[0] + off) * (bi[3] - bi[1] + off)
                  + (bj[2] - bj[0] + off) * (bj[3] - bj[1] + off) - inter)
            out[i, j] = inter / ua if ua > 0 else 0.0
    return out


def test_pairwise_iou_matches_bruteforce(rng):
    a = random_boxes(rng, 13)
    b = random_boxes(rng, 7)
    got = np.asarray(box_ops.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, iou_ref(a, b), rtol=1e-5, atol=1e-6)


def test_pairwise_iou_plus1_matches_bruteforce(rng):
    a = random_boxes(rng, 9)
    b = random_boxes(rng, 9)
    got = np.asarray(box_ops.pairwise_iou_plus1(jnp.asarray(a),
                                                jnp.asarray(b)))
    np.testing.assert_allclose(got, iou_ref(a, b, plus1=True),
                               rtol=1e-5, atol=1e-6)


def test_delta_roundtrip(rng):
    src = random_boxes(rng, 20)
    tgt = random_boxes(rng, 20)
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = box_ops.encode_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
    rec = np.asarray(box_ops.decode_deltas(jnp.asarray(src), deltas, w))
    np.testing.assert_allclose(rec, tgt, rtol=1e-4, atol=1e-3)


def test_cxcywh_roundtrip(rng):
    b = random_boxes(rng, 11)
    rec = np.asarray(box_ops.cxcywh_to_xyxy(
        box_ops.xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(rec, b, rtol=1e-5, atol=1e-4)
