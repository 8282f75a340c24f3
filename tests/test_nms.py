"""Golden tests for masked NMS against independent numpy implementations of
the reference algorithms (greedy NMS; Probabilistic-Fusion NMS per
coin/layers/nms.py semantics, reimplemented here from the formulas)."""

import numpy as np
import jax.numpy as jnp
import pytest

from coin_tpu.ops import nms as nms_ops
from coin_tpu.structures import Detections
from tests.test_box_ops import iou_ref, random_boxes


def greedy_nms_ref(boxes, scores, thr, classes=None, plus1=False):
    """Plain greedy NMS, numpy; returns kept indices in score order."""
    if classes is not None:
        offset = classes.astype(np.float32) * (boxes.max() + 1)
        nb = boxes + offset[:, None]
    else:
        nb = boxes
    order = np.argsort(-scores, kind="stable")
    iou = iou_ref(nb, nb, plus1=plus1)
    keep, suppressed = [], np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j != i and iou[i, j] > thr:
                suppressed[j] = True
    return sorted(keep)


def fusion_nms_ref(boxes, probs, classes, thr, score_method, box_method):
    """Probabilistic-Fusion greedy NMS (coin/layers/nms.py:84-194 formulas)."""
    offset = classes.astype(np.float32) * (boxes.max() + 1)
    nb = boxes + offset[:, None]
    scores = probs[np.arange(len(probs)), classes]
    order = list(np.argsort(-scores, kind="stable"))
    iou = iou_ref(nb, nb, plus1=True)
    out = []
    while order:
        i = order.pop(0)
        cluster = [i] + [j for j in order if iou[i, j] > thr]
        order = [j for j in order if iou[i, j] <= thr]
        cp = probs[cluster]
        cs = scores[cluster]
        cb = boxes[cluster]
        if score_method == "probEn":
            sl = np.log(cp).sum(0)
            fp = np.exp(sl) / np.exp(sl).sum()
            fs = fp[classes[i]]
            fc = classes[i]
        elif score_method == "avg":
            fp = cp.mean(0); fs = cs.mean(); fc = classes[i]
        else:
            k = int(np.argmax(cs)); fp = cp[k]; fs = cs[k]
            fc = classes[cluster[k]]
        if box_method == "s-avg":
            w = cs / cs.sum(); fb = (cb * w[:, None]).sum(0)
        elif box_method == "avg":
            fb = cb.mean(0)
        else:
            fb = cb[int(np.argmax(cs))]
        out.append((fb, fs, fp, fc))
    out.sort(key=lambda t: -t[1])
    return out


def make_probs(rng, n, c, classes):
    p = rng.uniform(0.01, 0.3, (n, c + 1)).astype(np.float32)
    p[np.arange(n), classes] = rng.uniform(0.5, 0.99, n)
    return p / p.sum(1, keepdims=True)


def test_hard_nms_matches_greedy(rng):
    n = 60
    boxes = random_boxes(rng, n, size=60.0)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    keep = np.asarray(nms_ops.nms_keep_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5))
    ref = greedy_nms_ref(boxes, scores, 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == ref


def test_hard_nms_classaware_and_masked(rng):
    n = 80
    boxes = random_boxes(rng, n, size=40.0)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    classes = rng.randint(0, 3, n)
    valid = rng.rand(n) > 0.25
    keep = np.asarray(nms_ops.nms_keep_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
        classes=jnp.asarray(classes)))
    ref = greedy_nms_ref(boxes[valid], scores[valid], 0.5,
                         classes=classes[valid])
    ref_global = np.nonzero(valid)[0][ref]
    assert not keep[~valid].any()
    assert sorted(np.nonzero(keep)[0].tolist()) == sorted(ref_global.tolist())


def test_hard_nms_large_input_tiled(rng):
    n = 700  # exercises multiple tiles + cross-tile suppression
    boxes = random_boxes(rng, n, size=120.0)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    keep = np.asarray(nms_ops.nms_keep_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.6))
    ref = greedy_nms_ref(boxes, scores, 0.6)
    assert sorted(np.nonzero(keep)[0].tolist()) == ref


@pytest.mark.parametrize("score_method,box_method", [
    ("probEn", "s-avg"), ("avg", "avg"), ("max", "s-avg"), ("max", "avg")])
def test_fusion_nms_matches_reference_formulas(rng, score_method, box_method):
    n, c, cap = 40, 5, 64
    boxes = random_boxes(rng, n, size=50.0)
    classes = rng.randint(0, c, n)
    probs = make_probs(rng, n, c, classes)
    scores = probs[np.arange(n), classes]
    det = Detections.from_numpy(boxes, scores, classes, cap, probs=probs)
    out = nms_ops.fusion_nms(det, 0.5, score_method, box_method)
    got = out.to_numpy()
    ref = fusion_nms_ref(boxes, probs, classes, 0.5, score_method, box_method)
    assert len(got["boxes"]) == len(ref)
    for k, (fb, fs, fp, fc) in enumerate(ref):
        np.testing.assert_allclose(got["boxes"][k], fb, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got["scores"][k], fs, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got["probs"][k], fp, rtol=1e-4, atol=1e-5)
        assert got["classes"][k] == fc


def test_merge_helpers_match_formulas(rng):
    n, c = 10, 6
    pa = rng.dirichlet(np.ones(c), n).astype(np.float32)
    pb = rng.dirichlet(np.ones(c), n).astype(np.float32)
    probs, scores = nms_ops.merge_probs_bayesian(jnp.asarray(pa),
                                                 jnp.asarray(pb))
    sl = (np.log(pa) + np.log(pb)) / 2
    ref = np.exp(sl) / np.exp(sl).sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(probs), ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), ref.max(1), rtol=1e-3,
                               atol=1e-5)

    probs, scores = nms_ops.merge_probs_max(jnp.asarray(pa), jnp.asarray(pb))
    take_a = pa.max(1) > pb.max(1)
    ref = np.where(take_a[:, None], pa, pb)
    np.testing.assert_allclose(np.asarray(probs), ref, rtol=1e-6)

    ba = random_boxes(rng, n)
    bb = random_boxes(rng, n)
    sa = rng.uniform(0.1, 1, n).astype(np.float32)
    sb = rng.uniform(0.1, 1, n).astype(np.float32)
    fused = nms_ops.weighted_box_fusion_pair(
        jnp.asarray(ba), jnp.asarray(bb), jnp.asarray(sa), jnp.asarray(sb))
    w = sa / (sa + sb)
    ref = ba * w[:, None] + bb * (1 - w)[:, None]
    np.testing.assert_allclose(np.asarray(fused), ref, rtol=1e-5, atol=1e-4)
