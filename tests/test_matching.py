"""Tests for the dual-teacher A/B/C matcher (masked re-design of
coin/engine/trainer.py:338-478)."""

import numpy as np
import jax.numpy as jnp

from coin_tpu.engine.matching import match_dual_teacher_single
from coin_tpu.structures import Detections


def det(boxes, classes, scores, cap, c1=4):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    probs = np.full((n, c1), 0.05, np.float32)
    for i, (c, s) in enumerate(zip(classes, scores)):
        probs[i, c] = s
    return Detections.from_numpy(boxes, np.asarray(scores, np.float32),
                                 np.asarray(classes, np.int64), cap,
                                 probs=probs)


def test_abc_split_general_case():
    # online: two boxes; offline: match one with same class, one with a
    # different class, one unmatched
    online = det([[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
                 [0, 1, 2], [0.9, 0.8, 0.7], cap=8)
    offline = det([[0, 0, 10, 10], [20, 20, 30, 31], [100, 100, 120, 120]],
                  [0, 2, 1], [0.95, 0.85, 0.6], cap=8)
    m = match_dual_teacher_single(online, offline, 0.5, jnp.asarray(1.0))

    a = m.a.to_numpy()
    assert len(a["boxes"]) == 1
    np.testing.assert_allclose(a["boxes"][0], [0, 0, 10, 10])
    assert a["classes"][0] == 0

    b = m.b.to_numpy()
    assert len(b["boxes"]) == 1
    # box weight 1.0 → online box kept
    np.testing.assert_allclose(b["boxes"][0], [20, 20, 30, 30])
    assert b["classes"][0] == 2  # offline class
    bc_online = np.asarray(m.b_cls_online)[np.asarray(m.b.valid)]
    assert bc_online[0] == 1     # online class

    c = m.c.to_numpy()
    # offline-only box + online-only box
    assert len(c["boxes"]) == 2
    assert {tuple(bx) for bx in c["boxes"]} == {
        (100.0, 100.0, 120.0, 120.0), (50.0, 50.0, 60.0, 60.0)}


def test_wbf_box_fusion_after_burnup():
    online = det([[0, 0, 10, 10]], [0], [0.5], cap=4)
    offline = det([[1, 1, 11, 11]], [0], [0.5], cap=4)
    m = match_dual_teacher_single(online, offline, 0.5, jnp.asarray(0.5))
    a = m.a.to_numpy()
    np.testing.assert_allclose(a["boxes"][0], [0.5, 0.5, 10.5, 10.5],
                               atol=1e-4)


def test_empty_online_uses_offline_highscore():
    online = Detections.empty(4, num_classes=3)
    offline = det([[0, 0, 10, 10], [20, 20, 30, 30]], [0, 1], [0.9, 0.5],
                  cap=4)
    m = match_dual_teacher_single(online, offline, 0.5, jnp.asarray(1.0))
    a = m.a.to_numpy()
    assert len(a["boxes"]) == 1
    np.testing.assert_allclose(a["boxes"][0], [0, 0, 10, 10])
    c = m.c.to_numpy()
    assert len(c["boxes"]) == 1
    np.testing.assert_allclose(c["boxes"][0], [20, 20, 30, 30])
    assert not np.asarray(m.b.valid).any()


def test_empty_offline_promotes_online():
    online = det([[0, 0, 10, 10]], [2], [0.6], cap=4)
    offline = Detections.empty(4, num_classes=3)
    m = match_dual_teacher_single(online, offline, 0.5, jnp.asarray(1.0))
    a = m.a.to_numpy()
    assert len(a["boxes"]) == 1
    assert a["classes"][0] == 2
    assert not np.asarray(m.c.valid).any()
    assert not np.asarray(m.b.valid).any()


def test_both_empty():
    online = Detections.empty(4, num_classes=3)
    offline = Detections.empty(4, num_classes=3)
    m = match_dual_teacher_single(online, offline, 0.5, jnp.asarray(1.0))
    assert not np.asarray(m.a.valid).any()
    assert not np.asarray(m.b.valid).any()
    assert not np.asarray(m.c.valid).any()


def test_rpn_view_class_agnostic():
    # with_b=False: class-mismatched pairs count as A (RPN tag semantics,
    # trainer.py:441-455)
    online = det([[0, 0, 10, 10]], [1], [0.9], cap=4)
    offline = det([[1, 1, 11, 11]], [2], [0.8], cap=4)
    m = match_dual_teacher_single(online, offline, 0.5, jnp.asarray(1.0),
                                  with_b=False)
    assert np.asarray(m.a.valid).sum() == 1
    assert not np.asarray(m.b.valid).any()
