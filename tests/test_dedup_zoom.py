import numpy as np
import jax.numpy as jnp

from coin_tpu.engine.zoom_merge import center_zoom_box, merge_zoom
from coin_tpu.ops.dedup import (delete_duplicate_boxes, duplicate_mask,
                                online_boxes_merging, self_cluster_mask)
from coin_tpu.structures import Detections


def det_of(boxes, classes=None, scores=None, cap=8, c1=3):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    classes = np.zeros(n, np.int64) if classes is None else np.asarray(
        classes)
    scores = np.ones(n, np.float32) if scores is None else np.asarray(
        scores, np.float32)
    probs = np.full((n, c1), 1.0 / c1, np.float32)
    return Detections.from_numpy(boxes, scores, classes, cap, probs=probs)


def test_duplicate_mask_keeps_first():
    d = det_of([[0, 0, 10, 10], [0, 0, 10, 10], [5, 5, 15, 15],
                [0, 0, 10, 10]])
    m = np.asarray(duplicate_mask(d.boxes, d.valid))
    np.testing.assert_array_equal(m[:4], [False, True, False, True])
    out = delete_duplicate_boxes(d)
    assert int(out.count()) == 2


def test_self_cluster_keeps_one_per_cluster():
    d = det_of([[0, 0, 100, 100], [0, 0, 100, 101], [500, 500, 600, 600]])
    keep = np.asarray(self_cluster_mask(d, 0.95))
    assert keep[:3].tolist() == [True, False, True]


def test_online_boxes_merging_drops_near_identical():
    offline = det_of([[0, 0, 10, 10], [0.5, 0.0, 10.5, 10.0],
                      [50, 50, 60, 60]])
    online_idx = jnp.asarray([0, 0, 1] + [0] * 5)
    keep = np.asarray(online_boxes_merging(offline, offline, online_idx))
    assert keep[:3].tolist() == [True, False, True]


def npdet(boxes, classes, scores, c1=3):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    probs = np.full((n, c1), 0.1, np.float32)
    for i, (c, s) in enumerate(zip(classes, scores)):
        probs[i, c] = s
    return {"boxes": boxes, "scores": np.asarray(scores, np.float32),
            "classes": np.asarray(classes, np.int64), "probs": probs}


def test_center_zoom_geometry():
    # GDINOZOOM: short side = min_zoom, aspect preserved (ratio 2.0)
    x1, y1, cw, ch = center_zoom_box(600, 1200, 320)
    assert ch == 320 and cw == 640
    assert x1 == (1200 - 640) // 2 and y1 == (600 - 320) // 2


def test_merge_zoom_basic():
    # image 200x200, zoom = center 100x100 at (50,50)
    ori = npdet([[0, 0, 40, 40],        # outside zoom → kept
                 [60, 60, 90, 90]],     # inside zoom
                [0, 1], [0.9, 0.8])
    zoom = npdet([[61, 61, 91, 91],     # confirms the inside box
                  [110, 110, 130, 130]],  # new zoom-only box
                 [1, 0], [0.85, 0.7])
    out = merge_zoom(ori, zoom, (50, 50, 100, 100))
    assert len(out["boxes"]) == 3
    # the unmatched-outside box survives untouched
    assert any(np.allclose(b, [0, 0, 40, 40]) for b in out["boxes"])
    # zoom-only box added
    assert any(np.allclose(b, [110, 110, 130, 130]) for b in out["boxes"])


def test_merge_zoom_removes_unconfirmed_interior():
    ori = npdet([[60, 60, 90, 90]], [0], [0.9])   # interior, no zoom match
    zoom = npdet([[120, 120, 140, 140]], [1], [0.8])
    out = merge_zoom(ori, zoom, (50, 50, 100, 100))
    # interior ORI box dropped (not confirmed); zoom box added
    assert len(out["boxes"]) == 1
    np.testing.assert_allclose(out["boxes"][0], [120, 120, 140, 140])
