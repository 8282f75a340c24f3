import os
import pickle

import numpy as np

from coin_tpu.evaluation import VOCEvaluator
from coin_tpu.evaluation.dump import evaluate_pkl, save_detections_pkl
from coin_tpu.utils.visualize import draw_detections


def test_pkl_roundtrip_parity(tmp_path):
    ev = VOCEvaluator(["car"])
    gt = np.array([[10, 10, 50, 50]], np.float32)
    ev.process("img0", gt, np.array([0.9]), np.array([0]), gt,
               np.array([0]))
    direct = ev.evaluate()

    path = save_detections_pkl(ev, str(tmp_path / "detections.pckl"))
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert "car" in payload and "img0" in payload["car"]
    # dumped convention is +1
    np.testing.assert_allclose(payload["car"]["img0"][0][1:],
                               gt[0] + 1.0)

    records = [{"image_id": "img0", "boxes": gt,
                "classes": np.array([0]),
                "difficult": np.array([False])}]
    from_pkl = evaluate_pkl(path, records, ["car"])
    assert from_pkl["AP50"] == direct["AP50"] == 100.0


def test_draw_detections(tmp_path, rng):
    img = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
    out = str(tmp_path / "vis.jpg")
    res = draw_detections(img, np.array([[5, 5, 40, 40]]),
                          scores=np.array([0.8]),
                          classes=np.array([0]),
                          class_names=["car"], save_path=out)
    assert os.path.exists(out)
    assert res.size == (80, 60)
