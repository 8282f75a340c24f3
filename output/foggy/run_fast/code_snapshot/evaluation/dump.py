"""Detection dumps + parity harness.

- ``save_detections_pkl`` — TEST.SAVE_DETECTION_PKLS equivalent
  (cloud_pascal_voc_evaluation.py:87-91): pickles
  {class_name: {image_id: [[conf, x1, y1, x2, y2], ...]}} in the
  reference's dumped (+1) coordinate convention, so files are
  interchangeable with the reference's `detections.pckl`.
- ``evaluate_pkl`` — run the VOC evaluator directly on such a pickle
  (ours or the reference's) against a dataset's GT: the mAP-parity
  harness of SURVEY §7.10.
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict
from typing import Dict, Sequence

import numpy as np

from coin_tpu.evaluation.voc_eval import VOCEvaluator, voc_eval_class


def save_detections_pkl(evaluator: VOCEvaluator, path: str) -> str:
    payload = {}
    for cname in evaluator.class_names:
        payload[cname] = {
            img: [[conf, *box.tolist()] for conf, box in items]
            for img, items in evaluator._dets[cname].items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def evaluate_pkl(pkl_path: str, records: Sequence[dict],
                 class_names: Sequence[str]) -> Dict[str, float]:
    """records: VOC dicts from data.voc.load_voc_instances (0-based GT)."""
    with open(pkl_path, "rb") as f:
        payload = pickle.load(f)
    aps = defaultdict(list)
    for ci, cname in enumerate(class_names):
        dets = {img: [(row[0], np.asarray(row[1:5], float))
                      for row in rows]
                for img, rows in payload.get(cname, {}).items()}
        gts = {}
        for rec in records:
            sel = rec["classes"] == ci
            gts[rec["image_id"]] = {
                "bbox": rec["boxes"][sel] + 1.0,
                "difficult": rec["difficult"][sel],
            }
        for thresh in range(50, 100, 5):
            aps[thresh].append(
                voc_eval_class(dets, gts, thresh / 100.0) * 100.0)
    out = {
        "AP": float(np.mean([np.mean(v) for v in aps.values()])),
        "AP50": float(np.mean(aps[50])),
        "AP75": float(np.mean(aps[75])),
    }
    for cname, ap in zip(class_names, aps[50]):
        out[f"AP50-{cname}"] = float(ap)
    return out
