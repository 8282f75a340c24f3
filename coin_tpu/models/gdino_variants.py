"""Cloud-teacher variants behind the common detector interface.

- ``ClassOnlyAdapter`` — GDINO_CLASSONLY (coin/modeling/meta_arch/
  gdino_classonly.py): the cloud returns one-hot class labels; the
  probability vectors are discarded (ablation: cloud gives classes only).
- ``SyntheticProbAdapter`` — GLIP / GDINO-1.5-API style outputs where
  only (box, class, score) exist: probs are synthesized by spreading
  (1−score) uniformly over the other classes (gdino1_5API.py:81-85,
  glip.py:96-105).
- ``GDINO15APIDetector`` — the remote Grounding-DINO 1.5 HTTPS teacher
  (gdino1_5API.py): true "cloud" deployment. Network access is optional —
  zero-egress environments get a clear error at call time.
"""

from __future__ import annotations

import base64
import io
import json
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.structures import Detections


def one_hot_probs(classes: jnp.ndarray, num_classes: int,
                  valid: jnp.ndarray) -> jnp.ndarray:
    oh = jax.nn.one_hot(jnp.clip(classes, 0, num_classes),
                        num_classes + 1, dtype=jnp.float32)
    return jnp.where(valid[..., None], oh, 0.0)


def synthetic_probs(classes: jnp.ndarray, scores: jnp.ndarray,
                    num_classes: int, valid: jnp.ndarray) -> jnp.ndarray:
    """p[cls]=score, remaining (1−score) spread over the other FG
    classes; background column stays 0 (glip.py:101-104 /
    gdino1_5API.py:81-85: ``probs[i,:-1]=(1-s)/(C-1); probs[i,l]=s``)."""
    c1 = num_classes + 1
    oh = jax.nn.one_hot(jnp.clip(classes, 0, num_classes), c1,
                        dtype=jnp.float32)
    rest = (1.0 - scores[..., None]) / max(num_classes - 1, 1)
    probs = oh * scores[..., None] + (1.0 - oh) * rest
    probs = probs.at[..., -1].set(0.0)  # bg column 0 in the reference
    return jnp.where(valid[..., None], probs, 0.0)


class ClassOnlyAdapter:
    """Wrap a detector: replace its probs with one-hot labels."""

    def __init__(self, detector: Callable, num_classes: int):
        self.detector = detector
        self.num_classes = num_classes

    def __call__(self, images_u8, image_hw) -> Detections:
        det = self.detector(images_u8, image_hw)
        probs = one_hot_probs(det.classes, self.num_classes, det.valid)
        scores = jnp.where(det.valid, 1.0, 0.0)
        return det.replace(probs=probs, scores=scores)


class SyntheticProbAdapter:
    def __init__(self, detector: Callable, num_classes: int):
        self.detector = detector
        self.num_classes = num_classes

    def __call__(self, images_u8, image_hw) -> Detections:
        det = self.detector(images_u8, image_hw)
        probs = synthetic_probs(det.classes, det.scores, self.num_classes,
                                det.valid)
        return det.replace(probs=probs)


class GDINO15APIDetector:
    """Remote Grounding-DINO 1.5 API teacher (HTTP, token-authenticated).

    detect() posts each image and parses (boxes, classes, scores);
    probabilities are synthesized like the reference (gdino1_5API.py:
    66-103). Endpoint/token from config; raises a clear error when the
    network is unreachable.
    """

    def __init__(self, token: str, class_names: Sequence[str],
                 endpoint: str =
                 "https://api.deepdataspace.com/tasks/detection",
                 capacity: int = 256, threshold: float = 0.25):
        self.token = token
        self.endpoint = endpoint
        self.class_names = list(class_names)
        self.capacity = capacity
        self.threshold = threshold

    def _post(self, payload: dict) -> dict:
        import urllib.request
        req = urllib.request.Request(
            self.endpoint, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json",
                     "Token": self.token})
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return json.loads(resp.read())
        except OSError as e:
            raise RuntimeError(
                f"GDINO-1.5 API unreachable ({e}); this teacher needs "
                "network access") from e

    def __call__(self, images_u8, image_hw) -> Detections:
        from PIL import Image
        images = np.asarray(images_u8)
        hw = np.asarray(image_hw)
        num_classes = len(self.class_names)
        dets = []
        for i in range(images.shape[0]):
            h, w = int(hw[i][0]), int(hw[i][1])
            buf = io.BytesIO()
            Image.fromarray(images[i][:h, :w]).save(buf, format="JPEG")
            payload = {
                "image": "data:image/jpeg;base64,"
                         + base64.b64encode(buf.getvalue()).decode(),
                "prompts": [{"type": "text",
                             "text": ".".join(self.class_names)}],
            }
            result = self._post(payload)
            objs = result.get("result", {}).get("objects", [])
            boxes, classes, scores = [], [], []
            for obj in objs:
                if obj.get("score", 0.0) < self.threshold:
                    continue
                name = obj.get("category", "")
                if name not in self.class_names:
                    continue
                boxes.append(obj["bbox"])
                classes.append(self.class_names.index(name))
                scores.append(obj["score"])
            det = Detections.from_numpy(
                np.asarray(boxes, np.float32).reshape(-1, 4),
                np.asarray(scores, np.float32),
                np.asarray(classes, np.int64), self.capacity)
            probs = synthetic_probs(det.classes, det.scores, num_classes,
                                    det.valid)
            dets.append(det.replace(probs=probs))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *dets)
