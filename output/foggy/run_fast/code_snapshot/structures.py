"""Padded detection structures — the TPU-native replacement for detectron2
``Instances`` (reference: detectron2 Instances + coin/utils/util.py:188-267
``MyInstances``).

Everything downstream of the data loader operates on *fixed-size* arrays with
an explicit validity mask, so every consumer (matcher, NMS, sampler, losses)
is shape-static and jit/pjit friendly. A ``Detections`` of capacity N always
carries N rows; rows with ``valid == False`` are padding and must be ignored
by all reductions.

Conventions
-----------
- boxes are XYXY, float32, in the coordinate frame given by ``image_size``
  (height, width) of the owning image.
- ``classes`` are 0-based foreground labels; padding rows carry -1.
- ``probs`` has shape (N, C+1): C foreground classes + background column
  (mirrors coin's prob layout, e.g. coin/modeling/meta_arch/gdino.py:162-203).
- ``scores`` is the max foreground probability (or objectness for RPN-style
  sets).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Detections:
    """A fixed-capacity, masked set of detection boxes.

    All fields share the leading capacity dimension N (or B, N when batched —
    every op in coin_tpu.ops works on the trailing dims and vmaps over
    leading dims).
    """

    boxes: jnp.ndarray            # (..., N, 4) xyxy float32
    scores: jnp.ndarray           # (..., N)    float32
    classes: jnp.ndarray          # (..., N)    int32, -1 for padding
    valid: jnp.ndarray            # (..., N)    bool
    probs: Optional[jnp.ndarray] = None  # (..., N, C+1) float32 or None

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #
    @staticmethod
    def empty(capacity: int, num_classes: Optional[int] = None,
              batch_shape: tuple = ()) -> "Detections":
        shape = batch_shape + (capacity,)
        return Detections(
            boxes=jnp.zeros(shape + (4,), jnp.float32),
            scores=jnp.zeros(shape, jnp.float32),
            classes=jnp.full(shape, -1, jnp.int32),
            valid=jnp.zeros(shape, bool),
            probs=None if num_classes is None
            else jnp.zeros(shape + (num_classes + 1,), jnp.float32),
        )

    @staticmethod
    def from_numpy(boxes: np.ndarray, scores: np.ndarray,
                   classes: np.ndarray, capacity: int,
                   probs: Optional[np.ndarray] = None) -> "Detections":
        """Pack ragged numpy detections (n rows, n <= capacity) into a padded
        Detections. Host-side helper for dataset/collector packing."""
        n = min(int(boxes.shape[0]), capacity)
        pad = capacity - n

        def _pad(a, fill=0.0):
            a = np.asarray(a)[:n]
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, widths, constant_values=fill)

        return Detections(
            boxes=jnp.asarray(_pad(boxes), jnp.float32),
            scores=jnp.asarray(_pad(scores), jnp.float32),
            classes=jnp.asarray(_pad(classes, fill=-1), jnp.int32),
            valid=jnp.asarray(np.arange(capacity) < n),
            probs=None if probs is None else jnp.asarray(_pad(probs),
                                                         jnp.float32),
        )

    # ------------------------------------------------------------------ #
    # basic algebra
    # ------------------------------------------------------------------ #
    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)

    def replace(self, **kw) -> "Detections":
        return dataclasses.replace(self, **kw)

    def mask(self, keep: jnp.ndarray) -> "Detections":
        """AND the validity mask with ``keep`` (no compaction — rows stay)."""
        return self.replace(valid=self.valid & keep)

    def gather(self, idx: jnp.ndarray, idx_valid: jnp.ndarray) -> "Detections":
        """Row-gather along the capacity axis (single-set layout, N rows)."""
        take = lambda a: jnp.take(a, idx, axis=0)
        return Detections(
            boxes=take(self.boxes),
            scores=take(self.scores),
            classes=jnp.where(idx_valid, take(self.classes), -1),
            valid=take(self.valid) & idx_valid,
            probs=None if self.probs is None else take(self.probs),
        )

    def scale(self, sy: jnp.ndarray, sx: jnp.ndarray) -> "Detections":
        scale = jnp.stack([sx, sy, sx, sy]).reshape((1,) * (self.boxes.ndim - 1)
                                                    + (4,))
        return self.replace(boxes=self.boxes * scale)

    def hflip(self, width: jnp.ndarray) -> "Detections":
        x1, y1, x2, y2 = jnp.split(self.boxes, 4, axis=-1)
        flipped = jnp.concatenate([width - x2, y1, width - x1, y2], axis=-1)
        return self.replace(boxes=flipped)

    def clip(self, height: jnp.ndarray, width: jnp.ndarray) -> "Detections":
        x1, y1, x2, y2 = jnp.split(self.boxes, 4, axis=-1)
        clipped = jnp.concatenate([
            jnp.clip(x1, 0, width), jnp.clip(y1, 0, height),
            jnp.clip(x2, 0, width), jnp.clip(y2, 0, height)], axis=-1)
        return self.replace(boxes=clipped)

    # ------------------------------------------------------------------ #
    # host-side unpacking (for eval / IO)
    # ------------------------------------------------------------------ #
    def to_numpy(self) -> Dict[str, np.ndarray]:
        """Strip padding and return ragged numpy arrays (single-set layout)."""
        valid = np.asarray(self.valid)
        out = {
            "boxes": np.asarray(self.boxes)[valid],
            "scores": np.asarray(self.scores)[valid],
            "classes": np.asarray(self.classes)[valid],
        }
        if self.probs is not None:
            out["probs"] = np.asarray(self.probs)[valid]
        return out


def concatenate(a: Detections, b: Detections) -> Detections:
    """Concatenate two padded sets along the capacity axis."""
    cat = lambda x, y: jnp.concatenate([x, y], axis=-2)
    cat1 = lambda x, y: jnp.concatenate([x, y], axis=-1)
    probs = None
    if a.probs is not None and b.probs is not None:
        probs = cat(a.probs, b.probs)
    return Detections(
        boxes=cat(a.boxes, b.boxes),
        scores=cat1(a.scores, b.scores),
        classes=cat1(a.classes, b.classes),
        valid=cat1(a.valid, b.valid),
        probs=probs,
    )


def truncate(d: Detections, capacity: int) -> Detections:
    """Compact valid rows to the front and keep the first ``capacity``
    slots (used to bound padded set sizes before expensive per-box
    compute, e.g. the C-set distillation forward)."""
    c = compact(d)
    return Detections(
        boxes=c.boxes[..., :capacity, :],
        scores=c.scores[..., :capacity],
        classes=c.classes[..., :capacity],
        valid=c.valid[..., :capacity],
        probs=None if c.probs is None else c.probs[..., :capacity, :],
    )


def compact(d: Detections) -> Detections:
    """Move valid rows to the front (stable), padding to the back.

    Shape-static compaction via argsort on the inverted validity mask.
    """
    order = jnp.argsort(~d.valid, axis=-1, stable=True)
    if d.boxes.ndim == 2:
        return d.gather(order, jnp.take(d.valid, order))
    take = lambda a: jnp.take_along_axis(
        a, order.reshape(order.shape + (1,) * (a.ndim - order.ndim)), axis=-2
        if a.ndim > order.ndim else -1)
    return Detections(
        boxes=take(d.boxes),
        scores=take(d.scores),
        classes=take(d.classes),
        valid=take(d.valid),
        probs=None if d.probs is None else take(d.probs),
    )
