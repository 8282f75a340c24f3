"""GDINO cloud-teacher adapter: captions, positive maps, post-processing.

Re-implements the reference's GDINO wrapper semantics
(coin/modeling/meta_arch/gdino.py): captions are the class names joined by
' . '; each class maps to its token span (positive map); per-query
sigmoid logits (nq, T) → per-class probs via the normalized positive-map
matmul; score threshold; background column appended and renormalized with
softmax(log p); boxes cxcywh→xyxy scaled to the image
(gdino.py:144-203).

Also builds the phrase-local text self-attention mask
(generate_masks_with_special_tokens semantics): tokens attend only within
their '.'-delimited phrase, special tokens only to themselves.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.structures import Detections


def build_captions_and_spans(class_names: Sequence[str],
                             tokenizer) -> Tuple[str, np.ndarray, list]:
    """caption 'a . b . c .', token ids, and per-class token index spans."""
    caption = " . ".join(n.replace("_", " ") for n in class_names) + " ."
    ids = [tokenizer.cls]
    spans = []
    for name in class_names:
        toks = tokenizer.encode(name.replace("_", " "))
        spans.append((len(ids), len(ids) + len(toks)))
        ids.extend(toks)
        ids.extend(tokenizer.encode("."))
    ids.append(tokenizer.sep)
    return caption, np.asarray(ids, np.int64), spans


def positive_map_from_spans(spans, text_len: int) -> np.ndarray:
    """(C, T) one-hot-normalized map class → its tokens
    (gdino.py positive-map construction)."""
    m = np.zeros((len(spans), text_len), np.float32)
    for c, (s, e) in enumerate(spans):
        m[c, s:e] = 1.0
    norm = m.sum(axis=1, keepdims=True)
    return m / np.maximum(norm, 1.0)


def phrase_self_attention_mask(ids: np.ndarray, sep_ids: Sequence[int],
                               special_ids: Sequence[int]) -> np.ndarray:
    """(T, T) boolean mask: attend within the same '.'-delimited segment;
    special tokens attend only to themselves."""
    t = len(ids)
    seg = np.zeros(t, np.int64)
    cur = 0
    for i, tok in enumerate(ids):
        seg[i] = cur
        if tok in sep_ids:
            cur += 1
    mask = seg[:, None] == seg[None, :]
    for i, tok in enumerate(ids):
        if tok in special_ids:
            mask[i, :] = False
            mask[:, i] = False
            mask[i, i] = True
    return mask


def _renorm_with_bg(probs_fg: jnp.ndarray) -> jnp.ndarray:
    """Reference renormalization (gdino.py:186-188): append a ZERO
    background column, then softmax(log p) — i.e. fg probs renormalize
    to sum 1 and the bg prob is exactly 0 (the column is cosmetic; the
    CLIP re-scorer later fills in a real bg prob). All-zero rows resolve
    to uniform-over-fg instead of NaN (the reference filters such rows
    before use)."""
    logp = jnp.log(jnp.maximum(probs_fg, 1e-12))
    bg = jnp.full(probs_fg.shape[:-1] + (1,), -1e9, probs_fg.dtype)
    return jax.nn.softmax(jnp.concatenate([logp, bg], axis=-1), axis=-1)


def postprocess_gdino(logits: jnp.ndarray, boxes: jnp.ndarray,
                      positive_map: jnp.ndarray, image_hw: jnp.ndarray,
                      threshold: float = 0.25,
                      capacity: int = 900,
                      type_filter: bool = False) -> Detections:
    """One image: logits (nq, T) pre-sigmoid; boxes (nq, 4) normalized
    cxcywh; positive_map (C, T). Returns padded Detections in image
    coordinates with probs incl. background column
    (gdino.py:144-203 semantics).

    ``type_filter`` = USE_DINO_TYPE_FILTER (gdino.py:193-203): filter
    per (query, class) PAIR above the threshold — one detection per
    pair — instead of per query with its argmax class."""
    nq = logits.shape[0]
    sig = jax.nn.sigmoid(logits)
    sig = jnp.where(jnp.isfinite(logits), sig, 0.0)
    # per-class prob = mean over the class's tokens (normalized map)
    probs_fg = sig @ positive_map.T                      # (nq, C)
    probs = _renorm_with_bg(probs_fg)                    # (nq, C+1)

    h, w = image_hw[0], image_hw[1]
    cx, cy, bw, bh = (boxes[:, 0] * w, boxes[:, 1] * h,
                      boxes[:, 2] * w, boxes[:, 3] * h)
    xyxy = jnp.stack([cx - bw / 2, cy - bh / 2,
                      cx + bw / 2, cy + bh / 2], axis=-1)

    if type_filter:
        c = probs_fg.shape[-1]
        keep = (probs_fg > threshold).reshape(-1)        # (nq*C,)
        classes = jnp.tile(jnp.arange(c, dtype=jnp.int32), (nq,))
        rows = jnp.repeat(jnp.arange(nq), c)
        det = Detections(
            boxes=jnp.take(xyxy, rows, axis=0),
            scores=jnp.take(probs, rows, axis=0).reshape(-1, c + 1)[
                jnp.arange(nq * c), classes],
            classes=classes, valid=keep,
            probs=jnp.take(probs, rows, axis=0))
        # score-descending among valid pairs so a sub-capacity cut keeps
        # the highest-confidence detections (invalid rows sort last)
        order = jnp.argsort(
            jnp.where(det.valid, -det.scores, jnp.inf))[:capacity]
        return det.gather(order, jnp.take(det.valid, order))

    # default: one detection per query at its max class, filtered on the
    # RAW (pre-renorm) max prob (gdino.py:182-184)
    raw_scores = jnp.max(probs_fg, axis=-1)
    classes = jnp.argmax(probs_fg, axis=-1).astype(jnp.int32)
    keep = raw_scores > threshold
    scores = jnp.take_along_axis(probs, classes[:, None], axis=-1)[:, 0]
    det = Detections(boxes=xyxy, scores=scores, classes=classes,
                     valid=keep, probs=probs)
    if capacity != nq:
        order = jnp.argsort(
            jnp.where(det.valid, -det.scores, jnp.inf))[:capacity]
        det = det.gather(order, jnp.take(det.valid, order))
    return det


class GDINODetector:
    """Callable cloud-detector backend for engine/collect.py.

    Holds the converted GroundingDINO params + flax BERT; batches run under
    one jit. ``detect(images_u8, image_hw) → batched Detections`` in canvas
    coordinates.
    """

    IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
    IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

    def __init__(self, model, params, bert_apply: Callable,
                 class_names: Sequence[str], tokenizer,
                 threshold: float = 0.25, capacity: int = 256,
                 per_class_test: bool = False,
                 type_filter: bool = False):
        """per_class_test: one caption per class, C separate forwards,
        concatenated (MODEL.TEACHER_CLOUD.PER_CLASS_TEST,
        gdino.py per_class_test mode). type_filter =
        MODEL.TEACHER_CLOUD.USE_DINO_TYPE_FILTER (per-pair filtering,
        gdino.py:193-203)."""
        self.model = model
        self.params = params
        self.bert_apply = bert_apply
        self.threshold = threshold
        self.capacity = capacity
        self.per_class_test = per_class_test
        self.type_filter = type_filter
        if per_class_test:
            self._sub = [GDINODetector(model, params, bert_apply, [name],
                                       tokenizer, threshold,
                                       max(capacity // len(class_names),
                                           16), type_filter=type_filter)
                         for name in class_names]
            self._class_names = list(class_names)
            return
        _, ids, spans = build_captions_and_spans(class_names, tokenizer)
        t = len(ids)
        self.text_ids = ids[None]
        self.text_mask = np.ones((1, t), bool)
        self.positive_map = positive_map_from_spans(spans, t)
        sep_dot = tokenizer.encode(".")
        self.self_mask = phrase_self_attention_mask(
            ids, sep_dot, [tokenizer.cls, tokenizer.sep])[None, None]

        @jax.jit
        def _run(images, image_hw):
            embeds = self.bert_apply(jnp.asarray(self.text_ids),
                                     jnp.asarray(self.text_mask))
            b = images.shape[0]
            embeds = jnp.broadcast_to(embeds, (b,) + embeds.shape[1:])
            tmask = jnp.broadcast_to(jnp.asarray(self.text_mask),
                                     (b, self.text_ids.shape[1]))
            smask = jnp.broadcast_to(
                jnp.asarray(self.self_mask),
                (b, 1) + self.self_mask.shape[2:])
            logits, boxes = self.model.apply({"params": self.params},
                                             images, embeds, tmask, smask)
            pm = jnp.asarray(self.positive_map)
            return jax.vmap(
                lambda lg, bx, hw: postprocess_gdino(
                    lg, bx, pm, hw, self.threshold, self.capacity,
                    type_filter=self.type_filter)
            )(logits, boxes, image_hw)

        self._run = _run

    def detect(self, images_u8: jnp.ndarray,
               image_hw: jnp.ndarray) -> Detections:
        if self.per_class_test:
            from coin_tpu import structures as S
            parts = []
            for ci, sub in enumerate(self._sub):
                det = sub.detect(images_u8, image_hw)
                # remap class 0 → ci; probs stay 2-col (fg, bg) per
                # sub-run, rebuild full row
                c1 = len(self._class_names) + 1
                probs = jnp.full(det.classes.shape + (c1,),
                                 0.0, jnp.float32)
                fg = det.probs[..., 0]
                probs = probs.at[..., ci].set(fg)
                probs = probs.at[..., -1].set(det.probs[..., -1])
                parts.append(det.replace(
                    classes=jnp.where(det.valid, ci, -1), probs=probs))
            out = parts[0]
            for p in parts[1:]:
                out = S.concatenate(out, p)
            return out
        img = images_u8.astype(jnp.float32) / 255.0
        img = (img - self.IMAGENET_MEAN) / self.IMAGENET_STD
        return self._run(img, image_hw)

    __call__ = detect
