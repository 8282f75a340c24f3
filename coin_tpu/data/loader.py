"""Data loaders: host decode/resize → static padded canvas; everything
photometric happens on device (coin_tpu.data.augment).

Replaces coin/data/build.py + dataset_mapper.py: the unsupervised train
loader yields fixed-shape batches carrying the uint8 canvas, flip flags,
scale factors and (optionally) the packed per-image cached teacher results;
strong/weak views are materialized on device inside the train step, not as
two CPU image copies.
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

# PIL decode/resize release the GIL; a small shared pool keeps the TPU fed
_DECODE_POOL = ThreadPoolExecutor(max_workers=8)

from coin_tpu.data.voc import DatasetSpec, get_dataset, load_voc_instances


@dataclass
class Batch:
    """Host-side batch (numpy); converted to device arrays by the engine."""
    images: np.ndarray          # (B, H, W, 3) uint8, resized+padded
    image_hw: np.ndarray        # (B, 2) valid (h, w) on the canvas
    orig_hw: np.ndarray         # (B, 2) original image size
    scale: np.ndarray           # (B,) resize factor orig→canvas
    flip: np.ndarray            # (B,) bool (train only)
    image_ids: List[str]
    indices: np.ndarray         # (B,) dataset indices
    gt_boxes: Optional[np.ndarray] = None      # (B, G, 4) canvas coords
    gt_classes: Optional[np.ndarray] = None    # (B, G)
    gt_valid: Optional[np.ndarray] = None      # (B, G)
    gt_difficult: Optional[np.ndarray] = None  # (B, G)
    # cached-teacher views attached by a ResultStore-backed loader:
    # {"RCNN": {boxes, classes, scores, probs, valid}, "RPN": {...}},
    # each batched (B, cap, ...) in canvas coordinates
    online: Optional[dict] = None


def _resize_factor(h: int, w: int, min_size: int, max_size: int) -> float:
    scale = min_size / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    return scale


class _BaseLoader:
    def __init__(self, dataset_name: str, root: str, min_size: int = 600,
                 max_size: int = 1333, canvas_hw: Tuple[int, int] = None,
                 gt_capacity: int = 64):
        spec = get_dataset(dataset_name)
        self.spec = spec
        self.records = load_voc_instances(
            os.path.join(root, spec.dirname), spec.split, spec.class_names,
            spec.image_ext)
        self.min_size = min_size
        self.max_size = max_size
        self.gt_capacity = gt_capacity
        if canvas_hw is None:
            canvas_hw = self._infer_canvas()
        self.canvas_hw = canvas_hw

    def _infer_canvas(self) -> Tuple[int, int]:
        """Static canvas: resize the largest image shape over ALL records
        and round up /32. VOC XMLs carry <size>, so this is a pure
        host-side scan; images lacking XML dims are opened once. A
        too-small canvas would silently clamp-resize later images and
        distort their scale (see load_image), so the max must be true."""
        hs, ws = [], []
        for rec in self.records:
            h = rec.get("height")
            w = rec.get("width")
            if h is None:
                with Image.open(rec["file_name"]) as im:
                    w, h = im.size
                rec["height"], rec["width"] = h, w
            s = _resize_factor(h, w, self.min_size, self.max_size)
            hs.append(h * s)
            ws.append(w * s)
        up = lambda v: int(-(-max(v) // 32) * 32)
        return up(hs), up(ws)

    def load_image(self, rec: dict, canvas_hw=None) -> Tuple[np.ndarray,
                                                              float]:
        canvas_hw = canvas_hw or self.canvas_hw
        with Image.open(rec["file_name"]) as im:
            im = im.convert("RGB")
            w, h = im.size
            rec.setdefault("height", h)
            rec.setdefault("width", w)
            scale = _resize_factor(h, w, self.min_size, self.max_size)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            if nh > canvas_hw[0] or nw > canvas_hw[1]:
                # canvas too small for this image (can only happen with a
                # user-forced canvas_hw; _infer_canvas scans all records)
                import logging
                logging.getLogger(__name__).warning(
                    "image %s (%dx%d, scaled %dx%d) exceeds the static "
                    "canvas %s — clamping distorts its scale",
                    rec.get("image_id", rec["file_name"]), h, w, nh, nw,
                    canvas_hw)
                nh = min(nh, canvas_hw[0])
                nw = min(nw, canvas_hw[1])
            im = im.resize((nw, nh), Image.BILINEAR)
        arr = np.asarray(im, np.uint8)
        canvas = np.zeros((*canvas_hw, 3), np.uint8)
        canvas[:nh, :nw] = arr
        return canvas, scale, (nh, nw)

    def _native_decode(self, indices: Sequence[int], canvas_hw=None):
        """Batched native JPEG decode+resize (coin_tpu.native); returns
        None when unavailable or any image isn't a JPEG."""
        from coin_tpu import native
        if not native.available():
            return None
        blobs, scales = [], []
        for i in indices:
            rec = self.records[i]
            if not rec["file_name"].lower().endswith((".jpg", ".jpeg")):
                return None
            with open(rec["file_name"], "rb") as f:
                blob = f.read()
            if "height" not in rec:
                hw = native.jpeg_size(blob)
                if hw is None:
                    return None
                rec["height"], rec["width"] = hw
            blobs.append(blob)
            scales.append(_resize_factor(rec["height"], rec["width"],
                                         self.min_size, self.max_size))
        return native.decode_batch(blobs, scales,
                                   canvas_hw or self.canvas_hw), scales

    def pack_batch(self, indices: Sequence[int],
                   flips: Optional[np.ndarray] = None,
                   canvas_hw: Optional[Tuple[int, int]] = None) -> Batch:
        b = len(indices)
        ch, cw = canvas_hw or self.canvas_hw
        images = np.zeros((b, ch, cw, 3), np.uint8)
        image_hw = np.zeros((b, 2), np.float32)
        orig_hw = np.zeros((b, 2), np.float32)
        scales = np.zeros((b,), np.float32)
        ids = []
        g = self.gt_capacity
        gt_boxes = np.zeros((b, g, 4), np.float32)
        gt_classes = np.full((b, g), -1, np.int32)
        gt_valid = np.zeros((b, g), bool)
        gt_diff = np.zeros((b, g), bool)
        flips = (np.zeros(b, bool) if flips is None
                 else np.asarray(flips, bool))
        nat = self._native_decode(indices, (ch, cw))
        if nat is not None and nat[0] is not None:
            (canvases, out_hw), nat_scales = nat
            loaded = [(canvases[j], nat_scales[j],
                       (int(out_hw[j][0]), int(out_hw[j][1])))
                      for j in range(b)]
        else:
            loaded = list(_DECODE_POOL.map(
                lambda i: self.load_image(self.records[i], (ch, cw)),
                indices))
        for j, i in enumerate(indices):
            rec = self.records[i]
            img, scale, (nh, nw) = loaded[j]
            images[j] = img
            if flips[j]:
                # flip the VALID region only (reference order: hflip
                # happens before pad-to-canvas, dataset_mapper.py weak
                # resize/flip) — a full-canvas flip would right-align
                # the content while the boxes below flip around nw,
                # corrupting every flipped sample whose image does not
                # exactly fill the canvas width
                images[j, :nh, :nw] = images[j, :nh, :nw][:, ::-1]
            image_hw[j] = (nh, nw)
            orig_hw[j] = (rec["height"], rec["width"])
            scales[j] = scale
            ids.append(rec["image_id"])
            n = min(len(rec["boxes"]), g)
            if n:
                boxes = rec["boxes"][:n] * scale
                if flips[j]:
                    flipped = boxes.copy()
                    flipped[:, 0] = nw - boxes[:, 2]
                    flipped[:, 2] = nw - boxes[:, 0]
                    boxes = flipped
                gt_boxes[j, :n] = boxes
                gt_classes[j, :n] = rec["classes"][:n]
                gt_valid[j, :n] = True
                gt_diff[j, :n] = rec["difficult"][:n]
        return Batch(images, image_hw, orig_hw, scales, flips, ids,
                     np.asarray(indices), gt_boxes, gt_classes, gt_valid,
                     gt_diff)


class TestLoader(_BaseLoader):
    """Sequential fixed-batch loader (pads the tail by repeating the last
    index; consumers mask with ``n_valid``)."""

    def __init__(self, dataset_name: str, root: str, batch_size: int = 8,
                 **kw):
        super().__init__(dataset_name, root, **kw)
        self.batch_size = batch_size

    def __len__(self):
        return -(-len(self.records) // self.batch_size)

    def __iter__(self):
        n = len(self.records)
        for start in range(0, n, self.batch_size):
            idx = list(range(start, min(start + self.batch_size, n)))
            n_valid = len(idx)
            while len(idx) < self.batch_size:
                idx.append(idx[-1])
            batch = self.pack_batch(idx)
            yield batch, n_valid


class TrainLoader(_BaseLoader):
    """Infinite shuffled loader with random horizontal flips and background
    prefetch (double-buffered on a worker thread)."""

    def __init__(self, dataset_name: str, root: str, batch_size: int = 3,
                 seed: int = 2024, flip: bool = True, prefetch: int = 2,
                 store=None, store_cap: int = 128,
                 store_thresh: Optional[float] = None,
                 aspect_buckets: bool = False, **kw):
        super().__init__(dataset_name, root, **kw)
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)
        self.flip = flip
        self.prefetch = prefetch
        self.store = store
        self.store_cap = store_cap
        self.store_thresh = store_thresh
        self.aspect_buckets = aspect_buckets

    def _attach_store(self, batch: Batch) -> Batch:
        """Pack the cached cloud results for each image in the batch,
        rescaled/flipped to the canvas (host-side replacement for
        BASE_Trainer.preprocess_results, coin/engine/base.py:128-136)."""
        views = {}
        for view in ("RCNN", "RPN"):
            per_img = [self.store.pack_view(
                batch.image_ids[j], view, self.store_cap,
                float(batch.scale[j]), bool(batch.flip[j]),
                float(batch.image_hw[j][1]), self.store_thresh)
                for j in range(len(batch.image_ids))]
            views[view] = {k: np.stack([p[k] for p in per_img])
                           for k in per_img[0]}
        batch.online = views
        return batch

    def _aspect_groups(self):
        """Split indices into landscape / portrait groups (the
        AspectRatioGroupedDatasetTwoCrop semantics, coin/data/common.py:
        4-48): every batch is drawn from one group, so each group gets its
        own static canvas and the jit specializes per orientation."""
        land, port = [], []
        for i, rec in enumerate(self.records):
            h = rec.get("height")
            w = rec.get("width")
            if h is None:
                with Image.open(rec["file_name"]) as im:
                    w, h = im.size
                rec["height"], rec["width"] = h, w
            (land if w >= h else port).append(i)
        return [g for g in (land, port) if g]

    def _group_canvas(self, gi: int):
        if not self.aspect_buckets or not hasattr(self, "_canvases"):
            return self.canvas_hw
        return self._canvases[gi]

    def _gen(self):
        groups = self._aspect_groups() if self.aspect_buckets \
            else [list(range(len(self.records)))]
        if self.aspect_buckets:
            up = lambda v: int(-(-v // 32) * 32)
            self._canvases = []
            for g in groups:
                hs, ws = [], []
                for i in g:
                    rec = self.records[i]
                    sc = _resize_factor(rec["height"], rec["width"],
                                        self.min_size, self.max_size)
                    hs.append(rec["height"] * sc)
                    ws.append(rec["width"] * sc)
                self._canvases.append((up(max(hs)), up(max(ws))))
        orders = [self.rng.permutation(g) for g in groups]
        pos = [0] * len(groups)
        weights = np.asarray([len(g) for g in groups], np.float64)
        weights = weights / weights.sum()
        while True:
            gi = int(self.rng.choice(len(groups), p=weights))
            if pos[gi] + self.batch_size > len(groups[gi]):
                orders[gi] = self.rng.permutation(groups[gi])
                pos[gi] = 0
                if len(groups[gi]) < self.batch_size:
                    # tiny group: sample with replacement
                    idx = self.rng.choice(groups[gi], self.batch_size)
                else:
                    idx = orders[gi][:self.batch_size]
                    pos[gi] = self.batch_size
            else:
                idx = orders[gi][pos[gi]:pos[gi] + self.batch_size]
                pos[gi] += self.batch_size
            flips = (self.rng.rand(len(idx)) < 0.5) if self.flip \
                else np.zeros(len(idx), bool)
            batch = self.pack_batch(idx, flips, self._group_canvas(gi))
            if self.store is not None:
                batch = self._attach_store(batch)
            yield batch

    def __iter__(self):
        q = queue_mod.Queue(maxsize=self.prefetch)
        gen = self._gen()

        def worker():
            for item in gen:
                q.put(item)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            yield q.get()
