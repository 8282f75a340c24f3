"""Zero-shot CLIP box scorer.

Replaces the ``CLIP`` meta-architecture (coin/modeling/meta_arch/
clip_rcnn.py:41-184 + CLIPRes5ROIHeads, clip_roi_heads.py:19-87): a frozen
CLIP visual tower classifies *given* boxes — RoIAlign(res4) → res5 →
attention pool → cosine similarity with frozen per-class text features ×
logit_scale.exp() → softmax probs (incl. background column).

Used at collection time to re-score the cached cloud detections ("offline
knowledge"), dropping boxes CLIP classifies as background
(clip_rcnn.py:106-132).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from coin_tpu.models.clip_resnet import (AttentionPool2d, CLIPResNetBackbone,
                                         DEPTH_CFG, Res5Head)
from coin_tpu.models.detector import TEXT_DIMS
from coin_tpu.ops.roi_align import roi_align


class CLIPScorer(nn.Module):
    depth: int = 50
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg = DEPTH_CFG[self.depth]
        self.text_dim = TEXT_DIMS[self.depth]
        self.backbone = CLIPResNetBackbone(self.depth,
                                           dtype=self.compute_dtype)
        self.res5 = Res5Head(self.depth, dtype=self.compute_dtype)
        self.attnpool = AttentionPool2d(
            embed_dim=cfg["width"] * 32, num_heads=cfg["heads"],
            output_dim=self.text_dim)

    def __call__(self, images: jnp.ndarray, boxes: jnp.ndarray,
                 text_features: jnp.ndarray,
                 logit_scale: jnp.ndarray) -> jnp.ndarray:
        """images (B,H,W,3) CLIP-normalized; boxes (B,N,4) image coords;
        text_features (C+1, D) — returns softmax probs (B, N, C+1)."""
        feats = self.backbone(images)

        def single(f, b):
            x = roi_align(f, b, 1.0 / 16.0, resolution=14,
                          sampling_ratio=2)
            x = self.res5(x)
            return self.attnpool(x)

        region = jax.vmap(single)(feats, boxes)        # (B, N, D)
        img = region / jnp.maximum(
            jnp.linalg.norm(region, axis=-1, keepdims=True), 1e-8)
        txt = text_features / jnp.maximum(
            jnp.linalg.norm(text_features, axis=-1, keepdims=True), 1e-8)
        logits = jnp.exp(logit_scale) * jnp.einsum(
            "bnd,cd->bnc", img.astype(jnp.float32), txt)
        return jax.nn.softmax(logits, axis=-1)
