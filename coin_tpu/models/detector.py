"""OpenVocabularyRCNN — the CLIPDET / targetDET meta-architecture.

TPU-native re-design of coin/modeling/meta_arch/clip_rcnn.py:187-426:
CLIP-ResNet C4 backbone → RPN head → RoIAlign(res4) → res5 →
mean/attention pool → cosine classifier against learnable-prompt text
features + class-agnostic box regression.

This linen module holds only the *neural* computations; branch logic,
target assembly and losses are pure functions (coin_tpu.models.roi_heads /
rpn) composed by the engine's jitted train steps. All evolving non-param
state (prototypes, EMA teacher) lives in the engine's TrainState.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.models.clip_resnet import (AttentionPool2d, CLIPResNetBackbone,
                                         DEPTH_CFG, Res5Head)
from coin_tpu.models.rpn import RPNHead
from coin_tpu.models.roi_heads import BoxPredictor
from coin_tpu.models.text_encoder import PromptedTextEncoder, TextTransformer
from coin_tpu.ops.roi_align import roi_align, roi_align_int8

# CLIP text-feature dims per visual backbone (fast_rcnn.py:283:
# RN50 1024, RN101 512, RN50x4 640, RN50x16 768)
TEXT_DIMS = {50: 1024, 101: 512, 200: 640, 800: 768}


class OpenVocabularyRCNN(nn.Module):
    num_classes: int                  # foreground classes
    depth: int = 50
    pooling: str = "meanpool"         # 'meanpool' | 'attnpool'
    num_anchors: int = 15
    add_prompt_num: int = 4
    prompt_tmp_len: int = 4
    text_layers: int = 12
    text_width: int = 512
    text_heads: int = 8
    compute_dtype: Any = jnp.float32
    # roll identical ResNet blocks into lax.scan (smaller executable /
    # faster compiles; param layout changes — see clip_resnet.ResStage)
    scan_blocks: bool = False
    # 1 = class-agnostic box regression (every shipped reference config);
    # num_classes = per-class delta columns (fast_rcnn.py:249)
    box_reg_classes: int = 1
    # dynamic-int8 convs in backbone+res5 (serving-path throughput lever,
    # clip_resnet.Int8Conv). Inference-only: never set on a training model.
    quant_convs: bool = False
    # dynamic-int8 TRAINING convs in res5 (TPU.INT8_TRAIN,
    # clip_resnet.Int8TrainConv) — the hot 64% of the cached step's
    # conv time rides the 2x int8 MXU. Mode int: 0 = off, 1 = full
    # int8 (fwd+dgrad+wgrad), 2 = wgrad-exact (int8 fwd+dgrad, exact
    # weight gradients — TPU.INT8_TRAIN_WGRAD: false), 3 = per-sample
    # activation/gradient scales + exact wgrad (TPU.INT8_TRAIN_SCALE:
    # sample). A semantic knob gated on its fixture-v3 A/B (BENCH.md).
    quant_train_res5: int = 0
    # dynamic-int8 RoIAlign (TPU.INT8_ROI, ops/roi_align.roi_align_int8):
    # both pooling contractions on the int8 MXU with an s8 intermediate
    # (the 1.9 GB/step bandwidth block of the int8 training step —
    # BENCH.md round 5). Straight-through exact backward. Semantic knob,
    # same A/B gate as every int8 lever.
    quant_roi: bool = False

    def setup(self):
        cfg = DEPTH_CFG[self.depth]
        self.text_dim = TEXT_DIMS[self.depth]
        self.backbone = CLIPResNetBackbone(self.depth,
                                           dtype=self.compute_dtype,
                                           scan=self.scan_blocks,
                                           quant=self.quant_convs)
        self.rpn_head = RPNHead(self.num_anchors, dtype=self.compute_dtype)
        self.res5 = Res5Head(self.depth, dtype=self.compute_dtype,
                             scan=self.scan_blocks,
                             quant=self.quant_convs,
                             qt=self.quant_train_res5)
        if self.pooling == "attnpool":
            self.attnpool = AttentionPool2d(
                embed_dim=cfg["width"] * 32, num_heads=cfg["heads"],
                output_dim=self.text_dim)
            feat_dim = self.text_dim
        else:
            feat_dim = cfg["width"] * 32  # res5 channels (2048 for RN50)
        self.box_predictor = BoxPredictor(
            self.text_dim, box_dim=4 * self.box_reg_classes)
        self.text_trunk = TextTransformer(
            width=self.text_width, heads=self.text_heads,
            layers=self.text_layers, embed_dim=self.text_dim,
            dtype=self.compute_dtype)
        self.prompted_text = PromptedTextEncoder(
            trunk=self.text_trunk, num_classes=self.num_classes + 1,
            prompt_tmp_len=self.prompt_tmp_len,
            add_prompt_num=self.add_prompt_num)

    # ---------------- neural sub-computations ---------------- #
    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) normalized → res4 (B, H/16, W/16, C4)."""
        return self.backbone(images)

    def rpn(self, feats: jnp.ndarray):
        return self.rpn_head(feats)

    def pool_boxes(self, feats: jnp.ndarray, boxes: jnp.ndarray,
                   resolution: int = 14) -> jnp.ndarray:
        """RoIAlign(res4, stride 16) → res5 → pooled region features.

        feats (B, h, w, C); boxes (B, N, 4) image coords → (B, N, D).

        res5 runs on the EXPLICITLY collapsed (B·N, r, r, C) crop batch
        rather than under vmap: the math is identical (res5 has no
        cross-batch ops — FrozenBN is affine), but the vmap formulation
        made XLA materialize a physical layout copy of the full crop
        tensor at the implicit collapse (0.7 GB/step at production
        shapes; round-3 trace).
        """
        ra = roi_align_int8 if self.quant_roi else roi_align

        def single(f, b):
            return ra(f, b, 1.0 / 16.0, resolution=resolution,
                      sampling_ratio=2)
        x = jax.vmap(single)(feats, boxes)          # (B, N, r, r, C)
        bsz, n = x.shape[0], x.shape[1]
        x = x.reshape((bsz * n,) + x.shape[2:])
        x = self.res5(x)                            # (B·N, r/2, r/2, 2048)
        if self.pooling == "attnpool":
            pooled = self.attnpool(x)
        else:
            pooled = jnp.mean(x, axis=(1, 2))
        return pooled.reshape(bsz, n, -1)

    def pool_boxes_fast(self, feats: jnp.ndarray, boxes: jnp.ndarray,
                        resolution: int = 7) -> jnp.ndarray:
        """Fast head (TPU crop-count lever, BENCH.md): res5 over the FULL
        res4 map once (a few thousand pixels), then RoIAlign the res5 map
        at stride 32 — instead of res5 over every 14×14 crop (hundreds of
        thousands of crop-pixels for 1000 proposals). Same params, same
        output dim; features differ from the exact C4 path at crop
        boundaries (full-image context instead of crop padding), so this
        is a gated approximation — exact-parity path is pool_boxes."""
        f5 = self.res5(feats)                 # (B, h/32, w/32, 2048)

        def single(f, b):
            x = roi_align(f, b, 1.0 / 32.0, resolution=resolution,
                          sampling_ratio=2)
            if self.pooling == "attnpool":
                return self.attnpool(x)
            return jnp.mean(x, axis=(1, 2))
        return jax.vmap(single)(f5, boxes)

    def predict(self, pooled: jnp.ndarray, text_features: jnp.ndarray):
        """pooled (..., D) → (scores (..., C+1), deltas (..., 4·K),
        class_feats (..., text_dim)); K = box_reg_classes."""
        flat = pooled.reshape(-1, pooled.shape[-1]).astype(jnp.float32)
        class_feats, deltas = self.box_predictor(flat)
        scores = self.box_predictor.classify(class_feats, text_features)
        lead = pooled.shape[:-1]
        return (scores.reshape(lead + (-1,)),
                deltas.reshape(lead + (4 * self.box_reg_classes,)),
                class_feats.reshape(lead + (-1,)))

    def text_features(self, class_tokens: jnp.ndarray) -> jnp.ndarray:
        """Learnable-prompt text features (C+1, text_dim), normalized.

        class_tokens: (C+1, 77) int32 tokenized 'a photo of a X..X {cls}.'
        """
        embeds = self.text_trunk.token_embedding(class_tokens)
        eot = jnp.argmax(class_tokens, axis=-1)
        return self.prompted_text(embeds, eot)

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Frozen-prompt text encoding (for template prototypes)."""
        return self.text_trunk(tokens)

    def __call__(self, images: jnp.ndarray, class_tokens: jnp.ndarray,
                 rois: jnp.ndarray):
        """Convenience full forward used for init/jit-checks: backbone →
        rpn + pooled predictions on given ROIs."""
        feats = self.features(images)
        obj, deltas = self.rpn(feats)
        pooled = self.pool_boxes(feats, rois)
        text = self.text_features(class_tokens)
        scores, box_deltas, class_feats = self.predict(pooled, text)
        return {"objectness": obj, "rpn_deltas": deltas, "scores": scores,
                "deltas": box_deltas, "class_feats": class_feats}
