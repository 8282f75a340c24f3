"""GLIP cloud teacher (Swin + BERT + VLDyHead), TPU-native.

Re-implements the grounded pre-training detector the reference consumes
from maskrcnn_benchmark (coin/modeling/meta_arch/glip.py + glip_model.py;
SURVEY §2.3): a one-stage anchor-based detector whose classification is a
dot product between visual features and BERT token embeddings, with
deep vision-language fusion inside the head.

VLDyHead block (per level, shared weights across levels):
  language fusion (bidirectional image↔text attention)
  → DyConv: deformable 3×3 conv aggregating (level−1, level, level+1)
    with a spatial offset/mask net and a level attention (scale attn)
  → per-anchor logits = dot(visual, language) + bias; box deltas;
    centerness.

Deformable conv is expressed with the same bilinear-gather formulation as
ms_deform_sample (models/deformable.py) — XLA-native, no custom CUDA.

Weight layout mirrors the official GLIP checkpoints
(``glip_large_model.pth``) for mechanical conversion
(models/convert_glip.py).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.models.gdino import BiMultiHeadAttention
from coin_tpu.models.swin import SwinTransformer

HIDDEN = 256
LANG_DIM = 768


def deform_conv3x3(x: jnp.ndarray, offsets: jnp.ndarray,
                   mask: jnp.ndarray, kernel: jnp.ndarray,
                   bias: Optional[jnp.ndarray], stride: int = 1
                   ) -> jnp.ndarray:
    """Modulated deformable 3×3 conv (DCNv2) as bilinear gathers.

    x (B, H, W, Cin); offsets (B, Ho, Wo, 18) (dy,dx per tap);
    mask (B, Ho, Wo, 9) sigmoid modulation; kernel (3, 3, Cin, Cout).
    """
    b, h, w, cin = x.shape
    ho, wo = offsets.shape[1:3]
    cout = kernel.shape[-1]
    ys = jnp.arange(ho, dtype=jnp.float32) * stride
    xs = jnp.arange(wo, dtype=jnp.float32) * stride
    base_y, base_x = jnp.meshgrid(ys, xs, indexing="ij")
    out = jnp.zeros((b, ho, wo, cout), jnp.float32)
    x_flat = x.reshape(b, h * w, cin)
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        dy = offsets[..., 2 * k]
        dx = offsets[..., 2 * k + 1]
        py = base_y[None] + ky + dy
        px = base_x[None] + kx + dx
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        fy = py - y0
        fx = px - x0

        def tap(yy, xx, wgt):
            inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            idx = (jnp.clip(yy, 0, h - 1).astype(jnp.int32) * w
                   + jnp.clip(xx, 0, w - 1).astype(jnp.int32))
            v = jnp.take_along_axis(
                x_flat, idx.reshape(b, -1, 1), axis=1)
            v = v.reshape(b, ho, wo, cin)
            return v * jnp.where(inside, wgt, 0.0)[..., None].astype(
                v.dtype)

        samp = (tap(y0, x0, (1 - fy) * (1 - fx))
                + tap(y0, x0 + 1, (1 - fy) * fx)
                + tap(y0 + 1, x0, fy * (1 - fx))
                + tap(y0 + 1, x0 + 1, fy * fx))
        samp = samp * mask[..., k:k + 1].astype(samp.dtype)
        out = out + jnp.einsum("bhwc,cd->bhwd", samp, kernel[ky + 1,
                                                             kx + 1],
                               preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


class DyConv(nn.Module):
    """One deformable conv branch (DCNv2 kernel; offsets/mask supplied by
    the block-level offset net — official GLIP computes one offset field
    per level, shared across the three branches)."""
    channels: int = HIDDEN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offsets, mask, stride: int = 1):
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (3, 3, x.shape[-1], self.channels))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return deform_conv3x3(x.astype(jnp.float32), offsets, mask,
                              kernel, bias, stride)


class VLDyHeadBlock(nn.Module):
    """One fused vision-language DyHead block (shared over levels)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], lang: jnp.ndarray,
                 lang_mask: jnp.ndarray):
        # ---- language fusion over the concatenated levels ----
        b = feats[0].shape[0]
        shapes = [f.shape[1:3] for f in feats]
        vis = jnp.concatenate([f.reshape(b, -1, f.shape[-1])
                               for f in feats], axis=1)
        ln_v = nn.LayerNorm(name="fusion_layer_norm_v", dtype=jnp.float32)
        ln_l = nn.LayerNorm(name="fusion_layer_norm_l", dtype=jnp.float32)
        gamma_v = self.param("fusion_gamma_v",
                             nn.initializers.constant(1.0 / 8), (HIDDEN,))
        gamma_l = self.param("fusion_gamma_l",
                             nn.initializers.constant(1.0 / 8),
                             (LANG_DIM,))
        dv, dl = BiMultiHeadAttention(
            dim=HIDDEN, heads=8, embed=2048, l_dim=LANG_DIM,
            name="fusion_attn", dtype=self.dtype)(
            ln_v(vis).astype(vis.dtype), ln_l(lang).astype(lang.dtype),
            lang_mask)
        vis = vis + gamma_v.astype(vis.dtype) * dv
        lang = lang + gamma_l.astype(lang.dtype) * dl

        # split back to levels
        out_feats = []
        start = 0
        for (h, w) in shapes:
            out_feats.append(vis[:, start:start + h * w].reshape(
                b, h, w, HIDDEN))
            start += h * w

        # ---- DyConv across neighboring levels with scale attention ----
        # one offset/mask field per level, from the current level's
        # feature, shared by all three branches (official GLIP DyConv)
        offset_net = nn.Conv(27, (3, 3), padding=1, name="dyconv_offset",
                             dtype=jnp.float32)
        dy_mid = DyConv(name="dyconv_mid", dtype=self.dtype)
        dy_low = DyConv(name="dyconv_low", dtype=self.dtype)
        dy_high = DyConv(name="dyconv_high", dtype=self.dtype)
        scale_fc = nn.Dense(1, name="scale_attn_fc", dtype=jnp.float32)

        fields = []
        for f in out_feats:
            off = offset_net(f)
            fields.append((off[..., :18], jax.nn.sigmoid(off[..., 18:])))

        fused_levels = []
        for lvl, f in enumerate(out_feats):
            offsets, mask = fields[lvl]
            branches = [dy_mid(f, offsets, mask)]
            if lvl > 0:
                # lower (higher-res) level sampled at stride 2 with THIS
                # level's offset field (already at output resolution)
                lo = out_feats[lvl - 1]
                branches.append(dy_low(lo, offsets, mask, stride=2)
                                [:, :f.shape[1], :f.shape[2]])
            if lvl < len(out_feats) - 1:
                hi = out_feats[lvl + 1]
                hoff, hmask = fields[lvl + 1]
                up = dy_high(hi, hoff, hmask)
                up = jax.image.resize(
                    up, (b, f.shape[1], f.shape[2], HIDDEN), "nearest")
                branches.append(up)
            stacked = jnp.stack(branches, axis=0)   # (K, B, H, W, C)
            pooled = jnp.mean(stacked, axis=(2, 3), keepdims=True)
            attn = jax.nn.relu6(scale_fc(pooled) + 3.0) / 6.0
            fused = jnp.mean(stacked * attn, axis=0)
            fused_levels.append(nn.relu(fused).astype(self.dtype))
        return fused_levels, lang


class GLIPHead(nn.Module):
    """Final per-level predictions: language-dot logits + box deltas +
    centerness (one anchor per location × A aspect variants)."""
    num_anchors: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], lang: jnp.ndarray):
        # language embedding projection + per-token bias
        dot_proj = nn.Dense(HIDDEN, name="dot_product_projection_text",
                            dtype=self.dtype)
        bias_lang = self.param("bias_lang", nn.initializers.zeros,
                               (LANG_DIM,))
        bias0 = self.param("bias0", nn.initializers.zeros, ())
        embed = dot_proj(lang) / np.sqrt(HIDDEN)
        tok_bias = (lang @ bias_lang.astype(lang.dtype)) + bias0

        img_proj = nn.Conv(HIDDEN * self.num_anchors, (1, 1),
                           name="dot_product_projection_image",
                           dtype=self.dtype)
        bbox_pred = nn.Conv(4 * self.num_anchors, (3, 3), padding=1,
                            name="bbox_pred", dtype=self.dtype)
        ctr_conv = nn.Conv(self.num_anchors, (3, 3), padding=1,
                           name="centerness", dtype=self.dtype)
        logits, deltas, centerness = [], [], []
        for f in feats:
            b, h, w, _ = f.shape
            img = img_proj(f).reshape(b, h * w * self.num_anchors, HIDDEN)
            lg = jnp.einsum("bnd,btd->bnt", img, embed,
                            preferred_element_type=jnp.float32)
            lg = jnp.clip(lg + tok_bias[:, None, :], -50000.0, 50000.0)
            logits.append(lg)
            deltas.append(bbox_pred(f).reshape(b, -1, 4))
            centerness.append(ctr_conv(f).reshape(b, -1))
        return (jnp.concatenate(logits, axis=1),
                jnp.concatenate(deltas, axis=1),
                jnp.concatenate(centerness, axis=1))


class GLIP(nn.Module):
    """Swin backbone (+2 extra strided levels) → N VLDyHead blocks → head.

    Returns per-anchor (token_logits, box_deltas, centerness) plus the
    anchor grid metadata needed for decoding.
    """
    variant: str = "swinL"
    num_blocks: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, bert_embeds: jnp.ndarray,
                 lang_mask: jnp.ndarray):
        feats = SwinTransformer(self.variant, name="backbone",
                                dtype=self.dtype)(images)
        levels = []
        for i, f in enumerate(feats):
            levels.append(nn.Conv(HIDDEN, (1, 1), name=f"lateral_{i}",
                                  dtype=self.dtype)(f))
        extra = levels[-1]
        for i in range(2):
            extra = nn.Conv(HIDDEN, (3, 3), strides=(2, 2), padding=1,
                            name=f"extra_{i}", dtype=self.dtype)(extra)
            levels.append(extra)

        lang = bert_embeds
        for i in range(self.num_blocks):
            levels, lang = VLDyHeadBlock(name=f"dyhead_{i}",
                                         dtype=self.dtype)(
                levels, lang, lang_mask)
        shapes = [(f.shape[1], f.shape[2]) for f in levels]
        logits, deltas, centerness = GLIPHead(name="head",
                                              dtype=self.dtype)(levels,
                                                                lang)
        return logits, deltas, centerness, shapes
