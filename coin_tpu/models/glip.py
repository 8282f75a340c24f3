"""GLIP cloud teacher (Swin + FPN + BERT + VLDyHead), TPU-native.

Re-implements the grounded pre-training detector the reference consumes
from maskrcnn_benchmark (coin/modeling/meta_arch/glip.py + glip_model.py;
SURVEY §2.3): a one-stage anchor-based detector whose classification is a
dot product between visual features and BERT token embeddings, with
deep vision-language fusion inside the head.

Round 4: the architecture follows the OFFICIAL GLIP module graph (the
``glip_Swin_L.yaml`` build: SWINT-FPN-RETINANET + VLDYHEAD with
USE_GN/USE_DYRELU/USE_DFCONV/USE_DYFUSE, EARLY_FUSE_ON), so official
checkpoints map key-for-key (models/manifests.glip_manifest +
models/convert_glip.py):

  Swin (stages 2-4) → FPN (lateral+output convs, RetinaNet P6/P7)
  → N × [ VLFuse (bidirectional image↔text attention, embed 2048)
          → BertEncoderLayer (language self path, hidden 768)
          → DyConv (3 deformable 3×3 branches + GroupNorm(16),
                    shared offset net, per-branch scale attention
                    AttnConv + h_sigmoid, DYReLU activation) ]
  → head: logits = <visual, text_proj(fused_lang / 2)> / exp(log_scale)
          + lang·bias_lang + bias0 ; per-level scaled box deltas;
          centerness. (dot_product_projection_image is Identity in the
          official layout — the visual features feed the dot product
          directly.)

Deformable conv is expressed with the same bilinear-gather formulation as
ms_deform_sample (models/deformable.py) — XLA-native, no custom CUDA.
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


def h_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


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


class Conv3x3Norm(nn.Module):
    """One deformable branch: DCNv2 kernel + bias followed by
    GroupNorm(16) — the official Conv3x3Norm with USE_GN (offsets/mask
    supplied by the block-level offset net, shared across branches)."""
    channels: int = HIDDEN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offsets, mask, stride: int = 1):
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (3, 3, x.shape[-1], self.channels))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        y = deform_conv3x3(x.astype(jnp.float32), offsets, mask,
                           kernel, bias, stride)
        return nn.GroupNorm(num_groups=16, name="gn",
                            dtype=jnp.float32)(y)


class DyReLU(nn.Module):
    """DYReLU-B (channel-wise, K2): coefficients from globally pooled
    features; out = max(x·a1 + b1, x·a2 + b2). Official init:
    lambda_a·2 = 2, init_a = [1, 0], init_b = [0, 0]."""
    channels: int = HIDDEN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        y = nn.relu(nn.Dense(self.channels // 4, name="fc1",
                             dtype=jnp.float32)(y))
        y = h_sigmoid(nn.Dense(4 * self.channels, name="fc2",
                               dtype=jnp.float32)(y))
        a1, b1, a2, b2 = jnp.split(y, 4, axis=-1)
        a1 = (a1 - 0.5) * 2.0 + 1.0
        a2 = (a2 - 0.5) * 2.0
        b1 = b1 - 0.5
        b2 = b2 - 0.5
        bc = lambda t: t[:, None, None, :].astype(x.dtype)
        return jnp.maximum(x * bc(a1) + bc(b1), x * bc(a2) + bc(b2))


class BertEncoderLayer(nn.Module):
    """The dyhead tower's language self path — a standard (post-LN)
    BERT encoder layer at hidden 768 with GLIP's attention-score clamp
    (CLAMP_BERTATTN_*: ±50000)."""
    hidden: int = LANG_DIM
    heads: int = 12
    inter: int = 3072
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang, lang_mask):
        b, t, _ = lang.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="query", dtype=self.dtype)(lang)
        k = nn.Dense(self.hidden, name="key", dtype=self.dtype)(lang)
        v = nn.Dense(self.hidden, name="value", dtype=self.dtype)(lang)
        sh = lambda z: z.reshape(b, t, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", sh(q), sh(k),
                          preferred_element_type=jnp.float32)
        attn = jnp.clip(attn / np.sqrt(hd), -50000.0, 50000.0)
        attn = jnp.where(lang_mask[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, sh(v)).reshape(b, t, -1)
        ctx = nn.Dense(self.hidden, name="att_out", dtype=self.dtype)(ctx)
        lang = nn.LayerNorm(name="att_ln", dtype=jnp.float32)(
            lang + ctx).astype(lang.dtype)
        f = jax.nn.gelu(nn.Dense(self.inter, name="inter",
                                 dtype=self.dtype)(lang), approximate=False)
        f = nn.Dense(self.hidden, name="out", dtype=self.dtype)(f)
        return nn.LayerNorm(name="out_ln", dtype=jnp.float32)(
            lang + f).astype(lang.dtype)


class VLDyHeadBlock(nn.Module):
    """One fused vision-language DyHead block (shared over levels):
    VLFuse → BertEncoderLayer (language) → DyConv (vision)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], lang: jnp.ndarray,
                 lang_mask: jnp.ndarray):
        # ---- VLFuse: language fusion over the concatenated levels ----
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

        # ---- language self path ----
        lang = BertEncoderLayer(name="lang_layer",
                                dtype=self.dtype)(lang, lang_mask)

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
        dy_mid = Conv3x3Norm(name="dyconv_mid", dtype=self.dtype)
        dy_low = Conv3x3Norm(name="dyconv_low", dtype=self.dtype)
        dy_high = Conv3x3Norm(name="dyconv_high", dtype=self.dtype)
        # AttnConv (official): h_sigmoid(ReLU(1×1 conv(avg-pool(branch))))
        scale_fc = nn.Dense(1, name="scale_attn_fc", dtype=jnp.float32)
        dyrelu = DyReLU(name="dyrelu", dtype=self.dtype)

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
                    up, (b, f.shape[1], f.shape[2], HIDDEN), "bilinear")
                branches.append(up)
            stacked = jnp.stack(branches, axis=0)   # (K, B, H, W, C)
            pooled = jnp.mean(stacked, axis=(2, 3), keepdims=True)
            attn = h_sigmoid(jax.nn.relu(scale_fc(pooled)))
            fused = jnp.mean(stacked * attn, axis=0)
            fused_levels.append(dyrelu(fused).astype(self.dtype))
        return fused_levels, lang


class GLIPHead(nn.Module):
    """Final per-level predictions: language-dot logits + per-level
    scaled box deltas + centerness (official VLDyHead tail: 1×1 convs,
    Identity image projection, text projection of fused language / 2,
    logits divided by exp(log_scale))."""
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
        log_scale = self.param("log_scale", nn.initializers.zeros, ())
        embed = dot_proj(lang / 2.0)
        tok_bias = (lang @ bias_lang.astype(lang.dtype)) + bias0

        bbox_pred = nn.Conv(4 * self.num_anchors, (1, 1),
                            name="bbox_pred", dtype=self.dtype)
        ctr_conv = nn.Conv(self.num_anchors, (1, 1),
                           name="centerness", dtype=self.dtype)
        scales = self.param("scales", nn.initializers.ones,
                            (len(feats),))
        logits, deltas, centerness = [], [], []
        inv_scale = 1.0 / jnp.exp(log_scale)
        for lvl, f in enumerate(feats):
            b, h, w, _ = f.shape
            # dot_product_projection_image is Identity in the official
            # layout: the tower features ARE the queries
            img = f.reshape(b, h * w * self.num_anchors, HIDDEN)
            lg = jnp.einsum("bnd,btd->bnt", img, embed,
                            preferred_element_type=jnp.float32)
            lg = jnp.clip(lg * inv_scale + tok_bias[:, None, :],
                          -50000.0, 50000.0)
            logits.append(lg)
            deltas.append((bbox_pred(f) * scales[lvl]).reshape(b, -1, 4))
            centerness.append(ctr_conv(f).reshape(b, -1))
        return (jnp.concatenate(logits, axis=1),
                jnp.concatenate(deltas, axis=1),
                jnp.concatenate(centerness, axis=1))


class FPN(nn.Module):
    """maskrcnn_benchmark FPN over the swin stages + RetinaNet P6/P7
    (LastLevelP6P7 on P5; P7 input is relu(P6))."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        inners = [nn.Conv(HIDDEN, (1, 1), name=f"fpn_inner{i + 2}",
                          dtype=self.dtype)(f)
                  for i, f in enumerate(feats)]
        # top-down pathway (nearest upsample, maskrcnn F.interpolate)
        outs: List[jnp.ndarray] = [None] * len(inners)
        last = inners[-1]
        outs[-1] = nn.Conv(HIDDEN, (3, 3), padding=1,
                           name=f"fpn_layer{len(inners) + 1}",
                           dtype=self.dtype)(last)
        for i in range(len(inners) - 2, -1, -1):
            b, h, w, c = inners[i].shape
            up = jax.image.resize(last, (b, h, w, c), "nearest")
            last = inners[i] + up
            outs[i] = nn.Conv(HIDDEN, (3, 3), padding=1,
                              name=f"fpn_layer{i + 2}",
                              dtype=self.dtype)(last)
        p6 = nn.Conv(HIDDEN, (3, 3), strides=(2, 2), padding=1,
                     name="top_p6", dtype=self.dtype)(outs[-1])
        p7 = nn.Conv(HIDDEN, (3, 3), strides=(2, 2), padding=1,
                     name="top_p7", dtype=self.dtype)(nn.relu(p6))
        return outs + [p6, p7]


class GLIP(nn.Module):
    """Swin → FPN (+P6/P7) → N VLDyHead blocks → head.

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
        levels = FPN(name="fpn", dtype=self.dtype)(feats)

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
