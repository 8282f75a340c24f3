"""Grounding-DINO cloud teacher, TPU-native.

Re-implements the open-set detector the reference wraps
(coin/modeling/meta_arch/gdino.py + the external IDEA GroundingDINO
package; SURVEY §2.3, §2.9): Swin image backbone → BERT text encoder →
feature enhancer (deformable image self-attn + text self-attn +
bidirectional image↔text fusion) → language-guided query selection →
cross-modality decoder → contrastive logits against text tokens.

TPU-first choices: deformable attention is the XLA gather formulation in
models/deformable.py; all shapes static (text padded to max_text_len,
fixed num_queries); bf16-friendly.

Weight compatibility: module/parameter layout mirrors the official
checkpoint structure so `convert_gdino.py` can map
``groundingdino_swinb_cogcoor.pth`` mechanically.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.models.deformable import MSDeformAttention
from coin_tpu.models.swin import SwinTransformer

HIDDEN = 256
MAX_TEXT_LEN = 256


def sine_position_embedding(h: int, w: int, dim: int = HIDDEN,
                            temperature: float = 20.0) -> np.ndarray:
    """GroundingDINO's sine embedding (temperatureH=temperatureW=20),
    normalized to 2π, (H·W, dim)."""
    scale = 2 * np.pi
    eps = 1e-6
    y = (np.arange(h, dtype=np.float32) + 0.5) / (h + eps) * scale
    x = (np.arange(w, dtype=np.float32) + 0.5) / (w + eps) * scale
    dim_t = temperature ** (2 * (np.arange(dim // 2) // 2)
                            / (dim // 2))
    pos_x = x[:, None] / dim_t[None]
    pos_y = y[:, None] / dim_t[None]
    pos_x = np.stack([np.sin(pos_x[:, 0::2]), np.cos(pos_x[:, 1::2])],
                     axis=2).reshape(w, -1)
    pos_y = np.stack([np.sin(pos_y[:, 0::2]), np.cos(pos_y[:, 1::2])],
                     axis=2).reshape(h, -1)
    pos = np.concatenate([
        np.repeat(pos_y[:, None, :], w, axis=1),
        np.repeat(pos_x[None, :, :], h, axis=0)], axis=-1)
    return pos.reshape(h * w, dim)


class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"layers_{i}",
                                 dtype=self.dtype)(x))
        return nn.Dense(self.out, name=f"layers_{self.layers - 1}",
                        dtype=self.dtype)(x)


class MHA(nn.Module):
    """torch nn.MultiheadAttention-compatible attention (packed qkv)."""
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        hd = self.dim // self.heads
        wq = nn.Dense(self.dim, name="q", dtype=self.dtype)
        wk = nn.Dense(self.dim, name="k", dtype=self.dtype)
        wv = nn.Dense(self.dim, name="v", dtype=self.dtype)
        qq = wq(q).reshape(q.shape[0], -1, self.heads, hd)
        kk = wk(k).reshape(k.shape[0], -1, self.heads, hd)
        vv = wv(v).reshape(v.shape[0], -1, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qq, kk,
                          preferred_element_type=jnp.float32)
        attn = attn / np.sqrt(hd)
        if mask is not None:
            attn = jnp.where(mask, attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1).astype(vv.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vv)
        out = out.reshape(q.shape[0], -1, self.dim)
        return nn.Dense(self.dim, name="out_proj", dtype=self.dtype)(out)


class BiMultiHeadAttention(nn.Module):
    """Bidirectional image↔text fusion (GLIP/GroundingDINO BiAttention).

    ``l_dim`` is the language output width: GroundingDINO fuses 256-d
    text (defaults to ``dim``); GLIP fuses raw 768-d BERT states, whose
    official out_l_proj maps embed→768 directly."""
    dim: int = HIDDEN
    heads: int = 4
    embed: int = 1024
    l_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis, lang, lang_mask):
        hd = self.embed // self.heads
        scale = hd ** -0.5
        q = nn.Dense(self.embed, name="v_proj", dtype=self.dtype)(vis) \
            * scale
        k = nn.Dense(self.embed, name="l_proj", dtype=self.dtype)(lang)
        vv = nn.Dense(self.embed, name="values_v_proj",
                      dtype=self.dtype)(vis)
        vl = nn.Dense(self.embed, name="values_l_proj",
                      dtype=self.dtype)(lang)
        b = vis.shape[0]
        sh = lambda t: t.reshape(b, -1, self.heads, hd)
        attn = jnp.einsum("bvhd,blhd->bhvl", sh(q), sh(k),
                          preferred_element_type=jnp.float32)
        # stability clamps (GLIP: clamp to ±50000)
        attn = jnp.clip(attn, -50000.0, 50000.0)
        attn_v = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn_v = jnp.where(lang_mask[:, None, None, :], attn_v, -1e9)
        attn_v = jax.nn.softmax(attn_v, axis=-1)
        attn_l = attn - jnp.max(attn, axis=-2, keepdims=True)
        attn_l = jax.nn.softmax(attn_l, axis=-2)
        out_v = jnp.einsum("bhvl,blhd->bvhd", attn_v.astype(vl.dtype),
                           sh(vl)).reshape(b, -1, self.embed)
        out_l = jnp.einsum("bhvl,bvhd->blhd", attn_l.astype(vv.dtype),
                           sh(vv)).reshape(b, -1, self.embed)
        out_v = nn.Dense(self.dim, name="out_v_proj",
                         dtype=self.dtype)(out_v)
        out_l = nn.Dense(self.l_dim or self.dim, name="out_l_proj",
                         dtype=self.dtype)(out_l)
        return out_v, out_l


class FusionLayer(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis, lang, lang_mask):
        ln_v = nn.LayerNorm(name="layer_norm_v", dtype=jnp.float32)
        ln_l = nn.LayerNorm(name="layer_norm_l", dtype=jnp.float32)
        gamma_v = self.param("gamma_v", nn.initializers.constant(1e-4),
                             (HIDDEN,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(1e-4),
                             (HIDDEN,))
        dv, dl = BiMultiHeadAttention(name="attn", dtype=self.dtype)(
            ln_v(vis).astype(vis.dtype), ln_l(lang).astype(lang.dtype),
            lang_mask)
        vis = vis + gamma_v.astype(vis.dtype) * dv
        lang = lang + gamma_l.astype(lang.dtype) * dl
        return vis, lang


class TextSelfAttnLayer(nn.Module):
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang, self_mask):
        h = MHA(HIDDEN, self.heads, name="self_attn",
                dtype=self.dtype)(lang, lang, lang, self_mask)
        lang = nn.LayerNorm(name="norm1", dtype=jnp.float32)(
            lang + h).astype(lang.dtype)
        f = nn.Dense(1024, name="linear1", dtype=self.dtype)(lang)
        f = nn.relu(f)
        f = nn.Dense(HIDDEN, name="linear2", dtype=self.dtype)(f)
        lang = nn.LayerNorm(name="norm2", dtype=jnp.float32)(
            lang + f).astype(lang.dtype)
        return lang


class ImageEncoderLayer(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 level_starts):
        h = MSDeformAttention(name="self_attn", dtype=self.dtype)(
            src + pos, reference_points, src, spatial_shapes, level_starts)
        src = nn.LayerNorm(name="norm1", dtype=jnp.float32)(
            src + h).astype(src.dtype)
        f = nn.Dense(2048, name="linear1", dtype=self.dtype)(src)
        f = nn.relu(f)
        f = nn.Dense(HIDDEN, name="linear2", dtype=self.dtype)(f)
        src = nn.LayerNorm(name="norm2", dtype=jnp.float32)(
            src + f).astype(src.dtype)
        return src


class DecoderLayer(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, text, text_mask,
                 reference_points, spatial_shapes, level_starts):
        # self attention
        q = tgt + query_pos
        h = MHA(HIDDEN, 8, name="self_attn", dtype=self.dtype)(q, q, tgt)
        tgt = nn.LayerNorm(name="norm2", dtype=jnp.float32)(
            tgt + h).astype(tgt.dtype)
        # text cross attention
        h = MHA(HIDDEN, 4, name="ca_text", dtype=self.dtype)(
            tgt + query_pos, text, text,
            text_mask[:, None, None, :])
        tgt = nn.LayerNorm(name="catext_norm", dtype=jnp.float32)(
            tgt + h).astype(tgt.dtype)
        # image (deformable) cross attention
        h = MSDeformAttention(name="cross_attn", dtype=self.dtype)(
            tgt + query_pos, reference_points, memory, spatial_shapes,
            level_starts)
        tgt = nn.LayerNorm(name="norm1", dtype=jnp.float32)(
            tgt + h).astype(tgt.dtype)
        f = nn.Dense(2048, name="linear1", dtype=self.dtype)(tgt)
        f = nn.relu(f)
        f = nn.Dense(HIDDEN, name="linear2", dtype=self.dtype)(f)
        tgt = nn.LayerNorm(name="norm3", dtype=jnp.float32)(
            tgt + f).astype(tgt.dtype)
        return tgt


def contrastive_logits(queries: jnp.ndarray, text: jnp.ndarray,
                       text_mask: jnp.ndarray) -> jnp.ndarray:
    """GroundingDINO ContrastiveEmbed: dot(queries, text) with masked
    tokens at -inf, padded to MAX_TEXT_LEN (no learned params)."""
    logits = jnp.einsum("bqd,btd->bqt", queries, text,
                        preferred_element_type=jnp.float32)
    return jnp.where(text_mask[:, None, :], logits, float("-inf"))


class GroundingDINO(nn.Module):
    variant: str = "swinB"
    num_queries: int = 900
    enc_layers: int = 6
    dec_layers: int = 6
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = SwinTransformer(self.variant, dtype=self.dtype)
        # input projections: 3 Swin levels + 1 extra stride-2
        self.input_proj_convs = [
            nn.Conv(HIDDEN, (1, 1), name=f"input_proj_{i}_conv",
                    dtype=self.dtype) for i in range(3)]
        self.input_proj_gns = [
            nn.GroupNorm(num_groups=32, name=f"input_proj_{i}_gn",
                         dtype=jnp.float32) for i in range(3)]
        self.extra_proj_conv = nn.Conv(HIDDEN, (3, 3), strides=(2, 2),
                                       name="input_proj_3_conv",
                                       dtype=self.dtype)
        self.extra_proj_gn = nn.GroupNorm(num_groups=32,
                                          name="input_proj_3_gn",
                                          dtype=jnp.float32)
        self.feat_map = nn.Dense(HIDDEN, name="feat_map",
                                 dtype=self.dtype)
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (4, HIDDEN))
        self.fusion_layers = [FusionLayer(name=f"fusion_{i}",
                                          dtype=self.dtype)
                              for i in range(self.enc_layers)]
        self.text_layers = [TextSelfAttnLayer(name=f"text_layer_{i}",
                                              dtype=self.dtype)
                            for i in range(self.enc_layers)]
        self.image_layers = [ImageEncoderLayer(name=f"enc_layer_{i}",
                                               dtype=self.dtype)
                             for i in range(self.enc_layers)]
        self.enc_output = nn.Dense(HIDDEN, name="enc_output",
                                   dtype=self.dtype)
        self.enc_output_norm = nn.LayerNorm(name="enc_output_norm",
                                            dtype=jnp.float32)
        self.enc_out_bbox_embed = MLP(HIDDEN, 4, name="enc_out_bbox_embed",
                                      dtype=self.dtype)
        self.tgt_embed = self.param("tgt_embed",
                                    nn.initializers.normal(1.0),
                                    (self.num_queries, HIDDEN))
        self.decoder_layers = [DecoderLayer(name=f"dec_layer_{i}",
                                            dtype=self.dtype)
                               for i in range(self.dec_layers)]
        self.decoder_norm = nn.LayerNorm(name="decoder_norm",
                                         dtype=jnp.float32)
        self.ref_point_head = MLP(HIDDEN, HIDDEN, layers=2,
                                  name="ref_point_head", dtype=self.dtype)
        self.bbox_embeds = [MLP(HIDDEN, 4, name=f"bbox_embed_{i}",
                                dtype=self.dtype)
                            for i in range(self.dec_layers)]

    def encode_text(self, bert_embeds: jnp.ndarray,
                    text_mask: jnp.ndarray) -> jnp.ndarray:
        """bert_embeds: (B, T, 768) last hidden states from the (external)
        flax BERT; projected to 256."""
        return self.feat_map(bert_embeds)

    def __call__(self, images: jnp.ndarray, bert_embeds: jnp.ndarray,
                 text_mask: jnp.ndarray,
                 text_self_mask: Optional[jnp.ndarray] = None):
        """images (B, H, W, 3) ImageNet-normalized; bert_embeds
        (B, T, 768); text_mask (B, T) valid-token mask; text_self_mask
        (B, 1, T, T) phrase-local self-attention mask.

        Returns (logits (B, nq, T), boxes (B, nq, 4) cxcywh normalized).
        """
        b = images.shape[0]
        feats = self.backbone(images)
        srcs = []
        shapes: List[Tuple[int, int]] = []
        for i, f in enumerate(feats):
            x = self.input_proj_gns[i](self.input_proj_convs[i](f))
            srcs.append(x.astype(self.dtype))
            shapes.append((x.shape[1], x.shape[2]))
        extra = self.extra_proj_gn(self.extra_proj_conv(feats[-1]))
        srcs.append(extra.astype(self.dtype))
        shapes.append((extra.shape[1], extra.shape[2]))

        level_starts = [0]
        for (h, w) in shapes[:-1]:
            level_starts.append(level_starts[-1] + h * w)

        flat = []
        pos_list = []
        for lvl, (x, (h, w)) in enumerate(zip(srcs, shapes)):
            flat.append(x.reshape(b, h * w, HIDDEN))
            pos = jnp.asarray(sine_position_embedding(h, w))
            pos_list.append(pos[None] + self.level_embed[lvl][None, None])
        src = jnp.concatenate(flat, axis=1)              # (B, ΣHW, 256)
        pos = jnp.concatenate(pos_list, axis=1).astype(src.dtype)

        # per-level normalized reference points for deformable self-attn
        refs = []
        for (h, w) in shapes:
            yy = (np.arange(h, dtype=np.float32) + 0.5) / h
            xx = (np.arange(w, dtype=np.float32) + 0.5) / w
            grid = np.stack(np.meshgrid(xx, yy, indexing="xy"),
                            axis=-1).reshape(-1, 2)
            refs.append(grid)
        ref_pts = jnp.asarray(np.concatenate(refs, axis=0))
        ref_pts = jnp.broadcast_to(ref_pts[None, :, None, :],
                                   (b, src.shape[1], 4, 2))

        lang = self.encode_text(bert_embeds, text_mask)
        if text_self_mask is None:
            text_self_mask = text_mask[:, None, None, :]

        # feature enhancer
        for i in range(self.enc_layers):
            src, lang = self.fusion_layers[i](src, lang, text_mask)
            lang = self.text_layers[i](lang, text_self_mask)
            src = self.image_layers[i](src, pos, ref_pts, shapes,
                                       level_starts)

        # language-guided query selection
        memory = self.enc_output_norm(self.enc_output(src)).astype(
            src.dtype)
        enc_logits = contrastive_logits(memory, lang, text_mask)
        topk_scores = jnp.max(enc_logits, axis=-1)       # (B, ΣHW)
        _, topk_idx = jax.lax.top_k(topk_scores, self.num_queries)

        # anchor boxes: grid point + level-scaled wh, refined by the
        # encoder bbox head (two-stage)
        base_wh = np.concatenate([
            np.full((h * w, 2), 0.05 * (2 ** lvl), np.float32)
            for lvl, (h, w) in enumerate(shapes)], axis=0)
        anchors = jnp.concatenate(
            [ref_pts[:, :, 0, :], jnp.broadcast_to(
                jnp.asarray(base_wh)[None], (b,) + base_wh.shape)],
            axis=-1)
        anchor_logits = inverse_sigmoid(anchors)
        delta = self.enc_out_bbox_embed(memory)
        enc_boxes = jax.nn.sigmoid(anchor_logits + delta)

        take = lambda t: jnp.take_along_axis(
            t, topk_idx[:, :, None], axis=1)
        ref_boxes = jax.lax.stop_gradient(take(enc_boxes))  # (B, nq, 4)

        tgt = jnp.broadcast_to(self.tgt_embed[None],
                               (b, self.num_queries, HIDDEN)).astype(
                                   src.dtype)

        for i, layer in enumerate(self.decoder_layers):
            query_sine = box_sine_embedding(ref_boxes)
            query_pos = self.ref_point_head(query_sine.astype(src.dtype))
            ref4 = jnp.broadcast_to(ref_boxes[:, :, None, :],
                                    (b, self.num_queries, 4, 4))
            tgt = layer(tgt, query_pos, src, lang, text_mask, ref4,
                        shapes, level_starts)
            delta = self.bbox_embeds[i](
                self.decoder_norm(tgt).astype(tgt.dtype))
            ref_boxes = jax.nn.sigmoid(
                inverse_sigmoid(ref_boxes) + delta.astype(jnp.float32))

        out = self.decoder_norm(tgt).astype(tgt.dtype)
        logits = contrastive_logits(out, lang, text_mask)
        return logits, ref_boxes


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def box_sine_embedding(boxes: jnp.ndarray, dim: int = 128) -> jnp.ndarray:
    """DAB-DETR sine embedding of (cx, cy, w, h) → (..., 4*dim) for the
    ref_point_head (GroundingDINO gen_sineembed_for_position with
    query_dim=4: concat(pos_y, pos_x, pos_w, pos_h), 128 dims each →
    the official MLP(512, 256, 256) head input)."""
    scale = 2 * np.pi
    dim_t = 10000.0 ** (2 * (np.arange(dim) // 2) / dim)
    def embed(v):
        p = v[..., None] * scale / dim_t
        return jnp.concatenate(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1)
    cx = embed(boxes[..., 0])
    cy = embed(boxes[..., 1])
    w = embed(boxes[..., 2])
    h = embed(boxes[..., 3])
    return jnp.concatenate([cy, cx, w, h], axis=-1)
