"""Swin Transformer backbone (for the Grounding-DINO / GLIP cloud
teachers; replaces the torch Swin towers the reference consumes from
external packages — SURVEY §2.9).

TPU-first: window partition is pure reshape/transpose on padded static
shapes; (shifted-)window attention is batched einsum over all windows at
once; relative position bias is a table lookup precomputed at trace time.
Weight layout matches the official Swin checkpoints so GDINO/GLIP torch
weights map mechanically (see models/convert_gdino.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SWIN_CFGS = {
    "swinT": dict(embed_dim=96, depths=(2, 2, 6, 2),
                  num_heads=(3, 6, 12, 24), window=7),
    "swinB": dict(embed_dim=128, depths=(2, 2, 18, 2),
                  num_heads=(4, 8, 16, 32), window=12),
    "swinL": dict(embed_dim=192, depths=(2, 2, 18, 2),
                  num_heads=(6, 12, 24, 48), window=12),
}


def _rel_pos_index(window: int) -> np.ndarray:
    """(w², w²) index into the (2w−1)² relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]       # (2, w², w²)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Cross-window attention mask for shifted windows: (nW, w², w²) with
    -inf where tokens come from different original windows."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    slices = [slice(0, -window), slice(-window, -shift),
              slice(-shift, None)]
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -1e9, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B·nW, w², C); mask: (nW, w², w²) or None
        bn, n, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(bn, n, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / np.sqrt(hd)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads))
        idx = jnp.asarray(_rel_pos_index(self.window)).reshape(-1)
        bias = jnp.take(table, idx, axis=0).reshape(n, n, self.heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bn // nw, nw, self.heads, n, n) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bn, self.heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bn, n,
                                                             self.dim)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int):
        # x: (B, H·W, C); H, W already padded to multiples of window
        b, l, c = x.shape
        win = self.window
        shortcut = x
        x = nn.LayerNorm(name="norm1", dtype=jnp.float32)(x).astype(
            x.dtype)
        x = x.reshape(b, h, w, c)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_attn_mask(h, w, win, self.shift))
        else:
            mask = None
        xw = x.reshape(b, h // win, win, w // win, win, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        xw = WindowAttention(self.dim, self.heads, win, name="attn",
                             dtype=self.dtype)(xw, mask)
        x = xw.reshape(b, h // win, w // win, win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x.reshape(b, l, c)

        y = nn.LayerNorm(name="norm2", dtype=jnp.float32)(x).astype(
            x.dtype)
        y = nn.Dense(self.dim * 4, name="mlp_fc1", dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype)(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        # official Swin pads odd spatial dims before merging
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        # official Swin concat order: (0::2,0::2),(1::2,0::2),(0::2,1::2),
        # (1::2,1::2)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, ((h + 1) // 2) * ((w + 1) // 2), 4 * c)
        x = nn.LayerNorm(name="norm", dtype=jnp.float32)(x).astype(x.dtype)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction",
                        dtype=self.dtype)(x)


class SwinTransformer(nn.Module):
    """Returns features of stages 1..3 (strides 8/16/32), NHWC — the levels
    GDINO consumes (out_indices=(1, 2, 3))."""
    variant: str = "swinB"
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        cfg = SWIN_CFGS[self.variant]
        dim = cfg["embed_dim"]
        win = cfg["window"]
        b, ih, iw, _ = images.shape
        assert ih % 4 == 0 and iw % 4 == 0
        x = nn.Conv(dim, (4, 4), strides=(4, 4), name="patch_embed_proj",
                    dtype=self.dtype)(images.astype(self.dtype))
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, dim)
        x = nn.LayerNorm(name="patch_embed_norm",
                         dtype=jnp.float32)(x).astype(x.dtype)

        outs = []
        for stage, depth in enumerate(cfg["depths"]):
            sdim = dim * (2 ** stage)
            heads = cfg["num_heads"][stage]
            # pad to window multiples for this stage
            ph = (-h) % win
            pw = (-w) % win
            if ph or pw:
                x = x.reshape(b, h, w, sdim)
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                hp, wp = h + ph, w + pw
                x = x.reshape(b, hp * wp, sdim)
            else:
                hp, wp = h, w
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else win // 2
                x = SwinBlock(sdim, heads, win, shift,
                              name=f"layers_{stage}_blocks_{blk}",
                              dtype=self.dtype)(x, hp, wp)
            # crop padding back
            if ph or pw:
                x = x.reshape(b, hp, wp, sdim)[:, :h, :w].reshape(
                    b, h * w, sdim)
            if stage in self.out_indices:
                out = nn.LayerNorm(name=f"out_norm_{stage}",
                                   dtype=jnp.float32)(x)
                outs.append(out.reshape(b, h, w, sdim).astype(x.dtype))
            if stage < len(cfg["depths"]) - 1:
                x = PatchMerging(sdim, name=f"layers_{stage}_downsample",
                                 dtype=self.dtype)(x, h, w)
                h, w = (h + 1) // 2, (w + 1) // 2
        return outs
