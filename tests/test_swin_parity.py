"""Numerical parity of the Swin backbone + converter against a torch
replica of the official Swin architecture (random weights)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from coin_tpu.models.convert_gdino import convert_swin
from coin_tpu.models.swin import SwinTransformer


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(win, ws, h, w):
    b = win.shape[0] // (h * w // ws // ws)
    x = win.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class TWinAttn(tnn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.dim, self.ws, self.heads = dim, ws, heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij")).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0) + ws - 1
        idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
        self.register_buffer("rpi", idx)

    def forward(self, x, mask=None):
        bn, n, c = x.shape
        qkv = self.qkv(x).reshape(bn, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rpi.view(-1)]
        bias = bias.view(n, n, self.heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bn // nw, nw, self.heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(bn, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(bn, n, c)
        return self.proj(x)


class TBlock(tnn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.dim, self.ws, self.shift = dim, ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TWinAttn(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("fc1", tnn.Linear(dim, dim * 4))
        self.mlp.add_module("fc2", tnn.Linear(dim * 4, dim))

    def forward(self, x, h, w):
        b, l, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            img_mask = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                       slice(-self.shift, None)):
                for ws_ in (slice(0, -self.ws),
                            slice(-self.ws, -self.shift),
                            slice(-self.shift, None)):
                    img_mask[:, hs, ws_, :] = cnt
                    cnt += 1
            mw = window_partition(img_mask, self.ws).squeeze(-1)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -1e9).masked_fill(
                mask == 0, 0.0)
        else:
            mask = None
        xw = window_partition(x, self.ws)
        xw = self.attn(xw, mask)
        x = window_reverse(xw, self.ws, h, w)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(b, l, c)
        h2 = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + h2


class TDownsample(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(4 * dim)

    def forward(self, x, h, w):
        b, l, c = x.shape
        x = x.view(b, h, w, c)
        if h % 2 or w % 2:  # official Swin pads odd dims
            x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = x.view(b, -1, 4 * c)
        return self.reduction(self.norm(x))


class TSwin(tnn.Module):
    """Swin-T geometry: depths (2,2,6,2), heads (3,6,12,24), window 7."""

    def __init__(self, dim=96, window=7):
        super().__init__()
        self.window = window

        class PatchEmbed(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Conv2d(3, dim, 4, 4)
                self.norm = tnn.LayerNorm(dim)
        self.patch_embed = PatchEmbed()
        depths = (2, 2, 6, 2)
        heads = (3, 6, 12, 24)
        self.layers = tnn.ModuleList()
        for s, depth in enumerate(depths):
            stage = tnn.Module()
            stage.blocks = tnn.ModuleList([
                TBlock(dim * 2 ** s, heads[s], window,
                       0 if i % 2 == 0 else window // 2)
                for i in range(depth)])
            if s < 3:
                stage.downsample = TDownsample(dim * 2 ** s)
            self.layers.append(stage)
        self.norm1 = tnn.LayerNorm(dim * 2)
        self.norm2 = tnn.LayerNorm(dim * 4)
        self.norm3 = tnn.LayerNorm(dim * 8)

    def forward(self, x):
        x = self.patch_embed.proj(x)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = []
        for s, stage in enumerate(self.layers):
            # pad to window multiples
            ph = (-h) % self.window
            pw = (-w) % self.window
            sdim = x.shape[-1]
            if ph or pw:
                xi = x.view(b, h, w, sdim)
                xi = F.pad(xi, (0, 0, 0, pw, 0, ph))
                hp, wp = h + ph, w + pw
                xi = xi.view(b, hp * wp, sdim)
            else:
                xi, hp, wp = x, h, w
            for blk in stage.blocks:
                xi = blk(xi, hp, wp)
            if ph or pw:
                xi = xi.view(b, hp, wp, sdim)[:, :h, :w].reshape(
                    b, h * w, sdim)
            x = xi
            if s in (1, 2, 3):
                norm = getattr(self, f"norm{s}")
                outs.append(norm(x).view(b, h, w, sdim))
            if s < 3:
                x = stage.downsample(x, h, w)
                h, w = (h + 1) // 2, (w + 1) // 2
        return outs


def test_swin_parity(rng):
    torch.manual_seed(3)
    model = TSwin().eval()
    x = rng.randn(1, 3, 56, 84).astype(np.float32)
    with torch.no_grad():
        refs = model(torch.tensor(x))

    sd = {f"backbone.0.{k}": v.numpy()
          for k, v in model.state_dict().items()}
    # rename torch module layout → official checkpoint layout
    renamed = {}
    for k, v in sd.items():
        k = k.replace(".rpi", ".relative_position_index")
        renamed[k] = v
    params = convert_swin(renamed, depths=(2, 2, 6, 2))

    jmodel = SwinTransformer("swinT")
    outs = jmodel.apply({"params": jax.tree.map(jnp.asarray, params)},
                        jnp.asarray(x.transpose(0, 2, 3, 1)))
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   rtol=2e-3, atol=2e-3)
