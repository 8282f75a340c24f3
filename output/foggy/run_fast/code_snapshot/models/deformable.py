"""Multi-scale deformable attention (Deformable-DETR style), XLA-native.

The reference's GDINO teacher consumes a CUDA kernel for this op (SURVEY
§2.9). Here sampling is expressed as vectorized bilinear gathers over the
flattened multi-level value tensor: for each (query, head, level, point)
the four corner taps become one `jnp.take` over rows of (ΣHW, H·D) plus
tent-weight blending — no scatter, static shapes, batched over everything.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def ms_deform_sample(values: jnp.ndarray, spatial_shapes: Sequence[
        Tuple[int, int]], level_starts: Sequence[int],
        locations: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """values: (B, ΣHW, H, D); locations: (B, Q, H, L, P, 2) normalized
    [0,1] (x, y) per level; weights: (B, Q, H, L, P) softmaxed.
    Returns (B, Q, H, D).
    """
    b, total, heads, d = values.shape
    _, q, _, L, P, _ = locations.shape

    out = jnp.zeros((b, q, heads, d), values.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        start = level_starts[lvl]
        loc = locations[:, :, :, lvl]                  # (B, Q, H, P, 2)
        # align_corners=False convention: x_px = x*W - 0.5
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        values_h_first = values.transpose(0, 2, 1, 3)   # (B, H, ΣHW, D)

        def tap(yy, xx, wgt):
            inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            yy = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xx = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            flat = start + yy * w + xx                  # (B, Q, H, P)
            idx = flat.transpose(0, 2, 1, 3).reshape(b, heads, q * P, 1)
            v = jnp.take_along_axis(values_h_first, idx, axis=2)
            v = v.reshape(b, heads, q, P, d).transpose(0, 2, 1, 3, 4)
            w_in = jnp.where(inside, wgt, 0.0)
            return v * w_in[..., None].astype(v.dtype)

        acc = (tap(y0, x0, (1 - fy) * (1 - fx))
               + tap(y0, x0 + 1, (1 - fy) * fx)
               + tap(y0 + 1, x0, fy * (1 - fx))
               + tap(y0 + 1, x0 + 1, fy * fx))
        lvl_w = weights[:, :, :, lvl]                  # (B, Q, H, P)
        out = out + jnp.sum(acc * lvl_w[..., None].astype(acc.dtype),
                            axis=3)
    return out


class MSDeformAttention(nn.Module):
    """Deformable attention module (query → sampled value aggregation)."""
    dim: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, reference_points: jnp.ndarray,
                 value: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 level_starts: Sequence[int],
                 value_mask: jnp.ndarray = None) -> jnp.ndarray:
        """query (B, Q, C); reference_points (B, Q, L, 2) or (B, Q, L, 4)
        normalized; value (B, ΣHW, C)."""
        b, q, c = query.shape
        hd = self.dim // self.heads
        L, P = self.levels, self.points

        v = nn.Dense(self.dim, name="value_proj", dtype=self.dtype)(value)
        if value_mask is not None:
            v = jnp.where(value_mask[..., None], v, 0.0)
        v = v.reshape(b, -1, self.heads, hd)

        offsets = nn.Dense(self.heads * L * P * 2, name="sampling_offsets",
                           dtype=self.dtype,
                           kernel_init=nn.initializers.zeros)(query)
        offsets = offsets.reshape(b, q, self.heads, L, P, 2)
        attn = nn.Dense(self.heads * L * P, name="attention_weights",
                        dtype=self.dtype)(query)
        attn = jax.nn.softmax(
            attn.reshape(b, q, self.heads, L * P).astype(jnp.float32),
            axis=-1).reshape(b, q, self.heads, L, P)

        shapes_wh = jnp.asarray([[w, h] for (h, w) in spatial_shapes],
                                jnp.float32)              # (L, 2) = (w, h)
        if reference_points.shape[-1] == 2:
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets.astype(jnp.float32)
                   / shapes_wh[None, None, None, :, None, :])
        else:
            ref = reference_points
            center = ref[..., :2]
            wh = ref[..., 2:]
            loc = (center[:, :, None, :, None, :]
                   + offsets.astype(jnp.float32) / P
                   * wh[:, :, None, :, None, :] * 0.5)
        sampled = ms_deform_sample(v, spatial_shapes, level_starts, loc,
                                   attn)
        sampled = sampled.reshape(b, q, self.dim)
        return nn.Dense(self.dim, name="output_proj",
                        dtype=self.dtype)(sampled)
