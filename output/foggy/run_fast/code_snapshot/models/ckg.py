"""CKG (Consistent Knowledge Generation) merge network.

Mirrors coin/modeling/merge/ckg.py:36-116: two 8-head cross-attentions —
query = region feature, key/value = class prototypes (offline / online) —
each emitting per-class weights; fused probs = softmax(w_off·p_off +
w_on·p_on).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class CrossAttention(nn.Module):
    hidden_size: int
    num_classes: int
    head_num: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
        """x: (N, D) region features; kv: (C, D) prototypes → (N, classes)
        per-class weights."""
        d = self.hidden_size
        hd = d // self.head_num
        q = nn.Dense(d, use_bias=False, name="linear_q")(x)
        k = nn.Dense(d, use_bias=False, name="linear_k")(kv)
        v = nn.Dense(d, use_bias=False, name="linear_v")(kv)
        q = q.reshape(-1, self.head_num, hd)
        k = k.reshape(-1, self.head_num, hd)
        v = v.reshape(-1, self.head_num, hd)
        attn = jnp.einsum("nhd,chd->hnc", q, k,
                          preferred_element_type=jnp.float32) / np.sqrt(hd)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("hnc,chd->nhd", attn.astype(v.dtype), v)
        out = out.reshape(-1, d)
        return nn.Dense(self.num_classes, name="linear_output")(out)


class CKGNet(nn.Module):
    hidden_size: int          # MODEL.MERGE_DIM (1024)
    num_classes: int          # foreground classes + 1 (background)
    head_num: int = 8

    @nn.compact
    def __call__(self, x, prototype_offline, prototype_online,
                 probs_offline, probs_online):
        w_off = CrossAttention(self.hidden_size, self.num_classes,
                               self.head_num, name="cross_offline")(
            x, prototype_offline)
        w_on = CrossAttention(self.hidden_size, self.num_classes,
                              self.head_num, name="cross_online")(
            x, prototype_online)
        fused = w_off * probs_offline + w_on * probs_online
        return nn.softmax(fused, axis=-1)
