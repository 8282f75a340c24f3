"""CLIP text tower with learnable prompt tokens.

Mirrors coin/modeling/text_encoder/clip_text.py: a frozen CLIP text
transformer; the *learnable* prompt path builds, per class,

    [SOS] [tmpl tokens ("a photo of a", trainable embeds)]
    [K learnable X tokens] [class token embed] [EOS + pads]

and runs the frozen transformer over it; features are taken at the EOT
position and projected (clip_text.py:165-205). The zero-prompt path (frozen
per-class prototypes = mean text feature over the 81 style templates,
clip_text.py:262-279) is *precomputed at setup time* into plain arrays that
live in TrainState (per_class_feat / prototype_b_online / prototype_b_offline)
— prototypes are mutable training state, not module parameters, in this
functional design.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, L, D)
        h = nn.LayerNorm(name="ln_1", dtype=jnp.float32)(x).astype(x.dtype)
        h = nn.SelfAttention(
            num_heads=self.heads, qkv_features=self.width,
            use_bias=True, name="attn", dtype=self.dtype,
        )(h, mask=nn.make_causal_mask(x[..., 0]) if self.causal else None)
        x = x + h
        h = nn.LayerNorm(name="ln_2", dtype=jnp.float32)(x).astype(x.dtype)
        h = nn.Dense(self.width * 4, name="mlp_c_fc", dtype=self.dtype)(h)
        h = QuickGELU()(h)
        h = nn.Dense(self.width, name="mlp_c_proj", dtype=self.dtype)(h)
        return x + h


class TextTransformer(nn.Module):
    """The frozen CLIP text transformer trunk (token embeds in, pooled
    projected features out)."""
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        self.token_embedding = nn.Embed(self.vocab_size, self.width,
                                        name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width))
        self.blocks = [ResidualAttentionBlock(self.width, self.heads,
                                              dtype=self.dtype,
                                              name=f"resblock_{i}")
                       for i in range(self.layers)]
        self.ln_final = nn.LayerNorm(name="ln_final", dtype=jnp.float32)
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))

    def encode_embeds(self, x: jnp.ndarray,
                      eot_index: jnp.ndarray) -> jnp.ndarray:
        """Run the trunk on pre-built token embeddings.

        x: (N, L, width); eot_index: (N,) position of the EOT token.
        Returns L2-normalized (N, embed_dim).
        """
        x = x + self.positional_embedding[None].astype(x.dtype)
        for blk in self.blocks:
            x = blk(x)
        x = self.ln_final(x).astype(x.dtype)
        pooled = jnp.take_along_axis(
            x, eot_index[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        feats = pooled @ self.text_projection.astype(pooled.dtype)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Encode integer token sequences (N, L); EOT = argmax token id
        (CLIP convention, clip_text.py:199)."""
        x = self.token_embedding(tokens)
        return self.encode_embeds(x, jnp.argmax(tokens, axis=-1))


class PromptedTextEncoder(nn.Module):
    """Learnable-prompt classifier head (TEXT_ENCODER.forward(add=True),
    clip_text.py:165-205).

    Parameters `embedding_tmp` (template token embeds, trainable) and
    `add_in_embedding` (K learnable context tokens) are the only trainable
    leaves; the trunk + sos/class/eos embeds are frozen.

    ``class_tokens`` is the tokenized "a photo of a X..X {cls}." prompt per
    class — static, supplied at construction.
    """
    trunk: TextTransformer
    num_classes: int           # including background
    prompt_tmp_len: int = 4    # "a photo of a"
    add_prompt_num: int = 4

    @nn.compact
    def __call__(self, class_token_embeds: jnp.ndarray,
                 eot_index: jnp.ndarray) -> jnp.ndarray:
        """class_token_embeds: (C, L, width) frozen token embeddings of the
        full prompts (computed once at init from the tokenizer); the
        trainable template/context slices are overwritten in-place here.
        Returns (C, embed_dim) normalized text features.
        """
        c, l, w = class_token_embeds.shape
        tmp = self.param("embedding_tmp", nn.initializers.normal(0.02),
                         (self.prompt_tmp_len, w))
        ctx = self.param("add_in_embedding", nn.initializers.normal(0.02),
                         (self.add_prompt_num, w))
        x = class_token_embeds
        x = jax.lax.dynamic_update_slice(
            x, jnp.broadcast_to(tmp[None], (c,) + tmp.shape).astype(x.dtype),
            (0, 1, 0))
        x = jax.lax.dynamic_update_slice(
            x, jnp.broadcast_to(ctx[None], (c,) + ctx.shape).astype(x.dtype),
            (0, 1 + self.prompt_tmp_len, 0))
        return self.trunk.encode_embeds(x, eot_index)
