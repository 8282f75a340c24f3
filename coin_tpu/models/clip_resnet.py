"""CLIP ModifiedResNet backbone, TPU-native (NHWC, bf16-friendly).

Semantics mirror the reference CLIP-ResNet used by COIN
(coin/modeling/utils.py:26-292): 3-conv stem with a trailing 2x2 avg-pool,
anti-aliased strides (AvgPool before every stride-2 conv), frozen
BatchNorm everywhere (inference statistics — detection batches are tiny),
C4 layout: the backbone emits res4; layer4 (res5) is applied inside the ROI
heads on pooled features; AttentionPool2d is the final CLIP pooling.

Weight compatibility: parameter naming matches OpenAI CLIP's state dict
closely enough that `coin_tpu.models.convert.load_clip_visual` can map a
CLIP checkpoint into this pytree mechanically.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# channel/stride tables per depth (coin/modeling/utils.py:190-207)
DEPTH_CFG = {
    50: dict(layers=(3, 4, 6, 3), width=64, heads=32, out_dim=1024),
    101: dict(layers=(3, 4, 23, 3), width=64, heads=32, out_dim=512),
    200: dict(layers=(4, 6, 10, 6), width=80, heads=40, out_dim=640),  # RN50x4
    # RN50x16 (reference depth-800 row, coin/modeling/utils.py:202-207:
    # res2..res4 channels 384/768/1536 = width 96 × expansion)
    800: dict(layers=(6, 8, 18, 8), width=96, heads=48, out_dim=768),
}


class FrozenBN(nn.Module):
    """BatchNorm with frozen statistics: y = (x-mean)·γ/√(var+ε)+β.

    All four tensors are stored as parameters so CLIP weights can be loaded
    verbatim; none of them is ever trained (frozen via the solver's param
    partitioning).
    """
    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros,
                          (self.features,))
        var = self.param("running_var", nn.initializers.ones,
                         (self.features,))
        mul = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(
            self.dtype)
        return x * mul + add


class Int8Conv(nn.Module):
    """Dynamic-int8 convolution for the inference/serving path.

    Per-output-channel symmetric int8 weights + per-tensor dynamic
    symmetric int8 activations, int32 MXU accumulation. The v5e int8 MXU
    runs the hot conv shapes at ~1.8x the bf16 rate (tools/bench_int8.py,
    BENCH.md) — a pure serving-throughput lever; training always uses the
    bf16/f32 path. Parameter name ('kernel'), shape (HWIO) and init match
    nn.Conv exactly, so trained checkpoints load unchanged.
    """
    features: int
    kernel: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features))
        ks = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.round(w / ks).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        out = jax.lax.conv_general_dilated(
            xq, wq, (self.stride, self.stride),
            [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (out.astype(jnp.float32) * (xs * ks)).astype(self.dtype)


class Int8TrainConv(nn.Module):
    """Dynamic-int8 conv for the TRAINING path (TPU.INT8_TRAIN): int8
    forward + int8 input-gradient (+ optional int8 weight-gradient) via
    ops.qconv.int8_train_conv. Parameter name/shape/init match nn.Conv
    so checkpoints load unchanged. A semantic knob — ships only with a
    fixture-v3 A/B artifact (BENCH.md)."""
    features: int
    kernel: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    wgrad_int8: bool = True
    per_sample: bool = False
    dgrad_int8: bool = True

    @nn.compact
    def __call__(self, x):
        from coin_tpu.ops.qconv import int8_train_conv
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features))
        out = int8_train_conv(x, w, self.stride, self.wgrad_int8,
                              self.per_sample, self.dgrad_int8)
        return out.astype(self.dtype)


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32,
          quant=False, qt=0):
    # qt is the int8-TRAINING mode (threaded from
    # detector.quant_train_res5): 0 = off, 1 = full int8
    # (fwd+dgrad+wgrad), 2 = wgrad-exact (int8 fwd+dgrad, the
    # optimizer sees the plain conv's weight gradient bit-exactly —
    # the fallback when the full-int8 A/B shows an AP cost), 3 =
    # per-sample activation/gradient scales + exact wgrad
    # (TPU.INT8_TRAIN_SCALE: sample — the finer-forward-quantization
    # lever staged by the int8train_wx A/B attribution, BENCH.md),
    # 4 = int8 per-sample FORWARD only, exact dgrad+wgrad
    # (TPU.INT8_TRAIN_DGRAD: false — the most conservative probe)
    if qt:
        return Int8TrainConv(features, kernel, stride, name=name,
                             dtype=dtype,
                             wgrad_int8=(int(qt) == 1),
                             per_sample=(int(qt) in (3, 4)),
                             dgrad_int8=(int(qt) != 4))
    if quant:
        return Int8Conv(features, kernel, stride, name=name,
                        dtype=dtype)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
                   name=name, dtype=dtype)


def _avgpool2(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """CLIP bottleneck: 1x1 → 3x3 → (avgpool if stride>1) → 1x1·4; the
    downsample path is avgpool → 1x1 conv (anti-aliased stride,
    coin/modeling/utils.py:26-90)."""
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    quant: bool = False
    qt: int = 0          # int8-train mode: 0 off, 1 full, 2 wgrad-exact

    @nn.compact
    def __call__(self, x):
        out = _conv(self.planes, 1, name="conv1", dtype=self.dtype,
                    quant=self.quant, qt=self.qt)(x)
        out = nn.relu(FrozenBN(self.planes, name="bn1",
                               dtype=self.dtype)(out))
        out = _conv(self.planes, 3, name="conv2", dtype=self.dtype,
                    quant=self.quant, qt=self.qt)(out)
        out = nn.relu(FrozenBN(self.planes, name="bn2",
                               dtype=self.dtype)(out))
        if self.stride > 1:
            out = _avgpool2(out, self.stride)
        out = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype,
                    quant=self.quant, qt=self.qt)(out)
        out = FrozenBN(self.planes * 4, name="bn3", dtype=self.dtype)(out)

        if self.stride > 1 or x.shape[-1] != self.planes * 4:
            identity = _avgpool2(x, self.stride) if self.stride > 1 else x
            identity = _conv(self.planes * 4, 1, name="downsample_conv",
                             dtype=self.dtype, quant=self.quant,
                             qt=self.qt)(identity)
            identity = FrozenBN(self.planes * 4, name="downsample_bn",
                                dtype=self.dtype)(identity)
        else:
            identity = x
        return nn.relu(out + identity)


class _ScanBody(nn.Module):
    """nn.scan adapter: one identity bottleneck as (carry, _) -> (carry,)."""
    planes: int
    dtype: Dtype = jnp.float32
    quant: bool = False
    qt: int = 0          # int8-train mode: 0 off, 1 full, 2 wgrad-exact

    @nn.compact
    def __call__(self, x, _):
        return Bottleneck(self.planes, 1, name="block", dtype=self.dtype,
                          quant=self.quant, qt=self.qt)(x), None


class ResStage(nn.Module):
    """``scan=True`` rolls the identical identity blocks into one
    ``lax.scan`` over stacked params — same math, one conv program in
    the executable instead of N-1 copies (XLA While loop). Cuts HLO
    program size / compile time for the deep stages (res3 has 18-36
    blocks in RN50/101); default off so param trees (and checkpoint /
    converter layouts) stay per-block. ``stack_stage_params`` converts
    an unrolled stage tree to the scan layout."""
    planes: int
    blocks: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    scan: bool = False
    quant: bool = False
    qt: int = 0          # int8-train mode: 0 off, 1 full, 2 wgrad-exact

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(self.planes, self.stride, name="0",
                       dtype=self.dtype, quant=self.quant, qt=self.qt)(x)
        if self.scan and self.blocks > 1:
            x, _ = nn.scan(
                _ScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.blocks - 1,
            )(self.planes, dtype=self.dtype, quant=self.quant,
              qt=self.qt, name="scan")(x, None)
            return x
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, name=str(i), dtype=self.dtype,
                           quant=self.quant, qt=self.qt)(x)
        return x


def stack_stage_params(stage: dict, blocks: int) -> dict:
    """Unrolled ResStage params {'0': ..., '1': ..., ...} → scan layout
    {'0': ..., 'scan': {'block': stacked}} (leading axis = blocks-1)."""
    import jax
    import jax.numpy as jnp
    rest = [stage[str(i)] for i in range(1, blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *rest)
    return {"0": stage["0"], "scan": {"block": stacked}}


class CLIPResNetBackbone(nn.Module):
    """Stem + layer1..layer3 → res4 feature (stride 16, C4 detection
    layout). Input NHWC, already normalized with CLIP statistics."""
    depth: int = 50
    dtype: Dtype = jnp.float32
    scan: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = DEPTH_CFG[self.depth]
        w = cfg["width"]
        q = self.quant
        x = x.astype(self.dtype)
        x = _conv(w // 2, 3, 2, name="conv1", dtype=self.dtype, quant=q)(x)
        x = nn.relu(FrozenBN(w // 2, name="bn1", dtype=self.dtype)(x))
        x = _conv(w // 2, 3, name="conv2", dtype=self.dtype, quant=q)(x)
        x = nn.relu(FrozenBN(w // 2, name="bn2", dtype=self.dtype)(x))
        x = _conv(w, 3, name="conv3", dtype=self.dtype, quant=q)(x)
        x = nn.relu(FrozenBN(w, name="bn3", dtype=self.dtype)(x))
        x = _avgpool2(x, 2)
        x = ResStage(w, cfg["layers"][0], name="layer1", dtype=self.dtype,
                     scan=self.scan, quant=q)(x)
        x = ResStage(w * 2, cfg["layers"][1], 2, name="layer2",
                     dtype=self.dtype, scan=self.scan, quant=q)(x)
        x = ResStage(w * 4, cfg["layers"][2], 2, name="layer3",
                     dtype=self.dtype, scan=self.scan, quant=q)(x)
        return x  # res4: stride 16, channels width*16


class Res5Head(nn.Module):
    """layer4 — applied to RoIAligned features inside the ROI heads (C4
    pattern; reference applies backbone.layer4 in _shared_roi_transform,
    coin/modeling/roi_heads/clip_roi_heads.py:172-176)."""
    depth: int = 50
    dtype: Dtype = jnp.float32
    scan: bool = False
    quant: bool = False
    qt: int = 0          # int8-train mode: 0 off, 1 full, 2 wgrad-exact

    @nn.compact
    def __call__(self, x):
        cfg = DEPTH_CFG[self.depth]
        return ResStage(cfg["width"] * 8, cfg["layers"][3], 2, name="layer4",
                        dtype=self.dtype, scan=self.scan,
                        quant=self.quant, qt=self.qt)(x)


class AttentionPool2d(nn.Module):
    """CLIP attention pooling (coin/modeling/utils.py:93-126): prepend the
    spatial mean token, add positional embedding, one cross-attention step
    with the mean token as the single query."""
    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int = 7

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, C)
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (N, HW+1, C)

        pos = self.param("positional_embedding",
                         nn.initializers.normal(1.0 / c ** 0.5),
                         (self.spacial_dim ** 2 + 1, c))
        if h * w != self.spacial_dim ** 2:
            # interpolate the spatial part of the positional embedding
            side = self.spacial_dim
            spatial = pos[1:].reshape(side, side, c)
            spatial = jax.image.resize(spatial, (h, w, c), method="bilinear")
            pos = jnp.concatenate([pos[:1], spatial.reshape(h * w, c)],
                                  axis=0)
        tokens = tokens + pos[None].astype(tokens.dtype)

        dense = lambda d, nm: nn.Dense(d, name=nm)
        q = dense(self.embed_dim, "q_proj")(tokens[:, :1])
        k = dense(self.embed_dim, "k_proj")(tokens)
        v = dense(self.embed_dim, "v_proj")(tokens)

        hd = self.embed_dim // self.num_heads
        split = lambda t: t.reshape(n, -1, self.num_heads, hd)
        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = jnp.astype(attn, jnp.float32) / np.sqrt(hd)
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v)
        out = out.reshape(n, 1, self.embed_dim)[:, 0]
        return nn.Dense(self.output_dim, name="c_proj")(out)
