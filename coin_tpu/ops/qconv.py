"""Dynamic-int8 convolution with quantized backward — the int8
TRAINING-compute lever (``TPU.INT8_TRAIN``).

The serving path (clip_resnet.Int8Conv) quantizes only the forward.
Training needs gradients, so this module provides ``int8_train_conv``,
a ``jax.custom_vjp`` convolution where

  - **forward**: per-tensor (or per-SAMPLE, ``per_sample`` — one scale
    per ROI crop) dynamic int8 activations × per-OUTPUT-channel
    int8 weights, int32 MXU accumulation (same numerics as Int8Conv);
  - **input gradient (dgrad)**: per-tensor dynamic int8 incoming
    gradient × per-INPUT-channel requantized int8 weights (the
    transposed kernel's non-contracted dim — per-channel scales must
    ride a dim the int32 accumulation does not sum over), int32 MXU;
  - **weight gradient (wgrad)**: EXACT in the operands' dtype by
    default (the optimizer sees the gradient the bf16 conv would
    produce), or int8 per-tensor × per-tensor under ``wgrad_int8``.

Gradients are straight-through w.r.t. the quantization rounding: the
backward treats ``y = conv(x, w)`` as exact (the standard int8-training
recipe — quantize fwd/dgrad, keep or quantize wgrad).

Why this exists: BENCH.md's bf16 FLOP-ceiling arithmetic shows the
exact-parity recipe cannot reach the 5× throughput target at bf16 even
at 100% MXU; the v5e int8 MXU peak is 2× bf16 (measured 1.8× at the
production res5 shapes, tools/bench_int8.py). int8 student compute is
a SEMANTIC knob: it ships only with a fixture-v3 A/B artifact
(tools/validate_cached_teacher.py --mode int8train). Reference bar:
the fp16 AMP training path, coin/engine/trainer.py:175-209 (GradScaler
+ autocast) — the reference's own reduced-precision training lever.

Only stride-1 'same' convolutions take the int8 dgrad/wgrad paths
(every conv in the CLIP ResNet stages is stride 1 — striding is
anti-aliased through avg_pool); other geometries fall back to the
exact formulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _per_tensor_scale(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(jnp.max(jnp.abs(a)), 1e-12) / 127.0


def _quant(a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)


def _conv_i8(lhs, rhs, strides, pad, dn=_DN):
    return lax.conv_general_dilated(
        lhs, rhs, strides, pad, dimension_numbers=dn,
        preferred_element_type=jnp.int32)


def _quantize_x(x: jnp.ndarray, per_sample: bool = False):
    """Dynamic int8 quantization of an NHWC activation/gradient.

    ``per_sample``: one scale per batch element — shape (N,1,1,1) —
    instead of one per tensor. In res5 the batch dim is the ROI-crop
    dim (~512 crops/step), so per-tensor scales let a single outlier
    crop set the quantization step for every crop; per-sample scales
    factor EXACTLY out of the conv contraction (batch is never a
    contracted dim in fwd/dgrad), so the finer granularity costs no
    extra approximation — only a per-sample max reduction."""
    xf = x.astype(jnp.float32)
    if per_sample:
        xs = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True),
            1e-12) / 127.0
    else:
        xs = _per_tensor_scale(xf)
    return _quant(xf, xs), xs


def _fwd_parts(x: jnp.ndarray, w: jnp.ndarray, stride: int,
               per_sample: bool = False):
    """Quantized forward; returns (value_f32, xq, xs) so the backward
    can reuse the quantized activations (int8 residuals: half the HBM
    of the bf16 activations, and no re-quantization pass in bwd)."""
    k = w.shape[0]
    p = k // 2
    xq, xs = _quantize_x(x, per_sample)
    wf = w.astype(jnp.float32)
    ks = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.round(wf / ks).astype(jnp.int8)
    out = _conv_i8(xq, wq, (stride, stride), [(p, p)] * 2)
    # xs broadcasts (N,1,1,1) or scalar; ks rides the O dim — both are
    # non-contracted dims of the int32 accumulation, so the rescale is
    # exact w.r.t. the quantized integers
    return out.astype(jnp.float32) * (xs * ks), xq, xs


def _fwd_value(x: jnp.ndarray, w: jnp.ndarray, stride: int,
               per_sample: bool = False) -> jnp.ndarray:
    return _fwd_parts(x, w, stride, per_sample)[0]


def _exact_dgrad(x, w, g, stride: int, p: int):
    """Transpose of the conv w.r.t. x, at the operands' dtype.

    The whole linear function runs in ``x.dtype`` (cotangent included):
    a conv primitive requires matching operand dtypes, so a float32
    cotangent against bf16 activations would fail to lower — and the
    plain bf16 conv's own dgrad IS the bf16×bf16 transpose conv."""
    def f(x_):
        return lax.conv_general_dilated(
            x_, w.astype(x.dtype), (stride, stride), [(p, p)] * 2,
            dimension_numbers=_DN)
    (dx,) = jax.linear_transpose(f, x)(g.astype(x.dtype))
    return dx


def _exact_wgrad(x, w, g, stride: int, p: int):
    """Transpose of the conv w.r.t. w — the same wgrad conv the plain
    path runs (jax.linear_transpose avoids re-running the fwd), in the
    operands' dtype: at bf16 compute the plain conv's wgrad is itself a
    bf16×bf16 conv, so this is "exact" w.r.t. the unquantized path."""
    def f(w_):
        return lax.conv_general_dilated(
            x, w_, (stride, stride), [(p, p)] * 2,
            dimension_numbers=_DN)
    (dw,) = jax.linear_transpose(f, w.astype(x.dtype))(
        g.astype(x.dtype))
    return dw


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def int8_train_conv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
                    wgrad_int8: bool = False,
                    per_sample: bool = False,
                    dgrad_int8: bool = True) -> jnp.ndarray:
    """int8-quantized conv with int8 dgrad (+ optional int8 wgrad).

    x (N,H,W,I) in the compute dtype; w (k,k,I,O) master weights.
    Returns f32 (N,Ho,Wo,O). ``stride``/``wgrad_int8``/``per_sample``/
    ``dgrad_int8`` are static. ``per_sample`` quantizes activations and
    incoming gradients with one scale per batch element (per ROI crop
    in res5) instead of per tensor — the finer-forward-quantization
    lever staged when the ``--mode int8train_wx`` A/B attributed the
    ~−1 AP50 cost to per-tensor activation scales (BENCH.md).
    Per-sample scales cannot factor out of the wgrad contraction (batch
    IS contracted there), so ``per_sample`` implies the exact wgrad
    regardless of ``wgrad_int8``. ``dgrad_int8=False`` keeps the input
    gradient exact too (int8 FORWARD only — the most conservative
    staged variant, ``--mode int8train_fo``).
    """
    return _fwd_value(x, w, stride, per_sample)


def _vjp_fwd(x, w, stride, wgrad_int8, per_sample, dgrad_int8):
    if wgrad_int8 and dgrad_int8 and stride == 1 and not per_sample:
        # int8 residuals: the backward reuses the forward's quantized
        # activations — no bwd re-quantization pass, and the saved
        # tensor is int8 (half the bf16 bytes). Requires the int8 dgrad
        # too: the int8 wgrad reuses the dgrad's quantized gradient.
        out, xq, xs = _fwd_parts(x, w, stride)
        # zero-size sentinel carries x's dtype for the dx cast
        return out, (xq, xs, w, jnp.zeros((0,), x.dtype))
    return _fwd_value(x, w, stride, per_sample), (x, w)


def _vjp_bwd(stride, wgrad_int8, per_sample, dgrad_int8, res, g):
    int8_res = (wgrad_int8 and dgrad_int8 and stride == 1
                and not per_sample)
    if int8_res:
        xq, xs, w, x_sentinel = res
        x_dtype = x_sentinel.dtype
    else:
        x, w = res
        x_dtype = x.dtype
    k = w.shape[0]
    p = k // 2
    gf = g.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    # ---- dgrad: dx[...,i] = Σ_o g ⊛ flip(w)[...,o,i]
    if stride == 1 and dgrad_int8:
        # per-sample gradient scales matter even more than activation
        # scales: background ROI crops carry near-zero gradients that a
        # per-tensor scale would quantize to all-zeros
        gq, gs = _quantize_x(gf, per_sample)
        ks_i = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 3)),
                           1e-12) / 127.0                 # (I,)
        wq_i = jnp.round(wf / ks_i[None, None, :, None]).astype(jnp.int8)
        wt = jnp.transpose(wq_i[::-1, ::-1], (0, 1, 3, 2))  # (k,k,O,I)
        dx = _conv_i8(gq, wt, (1, 1), [(p, p)] * 2)
        dx = dx.astype(jnp.float32) * (gs * ks_i)
    else:  # pragma: no cover - no strided conv in the CLIP stages
        dx = _exact_dgrad(x, w, g, stride, p)

    # ---- wgrad: dw[kh,kw,i,o] = Σ_{n,h,w} x ⊛ g. As a conv, the
    # batch dim plays the contracted input-feature role (lhs "CHWN"),
    # the input channel the batch role, and the kernel offsets the
    # output spatial dims ("HWNC").
    if int8_res:
        dw = lax.conv_general_dilated(
            xq, gq, (1, 1), [(p, p)] * 2,
            dimension_numbers=("CHWN", "IHWO", "HWNC"),
            preferred_element_type=jnp.int32)
        dw = dw.astype(jnp.float32) * (xs * gs)
    else:
        dw = _exact_wgrad(x, w, g, stride, p)

    return dx.astype(x_dtype), dw.astype(w.dtype)


int8_train_conv.defvjp(_vjp_fwd, _vjp_bwd)
