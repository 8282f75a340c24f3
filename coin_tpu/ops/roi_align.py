"""RoIAlign as dense MXU matmuls.

Replaces detectron2's CUDA ROIAlign (used via ROIPooler by
coin/modeling/roi_heads/clip_roi_heads.py:61-63,172-176).

TPU-first design: instead of per-sample bilinear *gathers* (slow on TPU),
bilinear interpolation is separable, so each ROI's pooled output is two
dense contractions with per-ROI interpolation matrices:

    out[n] = Ay[n] @ F @ Ax[n]^T      (per channel)

where ``Ay[n]`` is (R, H) and already folds the s×s sample averaging of each
output cell. Everything rides the MXU; no scatter/gather at all.

Matches ``ROIAlign(aligned=True)`` with a *static* sampling ratio (the
reference's adaptive ``sampling_ratio=0`` is data-dependent and thus not
shape-static; a fixed ratio of 2 is within noise for detection heads).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _interp_matrix(start: jnp.ndarray, bin_size: jnp.ndarray,
                   resolution: int, sampling: int, size: int) -> jnp.ndarray:
    """Per-ROI 1-D interpolation matrix of shape (N, R, size).

    start/bin_size: (N,) ROI start coordinate and bin extent on the feature
    grid (aligned=True convention: caller already subtracted 0.5).
    """
    n = start.shape[0]
    # sample offsets within the ROI: (R*s,)
    r = jnp.arange(resolution * sampling, dtype=start.dtype)
    cell = r // sampling
    k = r % sampling
    pos = (start[:, None]
           + (cell[None, :] + (k[None, :] + 0.5) / sampling)
           * bin_size[:, None])                       # (N, R*s)
    in_range = (pos >= -1.0) & (pos <= size)
    pos_c = jnp.clip(pos, 0.0, size - 1)
    grid = jnp.arange(size, dtype=start.dtype)        # (size,)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(pos_c[:, :, None]
                                          - grid[None, None, :]))
    tent = jnp.where(in_range[:, :, None], tent, 0.0)
    tent = tent.reshape(n, resolution, sampling, size)
    return jnp.mean(tent, axis=2)                     # (N, R, size)


@partial(jax.jit, static_argnames=("resolution", "sampling_ratio"))
def roi_align(features: jnp.ndarray, rois: jnp.ndarray,
              spatial_scale: float, resolution: int = 14,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign (aligned=True) for one image.

    Args:
      features: (H, W, C) feature map.
      rois: (N, 4) xyxy boxes in *image* coordinates.
      spatial_scale: feature stride reciprocal (e.g. 1/16 for res4).
      resolution: output R (14 in the reference pooler).
      sampling_ratio: static samples per bin edge.

    Returns (N, R, R, C).
    """
    h, w, c = features.shape
    dtype = features.dtype
    rois = rois.astype(jnp.float32) * spatial_scale - 0.5  # aligned=True
    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    bin_w = (x2 - x1) / resolution
    bin_h = (y2 - y1) / resolution

    ax = _interp_matrix(x1, bin_w, resolution, sampling_ratio, w)  # (N,R,W)
    ay = _interp_matrix(y1, bin_h, resolution, sampling_ratio, h)  # (N,R,H)

    # out[n,r,s,c] = Σ_h Σ_w ay[n,r,h] f[h,w,c] ax[n,s,w]
    # contract the longer spatial dim first: the (N, R, short, C)
    # intermediate is the memory-traffic hot spot
    # the (N, R, short, C) intermediate is the memory-traffic hot spot
    # (GBs at 1000+ rois): store it in the compute dtype — under bf16
    # that halves its HBM traffic; both contractions still accumulate
    # in f32 on the MXU (preferred_element_type)
    if w >= h:
        tmp = jnp.einsum("nsw,hwc->nhsc", ax.astype(dtype), features,
                         preferred_element_type=jnp.float32).astype(dtype)
        out = jnp.einsum("nrh,nhsc->nrsc", ay.astype(dtype), tmp,
                         preferred_element_type=jnp.float32)
    else:
        tmp = jnp.einsum("nrh,hwc->nrwc", ay.astype(dtype), features,
                         preferred_element_type=jnp.float32).astype(dtype)
        out = jnp.einsum("nrwc,nsw->nrsc", tmp, ax.astype(dtype),
                         preferred_element_type=jnp.float32)
    return out.astype(dtype)


def roi_align_batched(features: jnp.ndarray, rois: jnp.ndarray,
                      spatial_scale: float, resolution: int = 14,
                      sampling_ratio: int = 2) -> jnp.ndarray:
    """vmapped RoIAlign: features (B,H,W,C), rois (B,N,4) → (B,N,R,R,C)."""
    return jax.vmap(
        lambda f, r: roi_align(f, r, spatial_scale, resolution,
                               sampling_ratio))(features, rois)


# ---------------------------------------------------------------------
# int8 RoIAlign (TPU.INT8_ROI) — the bandwidth lever of the int8
# training step. The round-5 trace shows the two RoIAlign contractions
# cost 14 ms/step of the 96.8 ms int8 cached step, bandwidth-bound on
# the (N, short, R, C) bf16 intermediate (1.9 GB/pass at production
# shapes) — work int8 res5 compute does not touch. Here both
# contractions ride the int8 MXU and the intermediate is stored s8
# (half the bf16 bytes).
#
# Exactness structure (why the requantization needs NO extra pass):
#   - feature scales are per-CHANNEL (s_f[c] = max|f[:,:,c]|/127): c is
#     never a contracted dim, so the factorization is exact;
#   - the interpolation matrices fold the s×s sample averaging, so
#     every row of ax/ay sums to ≤ 1 → a STATIC scale of 1/127, and
#     the first contraction's int32 output obeys |tmp_i32| ≤ 127·127:
#     requantizing the intermediate is a provably-in-range divide by
#     127 (+ clip for rounding slop) — no data-dependent reduction
#     over the 1.9 GB tensor.
# Backward is straight-through and EXACT: the bilinear transpose runs
# in the operand dtype on the unquantized interpolation matrices (the
# same gradient the bf16 path produces). ROI boxes receive a zero
# cotangent — exact, because proposals are built under stop_gradient
# (engine/pipelines.rpn_forward).
#
# Semantic knob: quantizing crop features changes numerics, so it
# ships only via the fixture A/B gate like every int8 lever.
# Reference bar: the CUDA ROIAlign the reference runs in fp16 under
# AMP, coin/modeling/roi_heads/clip_roi_heads.py:61-63,172-176.
# ---------------------------------------------------------------------


def _quant_feat(features: jnp.ndarray):
    f32 = features.astype(jnp.float32)
    s_f = jnp.maximum(jnp.max(jnp.abs(f32), axis=(0, 1)), 1e-12) / 127.0
    fq = jnp.clip(jnp.round(f32 / s_f), -127, 127).astype(jnp.int8)
    return fq, s_f


def _quant_interp(a: jnp.ndarray) -> jnp.ndarray:
    # rows sum to ≤1 and entries are ≥0 → static scale 1/127
    return jnp.round(a * 127.0).astype(jnp.int8)


def _requant_tmp(tmp_i32: jnp.ndarray) -> jnp.ndarray:
    # |tmp_i32| ≤ 127·127 by the row-sum bound; /127 + clip is exact
    # requantization onto the feature scale
    return jnp.clip(jnp.round(tmp_i32.astype(jnp.float32) / 127.0),
                    -127, 127).astype(jnp.int8)


def _roi_align_int8_value(features, rois, spatial_scale, resolution,
                          sampling_ratio):
    h, w, c = features.shape
    dtype = features.dtype
    rois_f = rois.astype(jnp.float32) * spatial_scale - 0.5
    x1, y1, x2, y2 = (rois_f[:, 0], rois_f[:, 1], rois_f[:, 2],
                      rois_f[:, 3])
    ax = _interp_matrix(x1, (x2 - x1) / resolution, resolution,
                        sampling_ratio, w)               # (N,R,W)
    ay = _interp_matrix(y1, (y2 - y1) / resolution, resolution,
                        sampling_ratio, h)               # (N,R,H)
    fq, s_f = _quant_feat(features)
    axq, ayq = _quant_interp(ax), _quant_interp(ay)
    if w >= h:
        tmp = jnp.einsum("nsw,hwc->nhsc", axq, fq,
                         preferred_element_type=jnp.int32)
        tmpq = _requant_tmp(tmp)
        out = jnp.einsum("nrh,nhsc->nrsc", ayq, tmpq,
                         preferred_element_type=jnp.int32)
    else:
        tmp = jnp.einsum("nrh,hwc->nrwc", ayq, fq,
                         preferred_element_type=jnp.int32)
        tmpq = _requant_tmp(tmp)
        out = jnp.einsum("nrwc,nsw->nrsc", tmpq, axq,
                         preferred_element_type=jnp.int32)
    # both 1/127 interp scales and the per-channel feature scale ride
    # non-contracted dims → exact rescale of the integer accumulation
    return (out.astype(jnp.float32) * (s_f / 127.0)).astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def roi_align_int8(features: jnp.ndarray, rois: jnp.ndarray,
                   spatial_scale: float, resolution: int = 14,
                   sampling_ratio: int = 2) -> jnp.ndarray:
    """Dynamic-int8 RoIAlign (aligned=True), straight-through backward.

    Same signature/semantics as :func:`roi_align`; features are
    quantized per-channel, interpolation weights at a static 1/127
    step (≤0.8% relative error on a weight of 1), and both MXU
    contractions accumulate in int32.
    """
    return _roi_align_int8_value(features, rois, spatial_scale,
                                 resolution, sampling_ratio)


def _ra_int8_fwd(features, rois, spatial_scale, resolution,
                 sampling_ratio):
    out = _roi_align_int8_value(features, rois, spatial_scale,
                                resolution, sampling_ratio)
    # residuals: rois + a ZERO-SIZE sentinel carrying the feature
    # shape/dtype statically — ax/ay are recomputed in the backward
    # (a few MB) instead of being saved across the step
    sentinel = jnp.zeros(features.shape[:2] + (0,), features.dtype)
    return out, (rois, sentinel)


def _ra_int8_bwd(spatial_scale, resolution, sampling_ratio, res, g):
    rois, sentinel = res
    h, w = sentinel.shape[:2]
    fdtype = sentinel.dtype
    rois_f = rois.astype(jnp.float32) * spatial_scale - 0.5
    x1, y1, x2, y2 = (rois_f[:, 0], rois_f[:, 1], rois_f[:, 2],
                      rois_f[:, 3])
    ax = _interp_matrix(x1, (x2 - x1) / resolution, resolution,
                        sampling_ratio, w).astype(fdtype)
    ay = _interp_matrix(y1, (y2 - y1) / resolution, resolution,
                        sampling_ratio, h).astype(fdtype)
    gd = g.astype(fdtype)
    # d f[h,w,c] = Σ_{n,r,s} ay[n,r,h] ax[n,s,w] g[n,r,s,c] — the exact
    # bilinear transpose, contracted long-dim-last like the forward
    t = jnp.einsum("nrh,nrsc->nhsc", ay, gd,
                   preferred_element_type=jnp.float32).astype(fdtype)
    df = jnp.einsum("nhsc,nsw->hwc", t, ax,
                    preferred_element_type=jnp.float32)
    return df.astype(fdtype), jnp.zeros_like(rois)


roi_align_int8.defvjp(_ra_int8_fwd, _ra_int8_bwd)
