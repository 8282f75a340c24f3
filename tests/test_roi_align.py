import numpy as np
import jax.numpy as jnp

from coin_tpu.ops.roi_align import roi_align, roi_align_batched


def roi_align_ref(feats, rois, scale, res, s):
    """Numpy ROIAlign(aligned=True) reference: per-sample bilinear, s×s
    average per output cell (torchvision/detectron2 semantics)."""
    h, w, c = feats.shape
    n = len(rois)
    out = np.zeros((n, res, res, c), np.float32)
    for i, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale - 0.5
        bw = (x2 - x1) / res
        bh = (y2 - y1) / res
        for r in range(res):
            for q in range(res):
                acc = np.zeros(c, np.float32)
                for ky in range(s):
                    for kx in range(s):
                        y = y1 + (r + (ky + 0.5) / s) * bh
                        x = x1 + (q + (kx + 0.5) / s) * bw
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y = min(max(y, 0.0), h - 1)
                        x = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        fy, fx = y - y0, x - x0
                        acc += ((1 - fy) * (1 - fx) * feats[y0, x0]
                                + (1 - fy) * fx * feats[y0, x1i]
                                + fy * (1 - fx) * feats[y1i, x0]
                                + fy * fx * feats[y1i, x1i])
                out[i, r, q] = acc / (s * s)
    return out


def test_roi_align_matches_reference(rng):
    h, w, c = 25, 37, 8
    feats = rng.randn(h, w, c).astype(np.float32)
    n = 12
    x1 = rng.uniform(0, w * 16 - 40, n)
    y1 = rng.uniform(0, h * 16 - 40, n)
    rois = np.stack([x1, y1,
                     x1 + rng.uniform(8, 40, n),
                     y1 + rng.uniform(8, 40, n)], 1).astype(np.float32)
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                               1.0 / 16, resolution=7, sampling_ratio=2))
    ref = roi_align_ref(feats, rois, 1.0 / 16, 7, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_roi_align_edge_rois(rng):
    h, w, c = 10, 10, 4
    feats = rng.randn(h, w, c).astype(np.float32)
    rois = np.array([[-8.0, -8.0, 32.0, 32.0],
                     [100.0, 100.0, 200.0, 190.0],
                     [0.0, 0.0, 4.0, 4.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                               1.0 / 16, resolution=4, sampling_ratio=2))
    ref = roi_align_ref(feats, rois, 1.0 / 16, 4, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_roi_align_batched_shape(rng):
    feats = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    rois = jnp.asarray(rng.uniform(0, 100, (2, 5, 4)).astype(np.float32))
    out = roi_align_batched(feats, rois, 1.0 / 16, resolution=7)
    assert out.shape == (2, 5, 7, 7, 4)
