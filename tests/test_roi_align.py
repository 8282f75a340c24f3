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


def test_roi_align_int8_close_to_exact(rng):
    """int8 RoIAlign (TPU.INT8_ROI) vs the exact path: per-channel
    feature scales + 1/127 interpolation steps bound the relative
    error to ~1-2% of the per-channel feature range."""
    import jax
    from coin_tpu.ops.roi_align import roi_align_int8

    h, w, c = 25, 37, 8
    feats = rng.randn(h, w, c).astype(np.float32)
    n = 12
    x1 = rng.uniform(0, w * 16 - 40, n)
    y1 = rng.uniform(0, h * 16 - 40, n)
    rois = np.stack([x1, y1,
                     x1 + rng.uniform(8, 40, n),
                     y1 + rng.uniform(8, 40, n)], 1).astype(np.float32)
    exact = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                                 1.0 / 16, resolution=7,
                                 sampling_ratio=2))
    q = np.asarray(jax.jit(
        lambda f, r: roi_align_int8(f, r, 1.0 / 16, 7, 2))(
            jnp.asarray(feats), jnp.asarray(rois)))
    scale = np.abs(feats).max(axis=(0, 1))      # per-channel range
    np.testing.assert_allclose(q, exact, atol=float(scale.max()) * 0.03)
    # and the h > w branch
    exact_t = np.asarray(roi_align(
        jnp.asarray(feats.transpose(1, 0, 2)),
        jnp.asarray(rois[:, [1, 0, 3, 2]]), 1.0 / 16, 7, 2))
    q_t = np.asarray(roi_align_int8(
        jnp.asarray(feats.transpose(1, 0, 2)),
        jnp.asarray(rois[:, [1, 0, 3, 2]]), 1.0 / 16, 7, 2))
    np.testing.assert_allclose(q_t, exact_t,
                               atol=float(scale.max()) * 0.03)


def test_roi_align_int8_grads_are_exact_bilinear(rng):
    """The straight-through backward must equal the EXACT path's
    feature gradient (bilinear transpose on unquantized interpolation
    matrices), and ROI boxes must get a zero cotangent (proposals are
    stop_gradient'ed upstream — pinning this keeps the contract
    visible)."""
    import jax
    from coin_tpu.ops.roi_align import roi_align_int8

    h, w, c = 11, 9, 4
    feats = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    rois = jnp.asarray(
        np.array([[4.0, 8.0, 60.0, 100.0],
                  [0.0, 0.0, 40.0, 40.0]], np.float32))

    def loss_q(f, r):
        o = roi_align_int8(f, r, 1.0 / 16, 5, 2)
        return jnp.sum(jnp.sin(o) * 0.1)

    def loss_e(f, r):
        o = roi_align(f, r, 1.0 / 16, 5, 2)
        return jnp.sum(jnp.sin(o) * 0.1)

    gq_f, gq_r = jax.grad(loss_q, argnums=(0, 1))(feats, rois)
    ge_f, _ = jax.grad(loss_e, argnums=(0, 1))(feats, rois)
    # cotangents differ slightly (sin' evaluated at quantized vs exact
    # outputs); the TRANSPOSE structure must match: compare against the
    # exact transpose applied to the quantized cotangent
    cot = jax.grad(lambda o: jnp.sum(jnp.sin(o) * 0.1))(
        roi_align_int8(feats, rois, 1.0 / 16, 5, 2))
    _, vjp_e = jax.vjp(lambda f: roi_align(f, rois, 1.0 / 16, 5, 2),
                       feats)
    np.testing.assert_allclose(np.asarray(gq_f),
                               np.asarray(vjp_e(cot)[0]),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(gq_r).max()) == 0.0
    # sanity: quantized and exact feature grads stay close in direction
    ne = float(jnp.linalg.norm(ge_f)) + 1e-9
    assert float(jnp.linalg.norm(gq_f - ge_f)) / ne < 0.2


def test_detector_quant_roi_pool_boxes(rng):
    """TPU.INT8_ROI threading: a detector built with quant_roi=True
    pools through roi_align_int8 and stays close to the exact path
    (same params — the knob only changes the pooling arithmetic)."""
    import jax
    import jax.numpy as jnp
    from coin_tpu.models.detector import OpenVocabularyRCNN

    kw = dict(num_classes=3, depth=50, text_layers=1, text_width=32,
              text_heads=2)
    m_exact = OpenVocabularyRCNN(**kw)
    m_q = OpenVocabularyRCNN(quant_roi=True, **kw)
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    tokens = jnp.zeros((4, 77), jnp.int32)
    rois = jnp.asarray([[[2.0, 2.0, 40.0, 40.0],
                         [10.0, 6.0, 60.0, 50.0]]], jnp.float32)
    variables = m_exact.init(jax.random.key(0), img, tokens, rois)
    feats = m_exact.apply(variables, img, method="features")
    p_exact = m_exact.apply(variables, feats, rois, method="pool_boxes")
    p_q = m_q.apply(variables, feats, rois, method="pool_boxes")
    assert p_q.shape == p_exact.shape
    ref = float(jnp.abs(p_exact).max()) + 1e-6
    assert float(jnp.abs(p_q - p_exact).max()) / ref < 0.25
    # direction preserved through res5+pooling
    cos = float(jnp.sum(p_q * p_exact)
                / (jnp.linalg.norm(p_q) * jnp.linalg.norm(p_exact)))
    assert cos > 0.99
