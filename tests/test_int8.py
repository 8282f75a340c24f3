"""Int8 dynamic-quantization serving path (clip_resnet.Int8Conv).

The int8 MXU runs the hot conv shapes at ~1.8x the bf16 rate
(tools/bench_int8.py); Int8Conv applies it to the INFERENCE path only
(TPU.INT8_INFERENCE / OpenVocabularyRCNN.quant_convs). These tests pin:
(a) parameter-tree compatibility — a trained bf16 checkpoint loads into
the quant model unchanged; (b) numeric closeness of one conv and of the
stacked backbone.
"""

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.models.clip_resnet import CLIPResNetBackbone, Int8Conv, _conv
from coin_tpu.models.detector import OpenVocabularyRCNN


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_int8_conv_matches_exact_conv(rng):
    x = jnp.asarray(rng.randn(2, 12, 12, 32).astype(np.float32))
    exact = _conv(24, 3, name=None)
    quant = Int8Conv(24, 3)
    params = exact.init(jax.random.key(0), x)
    # identical param trees: the quant module consumes the exact conv's
    # checkpoint verbatim
    qparams = quant.init(jax.random.key(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(qparams)
    assert [p.shape for p in jax.tree.leaves(params)] == \
        [p.shape for p in jax.tree.leaves(qparams)]
    y_exact = exact.apply(params, x)
    y_quant = quant.apply(params, x)
    assert y_quant.shape == y_exact.shape
    # two symmetric int8 quantizations: ~1% relative error on one conv
    assert _rel_err(y_quant, y_exact) < 0.05


def test_int8_conv_strided_matches(rng):
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    exact = _conv(16, 3, stride=2)
    quant = _conv(16, 3, stride=2, quant=True)
    params = exact.init(jax.random.key(1), x)
    y_exact = exact.apply(params, x)
    y_quant = quant.apply(params, x)
    assert y_quant.shape == y_exact.shape
    assert _rel_err(y_quant, y_exact) < 0.05


def test_quant_backbone_close_and_checkpoint_compatible(rng):
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    bf = CLIPResNetBackbone(depth=50)
    q = CLIPResNetBackbone(depth=50, quant=True)
    params = bf.init(jax.random.key(0), x)
    assert jax.tree.structure(q.init(jax.random.key(0), x)) == \
        jax.tree.structure(params)
    y = np.asarray(bf.apply(params, x), np.float64).ravel()
    yq = np.asarray(q.apply(params, x), np.float64).ravel()
    assert np.all(np.isfinite(yq))
    cos = float(y @ yq / (np.linalg.norm(y) * np.linalg.norm(yq) + 1e-12))
    # error accumulates over the stacked convs; direction must survive
    assert cos > 0.95, cos


def test_detector_quant_clone_shares_variables(rng):
    model = OpenVocabularyRCNN(num_classes=3, depth=50, text_layers=2,
                               text_width=64, text_heads=2)
    images = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    tokens = jnp.asarray(rng.randint(1, 100, (4, 77)).astype(np.int32))
    rois = jnp.asarray(rng.uniform(0, 40, (1, 4, 4)).astype(np.float32))
    rois = rois.at[..., 2:].add(16.0)
    variables = model.init(jax.random.key(0), images, tokens, rois)
    qmodel = model.clone(quant_convs=True)
    out = model.apply(variables, images, tokens, rois)
    qout = qmodel.apply(variables, images, tokens, rois)
    for k in ("scores", "deltas"):
        assert qout[k].shape == out[k].shape
        assert np.all(np.isfinite(np.asarray(qout[k], np.float32)))
    # classification logits stay close through backbone+res5+predict
    s, sq = (np.asarray(out["scores"], np.float64),
             np.asarray(qout["scores"], np.float64))
    assert _rel_err(sq, s) < 0.25, _rel_err(sq, s)
