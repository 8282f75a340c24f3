"""convert_glip structural test, manifest-driven (round 4).

A synthetic checkpoint is built FROM the official-layout manifest
(``models/manifests.glip_manifest`` — the maskrcnn_benchmark GLIP
state-dict layout the reference loads via DetectronCheckpointer,
``coin/modeling/meta_arch/glip_model.py:112-132``), run through
``convert_glip``, and the result must exactly cover the flax GLIP
param tree — key set AND shapes — and be directly usable by
``GLIP.apply``. Because the source is the manifest (not the converter's
inverse), any converter key-name drift from the official layout fails
here; ``tools/verify_assets.py`` runs the same manifest against real
checkpoints the moment assets mount."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from coin_tpu.models import manifests as M
from coin_tpu.models import convert_glip as CG
from coin_tpu.models.glip import GLIP

VARIANT, BLOCKS = "swinT", 2


@pytest.fixture(scope="module")
def conv_and_init():
    keys, _bufs = M.glip_manifest(VARIANT, num_blocks=BLOCKS)
    sd = M.synth_state_dict(keys, seed=11)
    out = CG.convert_glip(sd, variant=VARIANT, num_blocks=BLOCKS)
    model = GLIP(variant=VARIANT, num_blocks=BLOCKS)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    emb = jnp.zeros((1, 12, 768), jnp.float32)
    mask = jnp.ones((1, 12), bool)
    init = model.init(jax.random.key(7), img, emb, mask)["params"]
    return model, out, init


def test_manifest_checkpoint_covers_model(conv_and_init):
    _model, out, init = conv_and_init
    got = traverse_util.flatten_dict(jax.tree.map(np.asarray, out),
                                     sep="/")
    want = traverse_util.flatten_dict(jax.tree.map(np.asarray, init),
                                      sep="/")
    assert set(got) == set(want), (
        f"missing: {sorted(set(want) - set(got))[:8]} "
        f"extra: {sorted(set(got) - set(want))[:8]}")
    for k in want:
        assert got[k].shape == want[k].shape, (
            f"{k}: converted {got[k].shape} vs model {want[k].shape}")


def test_converted_params_apply(conv_and_init):
    """Converted tree must be directly usable by GLIP.apply and
    produce finite outputs."""
    model, out, _init = conv_and_init
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    emb = jnp.asarray(np.random.RandomState(3).randn(1, 12, 768)
                      .astype(np.float32))
    mask = jnp.ones((1, 12), bool)
    logits, deltas, ctr, shapes = model.apply(
        {"params": jax.tree.map(jnp.asarray, out)}, img, emb, mask)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(deltas)).all()
    assert np.isfinite(np.asarray(ctr)).all()


def test_glip_manifest_counts():
    """The full GLIP-L manifest: spot totals that pin the layout
    (8 dyhead blocks × 3 tower slots, 12-layer BERT, FPN+P6P7)."""
    keys, bufs = M.glip_manifest("swinL", num_blocks=8)
    tower = [k for k in keys if k.startswith("rpn.head.dyhead_tower.")]
    # per block: VLFuse 18 + BertEncoderLayer 16 + DyConv 20 = 54
    assert len(tower) == 8 * 54
    assert "rpn.head.log_scale" in keys
    assert "rpn.head.dot_product_projection_text.weight" in keys
    # Identity image projection: must NOT be in the official layout
    assert not any("dot_product_projection_image" in k for k in keys)
    assert "backbone.fpn.top_blocks.p7.bias" in keys
    assert "language_backbone.body.model.pooler.dense.weight" in keys
    # scales per FPN level
    assert sum(1 for k in keys if ".scales." in k) == 5
