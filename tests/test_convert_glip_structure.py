"""convert_glip structural round-trip: synthesize a checkpoint in the
official maskrcnn_benchmark key layout (inverse transforms) from a
random GLIP flax init, convert it, and require the exact param tree
back — pins key names, transposes, and tree structure so real
``glip_*.pth`` weights drop in (the Swin sub-mapping is parity-tested
separately in test_swin_parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from coin_tpu.models import convert_glip as CG
from coin_tpu.models.glip import GLIP


def _inv_lin(flax_mod):     # flax (in,out) -> torch (out,in)
    return {"weight": np.asarray(flax_mod["kernel"]).T,
            "bias": np.asarray(flax_mod["bias"])}


def _inv_conv(flax_mod):    # flax HWIO -> torch OIHW
    return {"weight": np.asarray(flax_mod["kernel"]).transpose(3, 2, 0, 1),
            "bias": np.asarray(flax_mod["bias"])}


def _inv_ln(flax_mod):
    return {"weight": np.asarray(flax_mod["scale"]),
            "bias": np.asarray(flax_mod["bias"])}


@pytest.fixture(scope="module")
def flax_params():
    model = GLIP(variant="swinT", num_blocks=2)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    emb = jnp.zeros((1, 12, 768), jnp.float32)
    mask = jnp.ones((1, 12), bool)
    return model.init(jax.random.key(7), img, emb, mask)["params"]


def synth_checkpoint(p):
    sd = {}

    def put(prefix, torch_mod):
        for k, v in torch_mod.items():
            sd[f"{prefix}.{k}"] = v

    for i in range(3):
        put(f"neck.lateral_convs.{i}.conv", _inv_conv(p[f"lateral_{i}"]))
    for i in range(2):
        put(f"neck.extra_convs.{i}.conv", _inv_conv(p[f"extra_{i}"]))

    for i in range(2):
        blk = p[f"dyhead_{i}"]
        fp = f"rpn.head.dyhead_tower.{i}"
        for name in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                     "out_v_proj", "out_l_proj"):
            put(f"{fp}.b_attn.attn.{name}",
                _inv_lin(blk["fusion_attn"][name]))
        put(f"{fp}.b_attn.layer_norm_v",
            _inv_ln(blk["fusion_layer_norm_v"]))
        put(f"{fp}.b_attn.layer_norm_l",
            _inv_ln(blk["fusion_layer_norm_l"]))
        sd[f"{fp}.b_attn.gamma_v"] = np.asarray(blk["fusion_gamma_v"])
        sd[f"{fp}.b_attn.gamma_l"] = np.asarray(blk["fusion_gamma_l"])
        for ours, theirs in (("dyconv_high", 0), ("dyconv_mid", 1),
                             ("dyconv_low", 2)):
            put(f"{fp}.dyconv.DyConv.{theirs}", _inv_conv(blk[ours]))
        put(f"{fp}.dyconv.offset", _inv_conv(blk["dyconv_offset"]))
        put(f"{fp}.dyconv.attnconv.fc", _inv_lin(blk["scale_attn_fc"]))

    head = p["head"]
    put("rpn.head.dot_product_projection_image",
        _inv_conv(head["dot_product_projection_image"]))
    put("rpn.head.dot_product_projection_text",
        _inv_lin(head["dot_product_projection_text"]))
    put("rpn.head.bbox_pred", _inv_conv(head["bbox_pred"]))
    put("rpn.head.centerness", _inv_conv(head["centerness"]))
    sd["rpn.head.bias_lang"] = np.asarray(head["bias_lang"])
    sd["rpn.head.bias0"] = np.asarray(head["bias0"])
    return sd


def test_convert_glip_round_trip(flax_params, monkeypatch):
    p = flax_params
    sd = synth_checkpoint(p)
    # the Swin sub-converter is parity-tested on its own; stand it in so
    # this test pins the GLIP-specific mapping exactly
    monkeypatch.setattr(CG, "convert_swin",
                        lambda *a, **k: p["backbone"])
    out = CG.convert_glip(sd, variant="swinT", num_blocks=2)

    want = traverse_util.flatten_dict(jax.tree.map(np.asarray, p),
                                      sep="/")
    got = traverse_util.flatten_dict(jax.tree.map(np.asarray, out),
                                     sep="/")
    assert set(got) == set(want), (
        f"missing: {sorted(set(want) - set(got))[:8]} "
        f"extra: {sorted(set(got) - set(want))[:8]}")
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)


def test_converted_params_apply(flax_params, monkeypatch):
    """Converted tree must be directly usable by GLIP.apply."""
    p = flax_params
    monkeypatch.setattr(CG, "convert_swin",
                        lambda *a, **k: p["backbone"])
    out = CG.convert_glip(synth_checkpoint(p), variant="swinT",
                          num_blocks=2)
    model = GLIP(variant="swinT", num_blocks=2)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    emb = jnp.zeros((1, 12, 768), jnp.float32)
    mask = jnp.ones((1, 12), bool)
    ref = model.apply({"params": p}, img, emb, mask)
    got = model.apply({"params": jax.tree.map(jnp.asarray, out)}, img,
                      emb, mask)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
