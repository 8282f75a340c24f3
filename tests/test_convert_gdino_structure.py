"""convert_gdino structural round-trip: synthesize a checkpoint in the
official groundingdino key layout (inverse transforms) from a random
flax init, convert, and require the exact tree back — pins enhancer /
decoder / projection key names and transposes so the real
``groundingdino_*.pth`` drops in (Swin and BERT sub-mappings are
parity-tested separately)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from coin_tpu.models import convert_gdino as CG
from coin_tpu.models.gdino import GroundingDINO


def _inv_lin(m):
    return {"weight": np.asarray(m["kernel"]).T,
            "bias": np.asarray(m["bias"])}


def _inv_conv(m):
    return {"weight": np.asarray(m["kernel"]).transpose(3, 2, 0, 1),
            "bias": np.asarray(m["bias"])}


def _inv_norm(m):   # LayerNorm / GroupNorm
    return {"weight": np.asarray(m["scale"]),
            "bias": np.asarray(m["bias"])}


def _inv_mha(m):
    in_w = np.concatenate([np.asarray(m[k]["kernel"]).T
                           for k in ("q", "k", "v")], axis=0)
    in_b = np.concatenate([np.asarray(m[k]["bias"])
                           for k in ("q", "k", "v")], axis=0)
    return {"in_proj_weight": in_w, "in_proj_bias": in_b,
            "out_proj": _inv_lin(m["out_proj"])}


@pytest.fixture(scope="module")
def flax_params():
    model = GroundingDINO(variant="swinT", num_queries=16, enc_layers=1,
                          dec_layers=1)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    emb = jnp.zeros((1, 12, 768), jnp.float32)
    mask = jnp.ones((1, 12), bool)
    return model.init(jax.random.key(11), img, emb, mask)["params"]


def synth_checkpoint(p):
    sd = {}
    t = "transformer"

    def put(prefix, mod):
        for k, v in mod.items():
            if isinstance(v, dict):
                put(f"{prefix}.{k}", v)
            else:
                sd[f"{prefix}.{k}"] = v

    def put_mlp(prefix, mod, layers=3):
        for i in range(layers):
            put(f"{prefix}.layers.{i}", _inv_lin(mod[f"layers_{i}"]))

    sd[f"{t}.level_embed"] = np.asarray(p["level_embed"])
    sd[f"{t}.tgt_embed.weight"] = np.asarray(p["tgt_embed"])
    put("feat_map", _inv_lin(p["feat_map"]))
    put(f"{t}.enc_output", _inv_lin(p["enc_output"]))
    put(f"{t}.enc_output_norm", _inv_norm(p["enc_output_norm"]))
    put_mlp(f"{t}.enc_out_bbox_embed", p["enc_out_bbox_embed"])
    put(f"{t}.decoder.norm", _inv_norm(p["decoder_norm"]))
    put_mlp(f"{t}.decoder.ref_point_head", p["ref_point_head"], layers=2)

    for i in range(4):
        put(f"input_proj.{i}.0", _inv_conv(p[f"input_proj_{i}_conv"]))
        put(f"input_proj.{i}.1", _inv_norm(p[f"input_proj_{i}_gn"]))

    for i in range(1):
        e = p[f"enc_layer_{i}"]
        ep = f"{t}.encoder.layers.{i}"
        for k in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            put(f"{ep}.self_attn.{k}", _inv_lin(e["self_attn"][k]))
        for k in ("linear1", "linear2"):
            put(f"{ep}.{k}", _inv_lin(e[k]))
        for k in ("norm1", "norm2"):
            put(f"{ep}.{k}", _inv_norm(e[k]))

        tl = p[f"text_layer_{i}"]
        tp = f"{t}.encoder.text_layers.{i}"
        put(f"{tp}.self_attn", _inv_mha(tl["self_attn"]))
        for k in ("linear1", "linear2"):
            put(f"{tp}.{k}", _inv_lin(tl[k]))
        for k in ("norm1", "norm2"):
            put(f"{tp}.{k}", _inv_norm(tl[k]))

        f = p[f"fusion_{i}"]
        fp = f"{t}.encoder.fusion_layers.{i}"
        sd[f"{fp}.gamma_v"] = np.asarray(f["gamma_v"])
        sd[f"{fp}.gamma_l"] = np.asarray(f["gamma_l"])
        put(f"{fp}.layer_norm_v", _inv_norm(f["layer_norm_v"]))
        put(f"{fp}.layer_norm_l", _inv_norm(f["layer_norm_l"]))
        for k in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                  "out_v_proj", "out_l_proj"):
            put(f"{fp}.attn.{k}", _inv_lin(f["attn"][k]))

        d = p[f"dec_layer_{i}"]
        dp = f"{t}.decoder.layers.{i}"
        for k in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            put(f"{dp}.cross_attn.{k}", _inv_lin(d["cross_attn"][k]))
        put(f"{dp}.ca_text", _inv_mha(d["ca_text"]))
        put(f"{dp}.self_attn", _inv_mha(d["self_attn"]))
        for k in ("linear1", "linear2"):
            put(f"{dp}.{k}", _inv_lin(d[k]))
        for k in ("norm1", "norm2", "norm3", "catext_norm"):
            put(f"{dp}.{k}", _inv_norm(d[k]))
        put_mlp(f"bbox_embed.{i}", p[f"bbox_embed_{i}"])
    return sd


def test_convert_gdino_round_trip(flax_params, monkeypatch):
    p = flax_params
    monkeypatch.setattr(CG, "convert_swin",
                        lambda *a, **k: p["backbone"])
    out = CG.convert_gdino(synth_checkpoint(p), variant="swinT",
                           enc_layers=1, dec_layers=1)
    want = traverse_util.flatten_dict(jax.tree.map(np.asarray, p),
                                      sep="/")
    got = traverse_util.flatten_dict(jax.tree.map(np.asarray, out),
                                     sep="/")
    assert set(got) == set(want), (
        f"missing: {sorted(set(want) - set(got))[:8]} "
        f"extra: {sorted(set(got) - set(want))[:8]}")
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6,
                                   atol=1e-6, err_msg=k)


def test_converted_params_apply(flax_params, monkeypatch):
    p = flax_params
    monkeypatch.setattr(CG, "convert_swin",
                        lambda *a, **k: p["backbone"])
    out = CG.convert_gdino(synth_checkpoint(p), variant="swinT",
                           enc_layers=1, dec_layers=1)
    model = GroundingDINO(variant="swinT", num_queries=16, enc_layers=1,
                          dec_layers=1)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    emb = jnp.zeros((1, 12, 768), jnp.float32)
    mask = jnp.ones((1, 12), bool)
    ref = model.apply({"params": p}, img, emb, mask)
    got = model.apply({"params": jax.tree.map(jnp.asarray, out)}, img,
                      emb, mask)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
