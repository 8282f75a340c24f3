"""GroundingDINO torch checkpoint → coin_tpu flax params.

Maps ``groundingdino_swin{b,t}_*.pth`` (the checkpoint the reference loads
via clean_state_dict, coin/engine/pre_train.py:101-109) into the
parameter tree of models/gdino.GroundingDINO + models/swin.SwinTransformer
+ a FlaxBertModel for the text side.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from coin_tpu.models.convert import _dense, _t


def clean_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    if not any(k.startswith("module.") for k in sd):
        return sd  # already clean — preserve the caller's dict (type)
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _ln(sd, p):
    return {"scale": _t(sd[f"{p}.weight"]), "bias": _t(sd[f"{p}.bias"])}


def _lin(sd, p):
    out = {"kernel": _dense(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = _t(sd[f"{p}.bias"])
    return out


def _conv(sd, p):
    out = {"kernel": _t(sd[f"{p}.weight"]).transpose(2, 3, 1, 0)}
    if f"{p}.bias" in sd:
        out["bias"] = _t(sd[f"{p}.bias"])
    return out


def _gn(sd, p):
    return {"scale": _t(sd[f"{p}.weight"]), "bias": _t(sd[f"{p}.bias"])}


def _mha(sd, p, dim):
    """torch nn.MultiheadAttention → models.gdino.MHA params."""
    in_w = _t(sd[f"{p}.in_proj_weight"])
    in_b = _t(sd[f"{p}.in_proj_bias"])
    qw, kw, vw = np.split(in_w, 3, axis=0)
    qb, kb, vb = np.split(in_b, 3, axis=0)
    return {
        "q": {"kernel": qw.T, "bias": qb},
        "k": {"kernel": kw.T, "bias": kb},
        "v": {"kernel": vw.T, "bias": vb},
        "out_proj": _lin(sd, f"{p}.out_proj"),
    }


def _deform(sd, p):
    return {
        "sampling_offsets": _lin(sd, f"{p}.sampling_offsets"),
        "attention_weights": _lin(sd, f"{p}.attention_weights"),
        "value_proj": _lin(sd, f"{p}.value_proj"),
        "output_proj": _lin(sd, f"{p}.output_proj"),
    }


def _mlp(sd, p, layers=3):
    return {f"layers_{i}": _lin(sd, f"{p}.layers.{i}")
            for i in range(layers)}


def convert_swin(sd: Dict[str, Any], prefix: str = "backbone.0",
                 depths=(2, 2, 18, 2), out_indices=(1, 2, 3)
                 ) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "patch_embed_proj": _conv(sd, f"{prefix}.patch_embed.proj"),
        "patch_embed_norm": _ln(sd, f"{prefix}.patch_embed.norm"),
    }
    for s, depth in enumerate(depths):
        for bidx in range(depth):
            p = f"{prefix}.layers.{s}.blocks.{bidx}"
            out[f"layers_{s}_blocks_{bidx}"] = {
                "norm1": _ln(sd, f"{p}.norm1"),
                "norm2": _ln(sd, f"{p}.norm2"),
                "attn": {
                    "relative_position_bias_table": _t(
                        sd[f"{p}.attn.relative_position_bias_table"]),
                    "qkv": _lin(sd, f"{p}.attn.qkv"),
                    "proj": _lin(sd, f"{p}.attn.proj"),
                },
                "mlp_fc1": _lin(sd, f"{p}.mlp.fc1"),
                "mlp_fc2": _lin(sd, f"{p}.mlp.fc2"),
            }
        if s < len(depths) - 1:
            p = f"{prefix}.layers.{s}.downsample"
            out[f"layers_{s}_downsample"] = {
                "norm": _ln(sd, f"{p}.norm"),
                "reduction": _lin(sd, f"{p}.reduction"),
            }
    # out norms: checkpoint uses norm{idx} per out index
    for s in out_indices:
        out[f"out_norm_{s}"] = _ln(sd, f"{prefix}.norm{s}")
    return out


def convert_gdino(sd: Dict[str, Any], variant: str = "swinB",
                  enc_layers: int = 6, dec_layers: int = 6
                  ) -> Dict[str, Any]:
    """Full GroundingDINO param tree (BERT handled separately — see
    bert_params_from_checkpoint)."""
    sd = clean_state_dict(sd)
    depths = (2, 2, 18, 2) if variant in ("swinB", "swinL") else (2, 2, 6,
                                                                  2)
    t = "transformer"
    out: Dict[str, Any] = {
        "backbone": convert_swin(sd, "backbone.0", depths),
        "feat_map": _lin(sd, "feat_map"),
        "level_embed": _t(sd[f"{t}.level_embed"]),
        "enc_output": _lin(sd, f"{t}.enc_output"),
        "enc_output_norm": _ln(sd, f"{t}.enc_output_norm"),
        "enc_out_bbox_embed": _mlp(sd, f"{t}.enc_out_bbox_embed"),
        "tgt_embed": _t(sd[f"{t}.tgt_embed.weight"]),
        "decoder_norm": _ln(sd, f"{t}.decoder.norm"),
        "ref_point_head": _mlp(sd, f"{t}.decoder.ref_point_head",
                               layers=2),
    }
    for i in range(4):
        out[f"input_proj_{i}_conv"] = _conv(sd, f"input_proj.{i}.0")
        out[f"input_proj_{i}_gn"] = _gn(sd, f"input_proj.{i}.1")
    for i in range(enc_layers):
        p = f"{t}.encoder.layers.{i}"
        out[f"enc_layer_{i}"] = {
            "self_attn": _deform(sd, f"{p}.self_attn"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm2": _ln(sd, f"{p}.norm2"),
        }
        p = f"{t}.encoder.text_layers.{i}"
        out[f"text_layer_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn", 256),
            "norm1": _ln(sd, f"{p}.norm1"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm2": _ln(sd, f"{p}.norm2"),
        }
        p = f"{t}.encoder.fusion_layers.{i}"
        out[f"fusion_{i}"] = {
            "gamma_v": _t(sd[f"{p}.gamma_v"]),
            "gamma_l": _t(sd[f"{p}.gamma_l"]),
            "layer_norm_v": _ln(sd, f"{p}.layer_norm_v"),
            "layer_norm_l": _ln(sd, f"{p}.layer_norm_l"),
            "attn": {k: _lin(sd, f"{p}.attn.{k}")
                     for k in ("v_proj", "l_proj", "values_v_proj",
                               "values_l_proj", "out_v_proj",
                               "out_l_proj")},
        }
    for i in range(dec_layers):
        p = f"{t}.decoder.layers.{i}"
        out[f"dec_layer_{i}"] = {
            "cross_attn": _deform(sd, f"{p}.cross_attn"),
            "ca_text": _mha(sd, f"{p}.ca_text", 256),
            "catext_norm": _ln(sd, f"{p}.catext_norm"),
            "self_attn": _mha(sd, f"{p}.self_attn", 256),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
        }
        out[f"bbox_embed_{i}"] = _mlp(sd, f"bbox_embed.{i}")
    return out


def infer_bert_config(bert_sd: Dict[str, Any]):
    """Derive BertConfig geometry from a state dict's shapes."""
    from transformers import BertConfig

    emb = np.asarray(bert_sd["embeddings.word_embeddings.weight"])
    vocab, hidden = emb.shape
    layers = len({k.split(".")[2] for k in bert_sd
                  if k.startswith("encoder.layer.")})
    inter = np.asarray(
        bert_sd["encoder.layer.0.intermediate.dense.weight"]).shape[0]
    max_pos = np.asarray(
        bert_sd["embeddings.position_embeddings.weight"]).shape[0]
    heads = max(1, hidden // 64)
    return BertConfig(vocab_size=vocab, hidden_size=hidden,
                      num_hidden_layers=layers,
                      num_attention_heads=heads,
                      intermediate_size=inter,
                      max_position_embeddings=max_pos)


def bert_params_from_checkpoint(sd: Dict[str, Any],
                                prefix: str = "bert."):
    """Extract ``prefix``* weights and convert to a FlaxBertModel params
    tree via transformers' pt→flax utility (config inferred from
    shapes)."""
    import torch
    from transformers import FlaxBertModel
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax)

    sd = clean_state_dict(sd)
    bert_sd = {k[len(prefix):]: (torch.as_tensor(v)
                                 if not hasattr(v, "numpy") else v)
               for k, v in sd.items() if k.startswith(prefix)}
    config = infer_bert_config(bert_sd)
    model = FlaxBertModel(config, _do_init=True)
    flax_params = convert_pytorch_state_dict_to_flax(bert_sd, model)
    return model, flax_params
