"""GLIP checkpoint → coin_tpu flax params (structural mapping).

Maps the OFFICIAL ``glip_large_model.pth`` / ``glip_tiny_*.pth``
state-dict layout (microsoft/GLIP maskrcnn_benchmark fork — the model
the reference builds at ``coin/modeling/meta_arch/glip_model.py:112-132``)
into ``models/glip.GLIP``. The authoritative key list lives in
``models/manifests.glip_manifest`` — the structure tests synthesize
checkpoints FROM that manifest (not from this converter's inverse), so
a key-name drift here fails CI. ``tools/verify_assets.py`` diffs real
checkpoints against the same manifest.

The Swin and BERT sub-mappings reuse convert_gdino/convert machinery.
``rpn.head.cls_logits`` (the class-supervised head GLIP trains but the
token-based inference path never uses) is intentionally not mapped.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

from coin_tpu.models.convert import _t
from coin_tpu.models.convert_gdino import (_conv, _gn, _lin, _ln,
                                           clean_state_dict, convert_swin)

logger = logging.getLogger(__name__)


def _dcn(sd, p):
    """Conv3x3Norm: ModulatedDeformConv (OIHW→HWIO) + GroupNorm(16)."""
    return {
        "kernel": _t(sd[f"{p}.conv.weight"]).transpose(2, 3, 1, 0),
        "bias": _t(sd[f"{p}.conv.bias"]),
        "gn": _gn(sd, f"{p}.bn"),
    }


def convert_glip(sd: Dict[str, Any], variant: str = "swinL",
                 num_blocks: int = 8) -> Dict[str, Any]:
    sd = clean_state_dict(sd)
    depths = (2, 2, 18, 2) if variant in ("swinL", "swinB") else (2, 2, 6,
                                                                  2)
    out: Dict[str, Any] = {
        "backbone": convert_swin(sd, "backbone.body", depths),
    }

    # ---- FPN (+ RetinaNet P6/P7) ----
    fpn: Dict[str, Any] = {}
    for idx in (2, 3, 4):
        key = f"backbone.fpn.fpn_inner{idx}"
        if f"{key}.weight" in sd:
            fpn[f"fpn_inner{idx}"] = _conv(sd, key)
            fpn[f"fpn_layer{idx}"] = _conv(sd,
                                           f"backbone.fpn.fpn_layer{idx}")
    for p67 in ("p6", "p7"):
        key = f"backbone.fpn.top_blocks.{p67}"
        if f"{key}.weight" in sd:
            fpn[f"top_{p67}"] = _conv(sd, key)
    out["fpn"] = fpn

    tower = "rpn.head.dyhead_tower"
    for i in range(num_blocks):
        blk: Dict[str, Any] = {}
        # ---- VLFuse (tower index 3i) ----
        fp = f"{tower}.{3 * i}"
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
        # ---- BertEncoderLayer (tower index 3i+1) ----
        lp = f"{tower}.{3 * i + 1}"
        if f"{lp}.attention.self.query.weight" in sd:
            blk["lang_layer"] = {
                "query": _lin(sd, f"{lp}.attention.self.query"),
                "key": _lin(sd, f"{lp}.attention.self.key"),
                "value": _lin(sd, f"{lp}.attention.self.value"),
                "att_out": _lin(sd, f"{lp}.attention.output.dense"),
                "att_ln": _ln(sd, f"{lp}.attention.output.LayerNorm"),
                "inter": _lin(sd, f"{lp}.intermediate.dense"),
                "out": _lin(sd, f"{lp}.output.dense"),
                "out_ln": _ln(sd, f"{lp}.output.LayerNorm"),
            }
        # ---- DyConv (tower index 3i+2) ----
        dp = f"{tower}.{3 * i + 2}"
        # official branch order: DyConv.0 = applied to level+1 (high),
        # DyConv.1 = same level (mid), DyConv.2 = stride-2 on level-1
        for ours, theirs in (("dyconv_high", 0), ("dyconv_mid", 1),
                             ("dyconv_low", 2)):
            w = f"{dp}.DyConv.{theirs}"
            if f"{w}.conv.weight" in sd:
                blk[ours] = _dcn(sd, w)
        if f"{dp}.offset.weight" in sd:
            blk["dyconv_offset"] = _conv(sd, f"{dp}.offset")
        if f"{dp}.AttnConv.1.weight" in sd:
            # 1×1 conv on a 1×1 pooled map ≡ Dense: (1, C, 1, 1) → (C, 1)
            w = _t(sd[f"{dp}.AttnConv.1.weight"])
            blk["scale_attn_fc"] = {
                "kernel": w.reshape(w.shape[0], w.shape[1]).T,
                "bias": _t(sd[f"{dp}.AttnConv.1.bias"]),
            }
        if f"{dp}.relu.fc.0.weight" in sd:
            blk["dyrelu"] = {"fc1": _lin(sd, f"{dp}.relu.fc.0"),
                             "fc2": _lin(sd, f"{dp}.relu.fc.2")}
        out[f"dyhead_{i}"] = blk

    head = "rpn.head"
    out["head"] = {}
    for ours, theirs in (("bbox_pred", f"{head}.bbox_pred"),
                         ("centerness", f"{head}.centerness")):
        if f"{theirs}.weight" in sd:
            out["head"][ours] = _conv(sd, theirs)
    if f"{head}.dot_product_projection_text.weight" in sd:
        out["head"]["dot_product_projection_text"] = _lin(
            sd, f"{head}.dot_product_projection_text")
    if f"{head}.bias_lang" in sd:
        out["head"]["bias_lang"] = _t(sd[f"{head}.bias_lang"])
    if f"{head}.bias0" in sd:
        out["head"]["bias0"] = _t(sd[f"{head}.bias0"]).reshape(())
    if f"{head}.log_scale" in sd:
        out["head"]["log_scale"] = _t(sd[f"{head}.log_scale"]).reshape(())
    scales = []
    for s in range(64):
        k = f"{head}.scales.{s}.scale"
        if k not in sd:
            break
        scales.append(np.asarray(_t(sd[k])).reshape(()))
    if scales:
        out["head"]["scales"] = np.stack(scales)

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
