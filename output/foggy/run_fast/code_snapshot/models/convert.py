"""OpenAI CLIP checkpoint → coin_tpu param pytree conversion.

The reference downloads CLIP RN50/RN101/RN50x4 torch archives at runtime
(coin/modeling/utils.py:344-389) and splits visual vs text state dicts
(clip_backbone.py:70-140). Here the same torch checkpoint (supplied by the
user — zero-egress environments can't download) is mapped mechanically
into the flax parameter trees of CLIPResNetBackbone / Res5Head /
AttentionPool2d / TextTransformer.

Layout notes:
- torch convs are (O, I, kH, kW) → flax (kH, kW, I, O).
- torch Linear weights are (O, I) → flax Dense kernels (I, O).
- attention in_proj (3D, D) splits into q/k/v kernels for
  nn.MultiHeadDotProductAttention: kernel (D, heads, head_dim).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _conv(w) -> np.ndarray:
    return _t(w).transpose(2, 3, 1, 0)


def _dense(w) -> np.ndarray:
    return _t(w).T


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
    return {k: v.float().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def _bn(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "weight": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
        "running_mean": _t(sd[f"{prefix}.running_mean"]),
        "running_var": _t(sd[f"{prefix}.running_var"]),
    }


def _bottleneck(sd, prefix) -> Dict[str, Any]:
    out = {
        "conv1": {"kernel": _conv(sd[f"{prefix}.conv1.weight"])},
        "bn1": _bn(sd, f"{prefix}.bn1"),
        "conv2": {"kernel": _conv(sd[f"{prefix}.conv2.weight"])},
        "bn2": _bn(sd, f"{prefix}.bn2"),
        "conv3": {"kernel": _conv(sd[f"{prefix}.conv3.weight"])},
        "bn3": _bn(sd, f"{prefix}.bn3"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        out["downsample_conv"] = {
            "kernel": _conv(sd[f"{prefix}.downsample.0.weight"])}
        out["downsample_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return out


def _stage(sd, prefix, blocks) -> Dict[str, Any]:
    return {str(i): _bottleneck(sd, f"{prefix}.{i}")
            for i in range(blocks)}


def convert_clip_visual(sd: Dict[str, np.ndarray], layers=(3, 4, 6, 3)
                        ) -> Tuple[Dict, Dict, Dict]:
    """Returns (backbone_params, res5_params, attnpool_params)."""
    v = "visual"
    backbone = {
        "conv1": {"kernel": _conv(sd[f"{v}.conv1.weight"])},
        "bn1": _bn(sd, f"{v}.bn1"),
        "conv2": {"kernel": _conv(sd[f"{v}.conv2.weight"])},
        "bn2": _bn(sd, f"{v}.bn2"),
        "conv3": {"kernel": _conv(sd[f"{v}.conv3.weight"])},
        "bn3": _bn(sd, f"{v}.bn3"),
        "layer1": _stage(sd, f"{v}.layer1", layers[0]),
        "layer2": _stage(sd, f"{v}.layer2", layers[1]),
        "layer3": _stage(sd, f"{v}.layer3", layers[2]),
    }
    res5 = {"layer4": _stage(sd, f"{v}.layer4", layers[3])}
    ap = f"{v}.attnpool"
    if f"{ap}.positional_embedding" not in sd:
        return backbone, res5, None
    attnpool = {
        "positional_embedding": _t(sd[f"{ap}.positional_embedding"]),
        "q_proj": {"kernel": _dense(sd[f"{ap}.q_proj.weight"]),
                   "bias": _t(sd[f"{ap}.q_proj.bias"])},
        "k_proj": {"kernel": _dense(sd[f"{ap}.k_proj.weight"]),
                   "bias": _t(sd[f"{ap}.k_proj.bias"])},
        "v_proj": {"kernel": _dense(sd[f"{ap}.v_proj.weight"]),
                   "bias": _t(sd[f"{ap}.v_proj.bias"])},
        "c_proj": {"kernel": _dense(sd[f"{ap}.c_proj.weight"]),
                   "bias": _t(sd[f"{ap}.c_proj.bias"])},
    }
    return backbone, res5, attnpool


def convert_clip_text(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """TextTransformer params from a CLIP state dict."""
    width = sd["ln_final.weight"].shape[0]
    heads = max(1, width // 64)
    head_dim = width // heads
    n_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks")})
    out: Dict[str, Any] = {
        "token_embedding": {"embedding": _t(sd["token_embedding.weight"])},
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": {"scale": _t(sd["ln_final.weight"]),
                     "bias": _t(sd["ln_final.bias"])},
        "text_projection": _t(sd["text_projection"]),
    }
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}"
        in_w = _t(sd[f"{p}.attn.in_proj_weight"])     # (3D, D)
        in_b = _t(sd[f"{p}.attn.in_proj_bias"])
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)

        def proj(w, b):
            return {"kernel": w.T.reshape(width, heads, head_dim),
                    "bias": b.reshape(heads, head_dim)}

        out[f"resblock_{i}"] = {
            "ln_1": {"scale": _t(sd[f"{p}.ln_1.weight"]),
                     "bias": _t(sd[f"{p}.ln_1.bias"])},
            "ln_2": {"scale": _t(sd[f"{p}.ln_2.weight"]),
                     "bias": _t(sd[f"{p}.ln_2.bias"])},
            "attn": {
                "query": proj(qw, qb),
                "key": proj(kw, kb),
                "value": proj(vw, vb),
                "out": {"kernel": _t(
                    sd[f"{p}.attn.out_proj.weight"]).T.reshape(
                        heads, head_dim, width),
                    "bias": _t(sd[f"{p}.attn.out_proj.bias"])},
            },
            "mlp_c_fc": {"kernel": _dense(sd[f"{p}.mlp.c_fc.weight"]),
                         "bias": _t(sd[f"{p}.mlp.c_fc.bias"])},
            "mlp_c_proj": {"kernel": _dense(sd[f"{p}.mlp.c_proj.weight"]),
                           "bias": _t(sd[f"{p}.mlp.c_proj.bias"])},
        }
    return out


def logit_scale_from(sd: Dict[str, np.ndarray]) -> float:
    return float(sd["logit_scale"])
