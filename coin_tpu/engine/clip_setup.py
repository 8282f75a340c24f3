"""CLIP asset integration: tokenize class prompts, load OpenAI CLIP
weights into the detector tree, compute template-mean prototypes.

Covers the runtime-download + embedding path of the reference
(coin/modeling/utils.py:344-389 download, clip_backbone.py weight split,
clip_text.py:262-279 template prototypes). Zero-egress environments supply
the checkpoint + BPE vocab as files (cfg TPU.CLIP_WEIGHTS /
TPU.CLIP_BPE_VOCAB).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from coin_tpu.models import convert as C
from coin_tpu.models.tokenizer import ClipTokenizer

logger = logging.getLogger(__name__)

# Style-conditioned prompt templates with the same structure as the
# reference's MODIFIED_REGION_CLIP_TEMPLATES (coin/modeling/utils.py:
# 415-497; derived from the public RegionCLIP prompt set): each takes
# ({style}, {class}).
PROMPT_TEMPLATES: List[str] = [
    "There is a {1} in the {0} scene.",
    "There is the {1} in the {0} scene.",
    "a photo of a {1} in the {0} scene.",
    "a photo of the {1} in the {0} scene.",
    "a photo of one {1} in the {0} scene.",
    "itap of a {1} in the {0} style.",
    "itap of my {1} in the {0} style.",
    "itap of the {1} in the {0} style.",
    "a photo of a {1} in the {0} style.",
    "a photo of my {1} in the {0} style.",
    "a photo of the {1} in the {0} style.",
    "a photo of many {1} in the {0} style.",
    "a good photo of a {1} in the {0} style.",
    "a good photo of the {1} in the {0} style.",
    "a bad photo of a {1} in the {0} style.",
    "a bad photo of the {1} in the {0} style.",
    "a photo of a nice {1} in the {0} style.",
    "a photo of the nice {1} in the {0} style.",
    "a photo of a cool {1} in the {0} style.",
    "a photo of the cool {1} in the {0} style.",
    "a photo of a weird {1} in the {0} style.",
    "a photo of the weird {1} in the {0} style.",
    "a photo of a small {1} in the {0} style.",
    "a photo of the small {1} in the {0} style.",
    "a photo of a large {1} in the {0} style.",
    "a photo of the large {1} in the {0} style.",
    "a photo of a clean {1} in the {0} style.",
    "a photo of the clean {1} in the {0} style.",
    "a photo of a dirty {1} in the {0} style.",
    "a photo of the dirty {1} in the {0} style.",
    "a bright photo of a {1} in the {0} style.",
    "a bright photo of the {1} in the {0} style.",
    "a dark photo of a {1} in the {0} style.",
    "a dark photo of the {1} in the {0} style.",
    "a photo of a hard to see {1} in the {0} style.",
    "a photo of the hard to see {1} in the {0} style.",
    "a low resolution photo of a {1} in the {0} style.",
    "a low resolution photo of the {1} in the {0} style.",
    "a cropped photo of a {1} in the {0} style.",
    "a cropped photo of the {1} in the {0} style.",
    "a close-up photo of a {1} in the {0} style.",
    "a close-up photo of the {1} in the {0} style.",
    "a jpeg corrupted photo of a {1} in the {0} style.",
    "a jpeg corrupted photo of the {1} in the {0} style.",
    "a blurry photo of a {1} in the {0} style.",
    "a blurry photo of the {1} in the {0} style.",
    "a pixelated photo of a {1} in the {0} style.",
    "a pixelated photo of the {1} in the {0} style.",
    "a black and white photo of the {1} in the {0} style.",
    "a black and white photo of a {1} in the {0} style.",
    "a plastic {1} in the {0} style.",
    "the plastic {1} in the {0} style.",
    "a toy {1} in the {0} style.",
    "the toy {1} in the {0} style.",
    "a plushie {1} in the {0} style.",
    "the plushie {1} in the {0} style.",
    "a cartoon {1} in the {0} style.",
    "the cartoon {1} in the {0} style.",
    "an embroidered {1} in the {0} style.",
    "the embroidered {1} in the {0} style.",
    "a painting of the {1} in the {0} style.",
    "a painting of a {1} in the {0} style.",
]


def build_class_tokens(class_names: Sequence[str], tokenizer: ClipTokenizer,
                       add_prompt_num: int = 4) -> np.ndarray:
    """Tokenized learnable-prompt rows 'a photo of a X..X {cls}.' per class
    incl. background (clip_text.py:281-291). One-word class names only."""
    for n in class_names:
        assert " " not in n, "only one-word class names are supported"
    ctx = " ".join(["X"] * add_prompt_num)
    prompts = [f"a photo of a {ctx} {n}." for n in class_names]
    return tokenizer.tokenize(prompts)


def template_prototypes(encode_text, tokenizer: ClipTokenizer,
                        class_names: Sequence[str], style: str,
                        batch: int = 64) -> np.ndarray:
    """Per-class prototype = mean text feature over the style templates
    (clip_text.py:262-279), L2-normalized."""
    protos = []
    for name in class_names:
        texts = [t.replace("{0}", style).replace("{1}", name)
                 for t in PROMPT_TEMPLATES]
        tokens = tokenizer.tokenize(texts)
        feats = []
        for s in range(0, len(tokens), batch):
            feats.append(np.asarray(encode_text(
                jnp.asarray(tokens[s:s + batch]))))
        f = np.concatenate(feats, 0).mean(0)
        protos.append(f)
    p = np.stack(protos)
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def load_clip_into_variables(variables: Dict, clip_path: str,
                             depth: int = 50,
                             region_clip_path: str = "") -> Tuple[Dict,
                                                                  float]:
    """Overwrite backbone/res5/attnpool/text_trunk params with converted
    CLIP weights; returns (variables, logit_scale).

    When ``region_clip_path`` is given, visual weights come from a
    RegionCLIP checkpoint ('backbone.*' keys) and text weights from its
    'lang_encoder.*' keys (MODEL.REGION_CLIP path, clip_backbone.py:
    108-125 + clip_text.py:122-135); the OpenAI checkpoint still provides
    logit_scale."""
    sd = C.load_torch_state_dict(clip_path)
    if region_clip_path:
        rsd = C.load_torch_state_dict(region_clip_path)
        remapped = {}
        for k, v in rsd.items():
            if k.startswith("backbone."):
                remapped["visual." + k[len("backbone."):]] = v
            elif k.startswith("lang_encoder."):
                remapped[k[len("lang_encoder."):]] = v
        remapped["logit_scale"] = sd["logit_scale"]
        sd = remapped
    from coin_tpu.models.clip_resnet import DEPTH_CFG, stack_stage_params
    layers = DEPTH_CFG[depth]["layers"]
    backbone, res5, attnpool = C.convert_clip_visual(sd, layers)
    text = C.convert_clip_text(sd)

    # TPU.SCAN_BLOCKS model: restack the converter's unrolled per-block
    # trees into the lax.scan layout before merging
    model_bb = variables["params"].get("backbone", {})
    if any("scan" in model_bb.get(f"layer{i}", {}) for i in (1, 2, 3)):
        backbone = dict(backbone)
        for i in (1, 2, 3):
            backbone[f"layer{i}"] = stack_stage_params(
                backbone[f"layer{i}"], layers[i - 1])
    if "scan" in variables["params"].get("res5", {}).get("layer4", {}):
        res5 = {"layer4": stack_stage_params(res5["layer4"], layers[3])}

    params = dict(variables["params"])
    flat = traverse_util.flatten_dict(params)
    updates = {}
    for tree, prefix in ((backbone, ("backbone",)), (res5, ("res5",)),
                         (text, ("text_trunk",))):
        for k, v in traverse_util.flatten_dict(tree).items():
            updates[prefix + k] = jnp.asarray(v)
    if any(k[0] == "attnpool" for k in flat):
        for k, v in traverse_util.flatten_dict(attnpool).items():
            updates[("attnpool",) + k] = jnp.asarray(v)
    missing = [k for k in updates if k not in flat]
    if missing:
        logger.warning("CLIP load: %d keys missing in model: %s...",
                       len(missing), missing[:5])
    flat.update({k: v for k, v in updates.items() if k in flat})
    logger.info("loaded %d CLIP tensors", len(updates) - len(missing))
    return ({"params": traverse_util.unflatten_dict(flat)},
            C.logit_scale_from(sd))


def setup_clip_assets(cfg, class_names: Sequence[str]):
    """Returns (class_tokens, tokenizer) from config, or synthetic tokens
    when no vocab is configured."""
    vocab = cfg.get_path("TPU.CLIP_BPE_VOCAB", "")
    if not vocab:
        from coin_tpu.engine.common import simple_class_tokens
        return simple_class_tokens(len(class_names) + 1), None
    tok = ClipTokenizer(vocab)
    names = list(class_names)
    if names[-1] != "background":
        # 'backgroud' [sic] matches the reference's extra class name
        names = names + ["background"]
    return build_class_tokens(names, tok,
                              cfg.CLOUD.ADD_PROMPT_NUM), tok
