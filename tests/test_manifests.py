"""Official-layout manifest tests (VERDICT r2 item 4): synthetic
checkpoints are built FROM the declared official key manifests
(models/manifests.py) — not from our converters' inverse — so any drift
between the converters' inferred key names and the official
GroundingDINO / CLIP state-dict layouts fails here.

Reference load sites: clean_state_dict (coin/engine/test.py:44-53),
CLIP download/split (coin/modeling/backbone/clip_backbone.py:70-140).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from coin_tpu.models import convert as CC
from coin_tpu.models import convert_gdino as CG
from coin_tpu.models import manifests as M


def _flat_shapes(tree):
    return {"/".join(map(str, k)): tuple(np.shape(v))
            for k, v in traverse_util.flatten_dict(tree).items()}


# --------------------------------------------------------------------- #
# CLIP RN50
# --------------------------------------------------------------------- #

def test_clip_converter_consumes_official_rn50_manifest():
    keys, bufs = M.clip_resnet_manifest(50)
    sd = M.RecordingDict(M.synth_state_dict(keys))
    backbone, res5, attnpool = CC.convert_clip_visual(sd)
    text = CC.convert_clip_text(sd)
    CC.logit_scale_from(sd)
    assert attnpool is not None
    missing = set(keys) - sd.accessed
    assert not missing, f"official keys never read: {sorted(missing)[:10]}"
    # buffers are not params and must not be required
    assert not (sd.accessed & bufs)


def test_clip_rn50_manifest_matches_flax_tree_shapes():
    """Converted official layout drops into our flax modules: every
    converted leaf matches the corresponding flax init shape."""
    from coin_tpu.models.clip_resnet import (AttentionPool2d,
                                             CLIPResNetBackbone, Res5Head)

    keys, _ = M.clip_resnet_manifest(50)
    sd = M.synth_state_dict(keys)
    backbone_p, res5_p, attnpool_p = CC.convert_clip_visual(sd)

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    bb = CLIPResNetBackbone(depth=50)
    init_bb = bb.init(jax.random.key(0), x)["params"]
    got, want = _flat_shapes(backbone_p), _flat_shapes(init_bb)
    assert got == want

    res5 = Res5Head(depth=50)
    feat = jnp.zeros((1, 8, 8, 1024), jnp.float32)
    init_r5 = res5.init(jax.random.key(0), feat)["params"]
    assert _flat_shapes(res5_p) == _flat_shapes(init_r5)

    ap = AttentionPool2d(embed_dim=2048, num_heads=32, output_dim=1024)
    pooled = jnp.zeros((1, 7, 7, 2048), jnp.float32)
    init_ap = ap.init(jax.random.key(0), pooled)["params"]
    assert _flat_shapes(attnpool_p) == _flat_shapes(init_ap)


# --------------------------------------------------------------------- #
# GroundingDINO
# --------------------------------------------------------------------- #

def test_gdino_converter_consumes_official_manifest():
    keys, bufs = M.gdino_manifest("swinT", enc_layers=1, dec_layers=1,
                                  num_queries=16, bert_layers=2)
    non_bert = {k for k in keys if not k.startswith("bert.")}
    sd = M.RecordingDict(M.synth_state_dict(keys))
    CG.convert_gdino(sd, variant="swinT", enc_layers=1, dec_layers=1)
    missing = non_bert - sd.accessed
    assert not missing, f"official keys never read: {sorted(missing)[:10]}"
    assert not (sd.accessed & bufs)


def test_gdino_manifest_matches_flax_tree_shapes():
    from coin_tpu.models.gdino import GroundingDINO

    keys, _ = M.gdino_manifest("swinT", enc_layers=1, dec_layers=1,
                               num_queries=16, bert_layers=2)
    sd = M.synth_state_dict(keys)
    params = CG.convert_gdino(sd, variant="swinT", enc_layers=1,
                              dec_layers=1)

    model = GroundingDINO(variant="swinT", num_queries=16, enc_layers=1,
                          dec_layers=1)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    emb = jnp.zeros((1, 12, 768), jnp.float32)
    mask = jnp.ones((1, 12), bool)
    init = model.init(jax.random.key(0), img, emb, mask)["params"]
    assert _flat_shapes(params) == _flat_shapes(init)


def test_bert_manifest_matches_installed_transformers():
    """The bert.* section of the manifest must equal the REAL HF
    BertModel state dict (the official text tower GroundingDINO embeds)
    — verified against the installed transformers package, so this is
    pinned by official code, not by our own replica."""
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=30522, hidden_size=768,
                     num_hidden_layers=2, num_attention_heads=12,
                     intermediate_size=3072)
    official = {f"bert.{k}": tuple(v.shape)
                for k, v in BertModel(cfg).state_dict().items()}
    keys, bufs = M.bert_manifest(layers=2)
    # modern transformers may drop the position_ids buffer; params must
    # match exactly, buffers may be a superset
    official_params = {k: v for k, v in official.items() if k not in bufs}
    assert official_params == keys


def test_gdino_full_scale_manifest_counts():
    """swinB 6/6 full-scale manifest: parameter count equals the
    published GroundingDINO-B total (~233M params incl. BERT)."""
    keys, _ = M.gdino_manifest("swinB")
    n_params = sum(int(np.prod(s)) for s in keys.values())
    assert 200e6 < n_params < 260e6, n_params


def test_clip_rn50_manifest_counts():
    """RN50 CLIP total parameter count ≈ 102M (38.3M visual + 63M
    text/other; published model card)."""
    keys, _ = M.clip_resnet_manifest(50)
    n = sum(int(np.prod(s)) for s in keys.values())
    assert 95e6 < n < 110e6, n


def test_frozen_manifest_files_match_generator():
    """The committed manifests_data/*.keys.txt stay in sync with the
    generator (regenerate via tools/dump_manifests.py)."""
    import os
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "coin_tpu", "models",
        "manifests_data")
    targets = {
        "clip_rn50.keys.txt": M.clip_resnet_manifest(50),
        "gdino_swinb_cogcoor.keys.txt": M.gdino_manifest("swinB"),
    }
    for name, (keys, bufs) in targets.items():
        lines = [f"{k} {tuple(s)}" for k, s in sorted(keys.items())]
        lines += [f"{k} [buffer]" for k in sorted(bufs)]
        want = "\n".join(lines) + "\n"
        got = open(os.path.join(base, name)).read()
        assert got == want, f"{name} drifted — rerun tools/dump_manifests.py"
