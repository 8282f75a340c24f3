"""Cloud-teacher construction from user-supplied checkpoints (the
build_model factory surface of coin/modeling/meta_arch/build.py:22-78 for
the cloud side): GroundingDINO / GLIP / GDINO-1.5-API detectors and the
frozen CLIP zero-shot scorer, plus zero-asset synthetic stand-ins used by
pipeline rehearsals and tests."""

from __future__ import annotations

import os


def build_synthetic_detector(class_names):
    """Random-weight tiny GroundingDINO through the REAL collection
    machinery (tokenize caption → embed → GDINO forward → postprocess).
    Zero-asset rehearsal only — detections are meaningless."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coin_tpu.models.gdino import GroundingDINO
    from coin_tpu.models.gdino_detector import (GDINODetector,
                                                build_captions_and_spans)
    from coin_tpu.models.wordpiece import WordPieceTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "."]
    for name in class_names:
        words += name.lower().split()
    vocab = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
    vocab.write("\n".join(dict.fromkeys(words)) + "\n")
    vocab.close()
    tok = WordPieceTokenizer(vocab.name)

    model = GroundingDINO(variant="swinT", num_queries=64, enc_layers=1,
                          dec_layers=1)
    table = jnp.asarray(np.random.RandomState(0).randn(64, 768)
                        .astype(np.float32) * 0.1)

    def bert_apply(ids, mask):
        return jnp.take(table, jnp.clip(ids, 0, 63), axis=0)

    _, ids, _ = build_captions_and_spans(class_names, tok)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    embeds = jnp.zeros((1, len(ids), 768), jnp.float32)
    mask = jnp.ones((1, len(ids)), bool)
    params = model.init(jax.random.key(0), img, embeds, mask)["params"]
    return GDINODetector(model, params, bert_apply, class_names, tok,
                         threshold=0.0, capacity=64)


def build_stub_scorer(num_classes):
    """Softmax over random logits — stands in for the CLIP scorer in
    --synthetic-teacher rehearsals."""
    import jax

    def scorer_apply(images_u8, boxes):
        b, n, _ = boxes.shape
        logits = jax.random.normal(jax.random.key(1),
                                   (b, n, num_classes + 1))
        return jax.nn.softmax(logits, axis=-1)

    return scorer_apply


def build_cloud_detector(cfg, arch, class_names):
    import jax
    import jax.numpy as jnp

    if arch in ("GDINO", "GDINO_CLASSONLY"):
        import torch

        from coin_tpu.models.convert_gdino import (
            bert_params_from_checkpoint, convert_gdino)
        from coin_tpu.models.gdino import GroundingDINO
        from coin_tpu.models.gdino_detector import GDINODetector
        from coin_tpu.models.gdino_variants import ClassOnlyAdapter
        from coin_tpu.models.wordpiece import WordPieceTokenizer

        weight = cfg.MODEL.TEACHER_CLOUD.WEIGHT
        vocab = cfg.get_path("TPU.BERT_VOCAB", "")
        if not (weight and os.path.exists(weight)):
            raise FileNotFoundError(
                f"GDINO checkpoint not found: {weight!r} "
                "(set MODEL.TEACHER_CLOUD.WEIGHT)")
        if not (vocab and os.path.exists(vocab)):
            raise FileNotFoundError(
                "BERT vocab.txt not found (set TPU.BERT_VOCAB)")
        sd = torch.load(weight, map_location="cpu")
        sd = sd.get("model", sd)
        variant = cfg.MODEL.TEACHER_CLOUD.TYPE
        # layer-count knobs: full official geometry by default; the
        # verify_assets CI drill uses reduced towers to keep the
        # one-command real-asset rehearsal fast on CPU
        enc = cfg.get_path("TPU.GDINO_ENC_LAYERS", 6)
        dec = cfg.get_path("TPU.GDINO_DEC_LAYERS", 6)
        # query count comes from the checkpoint itself (official = 900;
        # reduced drills ship fewer); tolerate the 'module.' prefix
        nq = next(v for k, v in sd.items()
                  if k.endswith("transformer.tgt_embed.weight")).shape[0]
        model = GroundingDINO(variant=variant, num_queries=nq,
                              enc_layers=enc, dec_layers=dec,
                              dtype=jnp.bfloat16)
        params = jax.tree.map(jnp.asarray, convert_gdino(
            {k: v.numpy() for k, v in sd.items()}, variant,
            enc_layers=enc, dec_layers=dec))
        bert, bert_params = bert_params_from_checkpoint(
            {k: v for k, v in sd.items()})

        def bert_apply(ids, mask):
            return bert.module.apply(
                {"params": bert_params}, ids, mask)[0]

        tok = WordPieceTokenizer(vocab)
        det = GDINODetector(
            model, params, bert_apply, class_names, tok,
            threshold=cfg.MODEL.TEACHER_CLOUD.TEST_THRESHOLD,
            per_class_test=cfg.MODEL.TEACHER_CLOUD.get(
                "PER_CLASS_TEST", False),
            type_filter=cfg.MODEL.TEACHER_CLOUD.get(
                "USE_DINO_TYPE_FILTER", False))
        if arch == "GDINO_CLASSONLY":
            det = ClassOnlyAdapter(det, len(class_names))
        return det
    if arch in ("GLIP", "GLIPModel"):
        import torch

        from coin_tpu.models.convert_glip import (bert_params_from_glip,
                                                  convert_glip)
        from coin_tpu.models.glip import GLIP
        from coin_tpu.models.glip_detector import GLIPDetector
        from coin_tpu.models.wordpiece import WordPieceTokenizer

        weight = cfg.MODEL.TEACHER_CLOUD.WEIGHT
        vocab = cfg.get_path("TPU.BERT_VOCAB", "")
        if not (weight and os.path.exists(weight)):
            raise FileNotFoundError(
                f"GLIP checkpoint not found: {weight!r} "
                "(set MODEL.TEACHER_CLOUD.WEIGHT)")
        if not (vocab and os.path.exists(vocab)):
            raise FileNotFoundError(
                "BERT vocab.txt not found (set TPU.BERT_VOCAB)")
        sd = torch.load(weight, map_location="cpu")
        sd = sd.get("model", sd)
        variant = cfg.MODEL.TEACHER_CLOUD.TYPE
        # tower depth from the checkpoint itself (official interleave:
        # 3 tower slots per conv block — VLFuse, BertEncoderLayer,
        # DyConv); GLIP-T/L ship 8 blocks = indices 0..23
        blocks = 1 + max(
            (int(k.split("dyhead_tower.")[1].split(".")[0])
             for k in sd if "dyhead_tower." in k),
            default=23) // 3
        model = GLIP(variant=variant, num_blocks=blocks,
                     dtype=jnp.bfloat16)
        params = jax.tree.map(jnp.asarray, convert_glip(
            {k: v.numpy() for k, v in sd.items()}, variant,
            num_blocks=blocks))
        bert, bert_params = bert_params_from_glip(sd)

        def bert_apply(ids, mask):
            return bert.module.apply(
                {"params": bert_params}, ids, mask)[0]

        tok = WordPieceTokenizer(vocab)
        return GLIPDetector(
            model, params, bert_apply, class_names, tok,
            threshold=cfg.MODEL.TEACHER_CLOUD.TEST_THRESHOLD)
    if arch == "GDINO1_5_API":
        from coin_tpu.models.gdino_variants import GDINO15APIDetector
        return GDINO15APIDetector(cfg.MODEL.TEACHER_CLOUD.get("TOKEN", ""),
                                  class_names)
    raise ValueError(f"unsupported cloud architecture: {arch}")


def build_clip_scorer(cfg, class_names):
    import jax
    import jax.numpy as jnp

    from coin_tpu.engine.clip_setup import template_prototypes
    from coin_tpu.models import convert as C
    from coin_tpu.models.clip_scorer import CLIPScorer
    from coin_tpu.models.clip_resnet import DEPTH_CFG
    from coin_tpu.models.text_encoder import TextTransformer
    from coin_tpu.models.tokenizer import ClipTokenizer

    clip_path = cfg.get_path("TPU.CLIP_WEIGHTS", "")
    vocab = cfg.get_path("TPU.CLIP_BPE_VOCAB", "")
    if not (clip_path and os.path.exists(clip_path)):
        raise FileNotFoundError("TPU.CLIP_WEIGHTS missing for re-scoring")
    depth = cfg.MODEL.RESNETS.DEPTH
    sd = C.load_torch_state_dict(clip_path)
    backbone, res5, attnpool = C.convert_clip_visual(
        sd, DEPTH_CFG[depth]["layers"])
    scorer = CLIPScorer(depth=depth, compute_dtype=jnp.bfloat16)
    params = {"backbone": backbone, "res5": res5, "attnpool": attnpool}
    params = jax.tree.map(jnp.asarray, params)
    logit_scale = C.logit_scale_from(sd)

    # frozen text features: template-mean prototypes incl background
    text_params = C.convert_clip_text(sd)
    trunk = TextTransformer(embed_dim=sd["text_projection"].shape[1],
                            width=sd["ln_final.weight"].shape[0])
    tok = ClipTokenizer(vocab)
    encode = jax.jit(lambda t: trunk.apply(
        {"params": jax.tree.map(jnp.asarray, text_params)}, t))
    names = list(class_names) + ["background"]
    proto = template_prototypes(encode, tok, names,
                                cfg.DATASETS.STYLE_NAME or "realistic")
    text_features = jnp.asarray(proto)

    from coin_tpu.data.augment import normalize_batch

    @jax.jit
    def scorer_apply(images_u8, boxes):
        images = normalize_batch(images_u8)
        return scorer.apply({"params": params}, images, boxes,
                            text_features, jnp.asarray(logit_scale))

    return scorer_apply
