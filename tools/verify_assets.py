#!/usr/bin/env python
"""Real-asset on-ramp: verify user-supplied checkpoints/artifacts against
this framework's converters and forward paths, one command, clear
pass/fail per asset (VERDICT round-1 item 6; reference bar:
/root/reference/README.md:145-172 model zoo + docs/Environment.md).

  python tools/verify_assets.py \
      [--clip RN50.pt] [--clip-bpe bpe_simple_vocab_16e6.txt.gz] \
      [--gdino groundingdino_swinb_cogcoor.pth] [--glip glip_large.pth] \
      [--bert-vocab vocab.txt] [--variant-gdino swinB] [--variant-glip swinL] \
      [--pckl detections.pckl --dataset foggyval_0.02 --root $DETECTRON2_DATASETS] \
      [--classes car,person,...]

Checks (each only when its asset is given):
  clip   — convert the OpenAI CLIP pickle (visual+text), run one
           CLIPScorer forward (RoIAlign+attnpool+cosine) on a dummy image
  gdino  — convert a GroundingDINO .pth (official key names), build the
           in-checkpoint BERT, run one detector forward with real captions
  glip   — same for a GLIP .pth
  pckl   — ingest a reference-format detections.pckl and report VOC mAP
           against the given dataset's GT (cross-check vs the reference's
           own evaluator output)

Exit code: number of FAILED checks.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DEFAULT_CLASSES = ("person", "rider", "car", "truck", "bus", "train",
                   "motorcycle", "bicycle")   # cityscapes/foggy 8-class


def _result(name, ok, detail=""):
    print(f"[{'PASS' if ok else 'FAIL'}] {name}" +
          (f": {detail}" if detail else ""))
    return ok


def check_clip(path, bpe, classes):
    import jax.numpy as jnp
    import numpy as np

    from coin_tpu.config import load_config
    cfg = load_config()

    # key-layout audit vs the official OpenAI manifest
    from coin_tpu.models import manifests as M
    from coin_tpu.models.convert import load_torch_state_dict
    sd_keys = set(load_torch_state_dict(path))
    mkeys, mbufs = M.clip_resnet_manifest(cfg.MODEL.RESNETS.DEPTH)
    manifest_note = _manifest_note(M.diff_keys(sd_keys, mkeys, mbufs))
    cfg.TPU.CLIP_WEIGHTS = path
    cfg.TPU.CLIP_BPE_VOCAB = bpe
    cfg.DATASETS.STYLE_NAME = "realistic"
    from coin_tpu.engine.cloud_factory import build_clip_scorer
    scorer = build_clip_scorer(cfg, classes)
    imgs = jnp.zeros((1, 224, 224, 3), jnp.uint8)
    boxes = jnp.asarray([[[10.0, 10.0, 100.0, 100.0]]])
    probs = np.asarray(scorer(imgs, boxes))
    assert probs.shape == (1, 1, len(classes) + 1), probs.shape
    assert np.isfinite(probs).all() and abs(probs.sum() - 1.0) < 1e-3

    # also: the detector-side import path (CLIPDET backbone init)
    from coin_tpu.engine.clip_setup import load_clip_into_variables
    from coin_tpu.models.detector import OpenVocabularyRCNN
    import jax
    model = OpenVocabularyRCNN(num_classes=len(classes), depth=cfg.MODEL
                               .RESNETS.DEPTH)
    toks = jnp.zeros((len(classes) + 1, 77), jnp.int32).at[:, 0].set(1)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3)), toks,
                           jnp.asarray([[[0, 0, 32, 32]]], jnp.float32))
    _, report = load_clip_into_variables(variables, path,
                                         cfg.MODEL.RESNETS.DEPTH)
    return f"scorer probs ok; backbone load: {report}; {manifest_note}"


def _manifest_note(diff):
    miss, unexp = diff["missing"], diff["unexpected"]
    if not miss and not unexp:
        return "keys == official manifest"
    return (f"manifest diff: {len(miss)} missing "
            f"(e.g. {miss[:3]}), {len(unexp)} unexpected "
            f"(e.g. {unexp[:3]})")


def check_gdino(path, vocab, variant, classes, enc=6, dec=6):
    import jax.numpy as jnp
    import numpy as np

    from coin_tpu.config import load_config
    cfg = load_config()
    cfg.MODEL.TEACHER_CLOUD.WEIGHT = path
    cfg.MODEL.TEACHER_CLOUD.TYPE = variant
    cfg.TPU.BERT_VOCAB = vocab
    cfg.TPU.GDINO_ENC_LAYERS = enc
    cfg.TPU.GDINO_DEC_LAYERS = dec

    # key-layout audit against the declared official manifest BEFORE
    # converting, so a drifted layout is reported, not crashed on
    import torch
    from coin_tpu.models import manifests as M
    from coin_tpu.models.convert_gdino import clean_state_dict
    sd = torch.load(path, map_location="cpu")
    sd = clean_state_dict(sd.get("model", sd))
    bert_layers = len({k.split(".")[3] for k in sd
                       if k.startswith("bert.encoder.layer.")})
    keys, bufs = M.gdino_manifest(variant, enc_layers=enc,
                                  dec_layers=dec,
                                  num_queries=sd[
                                      "transformer.tgt_embed.weight"
                                  ].shape[0],
                                  bert_layers=bert_layers)
    note = _manifest_note(M.diff_keys(sd.keys(), keys, bufs))

    from coin_tpu.engine.cloud_factory import build_cloud_detector
    det = build_cloud_detector(cfg, "GDINO", classes)
    imgs = jnp.zeros((1, 256, 256, 3), jnp.uint8)
    hw = jnp.asarray([[256.0, 256.0]])
    out = det(imgs, hw)
    n = int(np.asarray(out.valid).sum())
    assert np.isfinite(np.asarray(out.boxes)).all()
    return f"forward ok, {n} detections above threshold; {note}"


def check_glip(path, vocab, variant, classes):
    import jax.numpy as jnp
    import numpy as np

    from coin_tpu.config import load_config
    cfg = load_config()
    cfg.MODEL.TEACHER_CLOUD.WEIGHT = path
    cfg.MODEL.TEACHER_CLOUD.TYPE = variant
    cfg.TPU.BERT_VOCAB = vocab

    # key-layout audit against the declared official manifest BEFORE
    # converting, so a drifted layout is reported, not crashed on
    import torch
    from coin_tpu.models import manifests as M
    from coin_tpu.models.convert_gdino import clean_state_dict
    sd = torch.load(path, map_location="cpu")
    sd = clean_state_dict(sd.get("model", sd))
    blocks = 1 + max((int(k.split("dyhead_tower.")[1].split(".")[0])
                      for k in sd if "dyhead_tower." in k),
                     default=23) // 3
    keys, bufs = M.glip_manifest(variant, num_blocks=blocks)
    note = _manifest_note(M.diff_keys(sd.keys(), keys, bufs))

    from coin_tpu.engine.cloud_factory import build_cloud_detector
    det = build_cloud_detector(cfg, "GLIP", classes)
    imgs = jnp.zeros((1, 256, 256, 3), jnp.uint8)
    hw = jnp.asarray([[256.0, 256.0]])
    out = det(imgs, hw)
    n = int(np.asarray(out.valid).sum())
    assert np.isfinite(np.asarray(out.boxes)).all()
    return f"forward ok, {n} detections above threshold; {note}"


def check_pckl(path, dataset, root):
    from coin_tpu.data.voc import get_dataset, load_voc_instances
    from coin_tpu.evaluation.dump import evaluate_pkl
    spec = get_dataset(dataset)
    records = load_voc_instances(os.path.join(root, spec.dirname),
                                 spec.split, spec.class_names,
                                 spec.image_ext)
    res = evaluate_pkl(path, records, spec.class_names)
    return (f"mAP50={res['AP50']:.2f} AP={res['AP']:.2f} over "
            f"{len(records)} images — compare against the reference "
            "evaluator's printout for the same pickle")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clip")
    p.add_argument("--clip-bpe")
    p.add_argument("--gdino")
    p.add_argument("--glip")
    p.add_argument("--bert-vocab")
    p.add_argument("--variant-gdino", default="swinB")
    p.add_argument("--variant-glip", default="swinL")
    p.add_argument("--gdino-enc", type=int, default=6)
    p.add_argument("--gdino-dec", type=int, default=6)
    p.add_argument("--pckl")
    p.add_argument("--dataset")
    p.add_argument("--root", default=os.environ.get(
        "DETECTRON2_DATASETS", "datasets"))
    p.add_argument("--classes",
                   help="comma-separated class names "
                        "(default: cityscapes 8-class)")
    args = p.parse_args(argv)

    classes = (tuple(args.classes.split(",")) if args.classes
               else DEFAULT_CLASSES)
    checks = []
    if args.clip:
        if not args.clip_bpe:
            p.error("--clip needs --clip-bpe (BPE vocab .txt.gz)")
        checks.append(("clip", lambda: check_clip(args.clip,
                                                  args.clip_bpe, classes)))
    if args.gdino:
        if not args.bert_vocab:
            p.error("--gdino needs --bert-vocab")
        checks.append(("gdino", lambda: check_gdino(
            args.gdino, args.bert_vocab, args.variant_gdino, classes,
            enc=args.gdino_enc, dec=args.gdino_dec)))
    if args.glip:
        if not args.bert_vocab:
            p.error("--glip needs --bert-vocab")
        checks.append(("glip", lambda: check_glip(
            args.glip, args.bert_vocab, args.variant_glip, classes)))
    if args.pckl:
        if not args.dataset:
            p.error("--pckl needs --dataset")
        checks.append(("pckl", lambda: check_pckl(args.pckl, args.dataset,
                                                  args.root)))
    if not checks:
        p.error("nothing to verify — pass at least one asset flag")

    failed = 0
    for name, fn in checks:
        try:
            detail = fn()
            _result(name, True, detail)
        except Exception as e:
            traceback.print_exc()
            _result(name, False, f"{type(e).__name__}: {e}")
            failed += 1
    return failed


if __name__ == "__main__":
    sys.exit(main())
