"""Integration: the real collection machinery end-to-end with a
random-weight tiny GroundingDINO + flax BERT + WordPiece tokenizer —
tokenize caption → BERT → GDINO forward → postprocess → fusion NMS →
RCNN/RPN views → ResultStore → CLIP re-scoring pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coin_tpu.data import voc as voc_mod
from coin_tpu.data.loader import TestLoader
from coin_tpu.data.voc import make_synthetic_voc
from coin_tpu.engine.collect import collect_cloud, rescore_with_clip
from coin_tpu.models.gdino import GroundingDINO
from coin_tpu.models.gdino_detector import GDINODetector
from coin_tpu.models.wordpiece import WordPieceTokenizer

CLASSES = ("car", "person")


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("bert") / "vocab.txt"
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "car", "person",
             "a", "b", "c"]
    path.write_text("\n".join(words) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def loader(tmp_path_factory):
    root = tmp_path_factory.mktemp("cdata")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=3,
                       split="train")
    voc_mod.register_pascal_voc("colsynth", "synth/VOC2007", "train",
                                CLASSES, ".jpg")
    return TestLoader("colsynth", str(root), batch_size=3, min_size=64,
                      max_size=96)


def test_collect_with_real_gdino_machinery(vocab_file, loader):
    tok = WordPieceTokenizer(vocab_file)
    model = GroundingDINO(variant="swinT", num_queries=16, enc_layers=1,
                          dec_layers=1)

    # tiny random "BERT": embedding lookup into 768 dims (stands in for
    # FlaxBertModel's last_hidden_state; the HF model itself is parity-
    # tested separately)
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(32, 768).astype(np.float32) * 0.1)

    def bert_apply(ids, mask):
        return jnp.take(table, jnp.clip(ids, 0, 31), axis=0)

    # init GDINO params with the real caption token shapes
    _, ids, _ = __import__(
        "coin_tpu.models.gdino_detector", fromlist=["x"]
    ).build_captions_and_spans(CLASSES, tok)
    t = len(ids)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    embeds = jnp.zeros((1, t, 768), jnp.float32)
    mask = jnp.ones((1, t), bool)
    params = model.init(jax.random.key(0), img, embeds, mask)["params"]

    det = GDINODetector(model, params, bert_apply, CLASSES, tok,
                        threshold=0.0, capacity=16)
    store = collect_cloud(det, loader, len(CLASSES), nms_method="ms",
                          rcnn_thresh=0.0, rpn_thresh=0.0)
    assert len(store) == 3
    view = store.get_view(store.image_ids()[0], "RCNN")
    assert view["probs"].shape[-1] == len(CLASSES) + 1
    # detections live in original-image coordinates
    if len(view["boxes"]):
        assert view["boxes"].max() <= 200.0

    # CLIP re-scoring with a stand-in scorer (the real CLIPScorer is
    # parity-tested; here we validate the pass plumbing)
    def scorer_apply(images_u8, boxes):
        b, n, _ = boxes.shape
        key = jax.random.key(1)
        logits = jax.random.normal(key, (b, n, len(CLASSES) + 1))
        return jax.nn.softmax(logits, axis=-1)

    clip_store = rescore_with_clip(scorer_apply, store, loader,
                                   capacity=16)
    assert len(clip_store) == 3
    v2 = clip_store.get_view(clip_store.image_ids()[0], "RCNN")
    # re-scored classes/scores consistent with probs
    if len(v2["probs"]):
        np.testing.assert_array_equal(v2["classes"],
                                      v2["probs"].argmax(-1))


def test_cloud_live_eval_trainer(tmp_path_factory):
    """GDINO_test with NO collect store runs the cloud model live over
    the val split and reports VOC mAP (reference GDINOTrainer.test,
    coin/engine/test.py:72-102) — here with the synthetic rehearsal
    teacher (TPU.SYNTHETIC_TEACHER)."""
    from coin_tpu.config import load_config
    from coin_tpu.engine.test import (CloudLiveEvalTrainer,
                                      build_eval_trainer)

    root = tmp_path_factory.mktemp("livedata")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=3,
                       split="val", seed=11)
    voc_mod.register_pascal_voc("livesynthval", "synth/VOC2007", "val",
                                CLASSES, ".jpg")
    cfg = load_config()
    cfg.DATASETS.ROOT = str(root)
    cfg.DATASETS.TEST = ["livesynthval"]
    cfg.INPUT.TEACHER_CLOUD.MIN_SIZE_TEST = 64
    cfg.INPUT.TEACHER_CLOUD.MAX_SIZE_TEST = 96
    cfg.TPU.SYNTHETIC_TEACHER = True
    tr = build_eval_trainer(cfg, "GDINO_test")
    assert isinstance(tr, CloudLiveEvalTrainer)
    res = tr.test()
    assert "AP50" in res and np.isfinite(res["AP50"])


def test_eval_trainer_dispatch_store_vs_live(tmp_path):
    """build_eval_trainer: a present COLLECT_FILE store → StoreEvalTrainer;
    absent → CloudLiveEvalTrainer (one-shot live val eval)."""
    from coin_tpu.config import load_config
    from coin_tpu.engine.results_store import ResultStore
    from coin_tpu.engine.test import (CloudLiveEvalTrainer,
                                      StoreEvalTrainer, build_eval_trainer)

    cfg = load_config()
    cfg.CLOUD.COLLECT_FILE = ""
    assert isinstance(build_eval_trainer(cfg, "GLIP_test"),
                      CloudLiveEvalTrainer)

    store = ResultStore(num_classes=2)
    path = str(tmp_path / "collect.npz")
    store.save(path)
    cfg.CLOUD.COLLECT_FILE = path
    assert isinstance(build_eval_trainer(cfg, "GDINO_test"),
                      StoreEvalTrainer)


def test_pack_view_cap_keeps_top_scores_and_counts_overflow():
    """A crowded image overflowing the capacity must keep the
    HIGHEST-score boxes (stores carry no ordering guarantee) and count
    the overflow instead of truncating silently (VERDICT r2 item 8)."""
    import numpy as np
    from coin_tpu.engine.results_store import ResultStore

    store = ResultStore(num_classes=2)
    n, cap = 12, 4
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0, 50, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + 10
    scores = rng.permutation(n).astype(np.float32) / n  # shuffled ranks
    classes = np.arange(n, dtype=np.int32) % 2
    probs = np.tile(scores[:, None], (1, 3)).astype(np.float32)
    store.put("img0", "RCNN", boxes, classes, scores, probs)

    out = store.pack_view("img0", "RCNN", cap, scale=1.0, flip=False,
                          canvas_w=100.0)
    assert out["valid"].all()
    top = np.sort(scores)[-cap:]
    assert np.allclose(np.sort(out["scores"]), top)
    assert store._overflow == 1
    assert store._overflow_boxes == n - cap

    # under-capacity images don't count as overflow
    store.put("img1", "RCNN", boxes[:2], classes[:2], scores[:2],
              probs[:2])
    store.pack_view("img1", "RCNN", cap, 1.0, False, 100.0)
    assert store._overflow == 1
