import os

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from coin_tpu.config import load_config
from coin_tpu.data.voc import make_synthetic_voc, load_voc_instances
from coin_tpu.data.loader import TestLoader, TrainLoader
from coin_tpu.data import voc as voc_mod
from coin_tpu.data.augment import preprocess_batch, normalize_batch
from coin_tpu.evaluation import VOCEvaluator
from coin_tpu.solver import (build_optimizer, two_stage_lr_schedule,
                             lr_multiplier_for_path)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=6)
    voc_mod.register_pascal_voc("synthtrain", "synth/VOC2007", "train",
                                ("car", "person"), ".jpg")
    return str(root)


def test_voc_parsing(synth_root):
    recs = load_voc_instances(os.path.join(synth_root, "synth/VOC2007"),
                              "train", ("car", "person"), ".jpg")
    assert len(recs) == 6
    assert all(len(r["boxes"]) >= 1 for r in recs)
    # 1-based → 0-based conversion
    assert recs[0]["boxes"].min() >= 0


def test_train_loader_batches(synth_root):
    loader = TrainLoader("synthtrain", synth_root, batch_size=2, seed=0,
                         min_size=100, max_size=200)
    it = iter(loader)
    b = next(it)
    assert b.images.shape[0] == 2
    assert b.images.shape[1] % 32 == 0 and b.images.shape[2] % 32 == 0
    assert b.gt_boxes.shape[1:] == (64, 4)
    # gt boxes inside canvas
    assert b.gt_boxes[b.gt_valid].max() <= max(b.images.shape[1:3])


def test_test_loader_covers_all(synth_root):
    loader = TestLoader("synthtrain", synth_root, batch_size=4,
                        min_size=100, max_size=200)
    total = 0
    for batch, n_valid in loader:
        assert batch.images.shape[0] == 4
        total += n_valid
    assert total == 6


def test_device_augment_shapes(rng):
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8))
    flip = jnp.asarray([True, False])
    strong, weak = preprocess_batch(imgs, flip, jax.random.key(0))
    assert strong.shape == weak.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(strong)).all()
    # flip applied identically to both views
    w0 = np.asarray(normalize_batch(imgs))[0, :, ::-1]
    np.testing.assert_allclose(np.asarray(weak)[0], w0, atol=1e-5)


def test_two_stage_lr_schedule_matches_reference():
    sched = two_stage_lr_schedule(1.0, [10, 20, 30], [1, 0.1, 0.5, 0.1],
                                  warmup_iters=4, warmup_factor=0.5)
    # warmup: factor = 0.5*(1-a)+a at step 1 → a=0.25 → 0.625
    np.testing.assert_allclose(float(sched(1)), 0.625, rtol=1e-6)
    np.testing.assert_allclose(float(sched(5)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(15)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(35)), 0.1, rtol=1e-6)


def test_lr_multiplier_later_key_overrides():
    overrides = {"backbone": 0.1, "backbone/layer4": 1.0,
                 "logit_scale": 0.0}
    assert lr_multiplier_for_path("backbone/layer1/conv", overrides) == 0.1
    assert lr_multiplier_for_path("backbone/layer4/conv", overrides) == 1.0
    assert lr_multiplier_for_path("predictor/logit_scale", overrides) == 0.0
    assert lr_multiplier_for_path("rpn_head/conv", overrides) == 1.0


def test_optimizer_applies_multipliers():
    import optax
    cfg = load_config()
    cfg.SOLVER.PER_MODULE_PARAM_WEIGHT = [{"frozen": 0.0}]
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = [100]
    cfg.SOLVER.FACTOR_LIST = [1, 0.1]
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.MOMENTUM = 0.0
    params = {"a": jnp.ones(3), "frozen": {"w": jnp.ones(3)}}
    tx, _ = build_optimizer(params, cfg)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["a"]).sum()) > 0
    assert float(jnp.abs(updates["frozen"]["w"]).sum()) == 0.0


def test_voc_evaluator_perfect_predictions():
    ev = VOCEvaluator(["car", "person"])
    gt = np.array([[10, 10, 50, 50], [60, 60, 100, 100]], np.float32)
    cls = np.array([0, 1])
    ev.process("img0", gt, np.array([0.9, 0.8]), cls, gt, cls)
    res = ev.evaluate()
    assert res["AP50"] == 100.0
    assert res["AP"] == 100.0


def test_voc_evaluator_partial():
    ev = VOCEvaluator(["car"])
    gt = np.array([[10, 10, 50, 50], [60, 60, 100, 100]], np.float32)
    pred = np.array([[10, 10, 50, 50], [200, 200, 240, 240]], np.float32)
    ev.process("img0", pred, np.array([0.9, 0.8]), np.array([0, 0]),
               gt, np.array([0, 0]))
    res = ev.evaluate()
    # one TP of two gts, one FP: AP50 = 50 (precision envelope)
    assert 49.0 < res["AP50"] < 51.0


def test_schedule_host_mirror_matches_device():
    """schedule.host (pure-python LR for logging) must equal the traced
    jnp schedule at every phase: warmup, each milestone factor, end."""
    from coin_tpu.solver.build import two_stage_lr_schedule
    s = two_stage_lr_schedule(0.02, [10, 20, 30], [1, 0.1, 0.5, 0.01],
                              warmup_iters=5, warmup_factor=0.001)
    for step in [0, 1, 4, 5, 9, 10, 11, 19, 20, 29, 30, 50]:
        np.testing.assert_allclose(s.host(step), float(s(step)),
                                   rtol=1e-6, err_msg=str(step))
