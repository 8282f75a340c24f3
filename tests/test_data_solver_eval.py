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


def test_flip_geometry_mixed_sizes(tmp_path):
    """Regression: the loader flips the VALID canvas region (reference
    order — hflip before pad), so on a mixed-size dataset the flipped
    image content must stay left-aligned and match both the unflipped
    content mirrored within nw and the flipped gt boxes. A full-canvas
    flip would right-align the content while the boxes flip around nw,
    corrupting every flipped sample that does not fill the canvas."""
    root = tmp_path / "mix"
    make_synthetic_voc(str(root / "m/VOC2007"), num_images=4,
                       sizes=[(120, 160), (120, 100), (80, 160), (90, 90)])
    voc_mod.register_pascal_voc("mixflip", "m/VOC2007", "train",
                                ("car", "person"), ".jpg")
    loader = TrainLoader("mixflip", str(root), batch_size=4, seed=0,
                         min_size=60, max_size=120)
    idx = [0, 1, 2, 3]
    plain = loader.pack_batch(idx, np.zeros(4, bool))
    flip = loader.pack_batch(idx, np.ones(4, bool))
    colors = {0: np.array([60, 160, 220]), 1: np.array([220, 60, 60])}
    assert any(int(hw[1]) != plain.images.shape[2]
               for hw in plain.image_hw), "fixture must not fill canvas"
    for j in range(4):
        nh, nw = int(plain.image_hw[j][0]), int(plain.image_hw[j][1])
        # content mirrored within the valid region, padding untouched
        np.testing.assert_array_equal(
            flip.images[j, :nh, :nw], plain.images[j, :nh, :nw][:, ::-1])
        np.testing.assert_array_equal(
            flip.images[j, :, nw:], plain.images[j, :, nw:])
        # each flipped gt box still covers its class-colored rectangle
        for b in range(int(flip.gt_valid[j].sum())):
            x1, y1, x2, y2 = flip.gt_boxes[j, b]
            cls = int(flip.gt_classes[j, b])
            patch = flip.images[j, int(y1) + 2:int(y2) - 2,
                                int(x1) + 2:int(x2) - 2].reshape(-1, 3)
            assert len(patch) > 0
            err = np.abs(patch.astype(np.float32)
                         - colors[cls]).mean()
            assert err < 40, (j, b, err)


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
    strong, weak = preprocess_batch(imgs, jax.random.key(0))
    assert strong.shape == weak.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(strong)).all()
    # weak view is the plain normalization (flips happen in the loader)
    np.testing.assert_allclose(np.asarray(weak),
                               np.asarray(normalize_batch(imgs)),
                               atol=1e-5)


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
