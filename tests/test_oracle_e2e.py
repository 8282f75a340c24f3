"""End-to-end smoke: oracle training on the synthetic VOC fixture with a
tiny model — exercises data → model → solver → losses → eval → checkpoint."""

import numpy as np
import pytest

from coin_tpu.config import load_config
from coin_tpu.data import voc as voc_mod
from coin_tpu.data.voc import make_synthetic_voc
from coin_tpu.engine.oracle import OracleTrainer


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=6,
                       split="train")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=4,
                       split="val", seed=7)
    voc_mod.register_pascal_voc("synthtrain2", "synth/VOC2007", "train",
                                ("car", "person"), ".jpg")
    voc_mod.register_pascal_voc("synthval2", "synth/VOC2007", "val",
                                ("car", "person"), ".jpg")
    out = tmp_path_factory.mktemp("out")
    cfg = load_config()
    cfg.DATASETS.ROOT = str(root)
    cfg.DATASETS.TRAIN_UNLABEL = ["synthtrain2"]
    cfg.DATASETS.TEST = ["synthval2"]
    cfg.OUTPUT_DIR = str(out)
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.STEPS = [100]
    cfg.SOLVER.FACTOR_LIST = [1, 0.1]
    cfg.SOLVER.CHECKPOINT_PERIOD = 3
    cfg.TEST.EVAL_PERIOD = 1000
    cfg.INPUT.MIN_SIZE_TRAIN = 64
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE = 96
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.TEXT_LAYERS = 1
    cfg.TPU.TEXT_WIDTH = 32
    cfg.TPU.TEXT_HEADS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def trainer(cfg):
    return OracleTrainer(cfg)


def test_oracle_losses_finite_and_decreasing_steps(trainer):
    state = trainer.train(max_iter=3)
    assert int(state.step) == 3


def test_oracle_eval_runs(trainer):
    res = trainer.test()
    assert "AP50" in res
    assert 0.0 <= res["AP50"] <= 100.0


def test_checkpoint_roundtrip(trainer):
    trainer.checkpointer.save(trainer.state, int(trainer.state.step))
    restored = trainer.checkpointer.load_latest(trainer.state)
    assert int(restored.step) == int(trainer.state.step)
    a = np.asarray(
        next(iter(jax_leaves(trainer.state.params))), np.float32)
    b = np.asarray(next(iter(jax_leaves(restored.params))), np.float32)
    np.testing.assert_allclose(a, b)


def jax_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)
