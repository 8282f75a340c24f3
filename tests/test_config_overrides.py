"""CLI KEY VALUE override parsing (config.merge_from_list): yacs-style
literals plus the yaml fallback for bareword lists/scalars."""

import pytest

from coin_tpu.config import load_config


def test_literal_and_yaml_overrides():
    cfg = load_config(None, [
        "SOLVER.MAX_ITER", "123",
        "SOLVER.BASE_LR", "0.5",
        "DATASETS.TEST", "[foggyval_0.02]",          # yaml fallback
        "CLOUD.CLASSES_WEIGHT", "[1.0, 1.0, 0.9]",   # literal list
        "TPU.CACHE_TEACHER", "false",                 # yaml bool
        "DATASETS.STYLE_NAME", "foggy cityscapes style",  # plain string
    ])
    assert cfg.SOLVER.MAX_ITER == 123
    assert cfg.SOLVER.BASE_LR == 0.5
    assert cfg.DATASETS.TEST == ["foggyval_0.02"]
    assert cfg.CLOUD.CLASSES_WEIGHT == [1.0, 1.0, 0.9]
    assert cfg.get_path("TPU.CACHE_TEACHER") is False
    assert cfg.DATASETS.STYLE_NAME == "foggy cityscapes style"


def test_odd_override_rejected():
    with pytest.raises(AssertionError, match="odd override"):
        load_config(None, ["SOLVER.MAX_ITER"])


def test_auto_scale_workers():
    """detectron2 DefaultTrainer.auto_scale_workers parity: linear
    batch/LR scaling, inverse-linear schedule scaling, no-op at the
    default REFERENCE_WORLD_SIZE=0 (reference: coin trainers all call
    it at ctor, coin/engine/trainer.py:50)."""
    from coin_tpu.engine.base import auto_scale_workers

    cfg = load_config()
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 2
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 6
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.MAX_ITER = 1000
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.STEPS = [400, 800]
    cfg.TEST.EVAL_PERIOD = 200
    cfg.SOLVER.CHECKPOINT_PERIOD = 500
    out = auto_scale_workers(cfg, 4)
    assert out.SOLVER.IMG_PER_BATCH_UNLABEL == 12
    assert out.SOLVER.BASE_LR == pytest.approx(0.02)
    assert out.SOLVER.MAX_ITER == 500
    assert out.SOLVER.WARMUP_ITERS == 50
    assert out.SOLVER.STEPS == [200, 400]
    assert out.TEST.EVAL_PERIOD == 100
    assert out.SOLVER.CHECKPOINT_PERIOD == 250
    assert out.SOLVER.REFERENCE_WORLD_SIZE == 4
    # the input cfg is untouched (clone semantics)
    assert cfg.SOLVER.IMG_PER_BATCH_UNLABEL == 6
    # no-op cases return the SAME cfg
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 0
    assert auto_scale_workers(cfg, 4) is cfg
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 4
    assert auto_scale_workers(cfg, 4) is cfg
