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
