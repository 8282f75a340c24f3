"""Two-stage batch-scaled recipe (foggy_fast_b6.yaml +
foggy_fast_b6_s2.yaml, scripts/GDINO/final/targetDET_fast_b6.sh):
stage 1 trains the cached step_one phase at a larger per-chip batch,
stage 2 --resumes the SAME TrainState at the parity batch for the live
step_two phase. The hand-off must preserve the full state (student,
optimizer momentum, EMA teacher, CKG merge net, step counter) across
the batch change — the reference crosses burn-up inside one run
(trainer.py:169-209), so stage 2 must be that crossing, not a restart.
"""

import numpy as np
import pytest

from coin_tpu.config import load_config
from coin_tpu.data import voc as voc_mod
from coin_tpu.data.voc import load_voc_instances, make_synthetic_voc
from tests.test_adaptation_e2e import synth_store


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=6,
                       split="train")
    make_synthetic_voc(str(root / "synth/VOC2007"), num_images=4,
                       split="val", seed=7)
    voc_mod.register_pascal_voc("tsbtrain", "synth/VOC2007", "train",
                                ("car", "person"), ".jpg")
    voc_mod.register_pascal_voc("tsbval", "synth/VOC2007", "val",
                                ("car", "person"), ".jpg")
    records = load_voc_instances(str(root / "synth/VOC2007"), "train",
                                 ("car", "person"), ".jpg")
    store = synth_store(records, num_classes=2)

    cfg = load_config()
    cfg.DATASETS.ROOT = str(root)
    cfg.DATASETS.TRAIN_UNLABEL = ["tsbtrain"]
    cfg.DATASETS.TEST = ["tsbval"]
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.STEPS = [100]
    cfg.SOLVER.FACTOR_LIST = [1, 0.1]
    cfg.SOLVER.CHECKPOINT_PERIOD = 3
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
    cfg.MODEL.MERGE_DIM = 1024
    cfg.TPU.TEXT_LAYERS = 1
    cfg.TPU.TEXT_WIDTH = 32
    cfg.TPU.TEXT_HEADS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.CAP_TEACHER = 8
    cfg.CLOUD.BURN_UP_STEP = 3          # stage 1 is all step_one
    cfg.CLOUD.PROTOTYPE_UPDATE_START = 1
    cfg.CLOUD.CLASSES_WEIGHT = [1.0, 1.0, 0.9]
    return cfg, store


def test_stage2_resume_continues_state_across_batch_change(
        setup, tmp_path):
    import jax

    from coin_tpu.engine.trainer import CoinTrainer

    cfg, store = setup
    # ---- stage 1: cached step_one phase at batch 2 ----
    cfg1 = cfg.clone()
    cfg1.OUTPUT_DIR = str(tmp_path)
    cfg1.SOLVER.IMG_PER_BATCH_UNLABEL = 2
    tr1 = CoinTrainer(cfg1, store=store)
    s1 = tr1.train()                     # saves checkpoint at step 3
    assert int(s1.step) == 3

    # ---- stage 2: --resume at batch 1, live phase (step >= burn_up) ----
    cfg2 = cfg.clone()
    cfg2.OUTPUT_DIR = str(tmp_path)      # same run directory
    cfg2.SOLVER.IMG_PER_BATCH_UNLABEL = 1
    cfg2.SOLVER.MAX_ITER = 5
    tr2 = CoinTrainer(cfg2, store=store)
    tr2.resume_or_load(resume=True)
    assert int(tr2.state.step) == 3      # continued, not restarted

    # full-state continuity: student, EMA teacher, merge net, momentum
    for name, a, b in (
            ("params", tr2.state.params, s1.params),
            ("teacher", tr2.state.teacher_params, s1.teacher_params),
            ("merge", tr2.state.merge_params, s1.merge_params),
            ("opt", tr2.state.opt_state, s1.opt_state)):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb), name
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       err_msg=name)

    teacher_before = np.asarray(jax.tree_util.tree_leaves(
        tr2.state.teacher_params)[0])
    s2 = tr2.train()
    assert int(s2.step) == 5
    # the live phase ran: EMA moved the offline teacher off its stage-1
    # value (rate 0.9996, so the delta is small but nonzero)
    teacher_after = np.asarray(jax.tree_util.tree_leaves(
        s2.teacher_params)[0])
    assert not np.array_equal(teacher_before, teacher_after)
    assert np.isfinite(teacher_after).all()
