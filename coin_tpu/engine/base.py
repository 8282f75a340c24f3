"""Shared trainer base (replaces coin/engine/base.py BASE_Trainer): model
construction + param partitioning, loaders, evaluation, checkpointing and
the generic train loop scaffolding."""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.data.loader import TestLoader, TrainLoader
from coin_tpu.engine import pipelines
from coin_tpu.engine.checkpoint import Checkpointer
from coin_tpu.engine.common import MetricLogger, simple_class_tokens
from coin_tpu.engine.evaluator import evaluate_detector
from coin_tpu.engine.state import (default_freeze_predicate, merge_params,
                                   partition_params)
from coin_tpu.models.detector import OpenVocabularyRCNN
from coin_tpu.solver import build_optimizer

logger = logging.getLogger(__name__)


def pipeline_config_from(cfg, num_classes: int) -> pipelines.PipelineConfig:
    m = cfg.MODEL
    return pipelines.PipelineConfig(
        num_classes=num_classes,
        rpn_batch_size=m.RPN.BATCH_SIZE_PER_IMAGE,
        rpn_positive_fraction=m.RPN.POSITIVE_FRACTION,
        rpn_thresholds=tuple(m.RPN.IOU_THRESHOLDS),
        rpn_nms_thresh=m.RPN.NMS_THRESH,
        pre_nms_topk_train=m.RPN.PRE_NMS_TOPK_TRAIN,
        post_nms_topk_train=m.RPN.POST_NMS_TOPK_TRAIN,
        pre_nms_topk_test=m.RPN.PRE_NMS_TOPK_TEST,
        post_nms_topk_test=m.RPN.POST_NMS_TOPK_TEST,
        roi_batch_size=m.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_positive_fraction=m.ROI_HEADS.POSITIVE_FRACTION,
        roi_iou_threshold=m.ROI_HEADS.IOU_THRESHOLDS[0],
        pooler_resolution=m.ROI_BOX_HEAD.POOLER_RESOLUTION,
        test_score_thresh=m.ROI_HEADS.SCORE_THRESH_TEST,
        test_nms_thresh=m.ROI_HEADS.NMS_THRESH_TEST,
        test_topk=cfg.TEST.DETECTIONS_PER_IMAGE,
        bg_weight=(cfg.CLOUD.CLASSES_WEIGHT[-1]
                   if cfg.CLOUD.CLASSES_WEIGHT else 1.0),
        loss_type=cfg.CLOUD.LOSS_TYPE,
        classes_weight=(tuple(cfg.CLOUD.CLASSES_WEIGHT)
                        if cfg.CLOUD.CLASSES_WEIGHT else None),
        bg_train=cfg.CLOUD.BG_TRAIN,
        cls_agnostic_bbox_reg=m.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
    )


def loss_weights_from(cfg) -> Dict[str, float]:
    c = cfg.CLOUD
    return {
        "loss_box_reg": c.LOSS_BOX_REG_WEIGHT,
        "loss_box_reg_offline": c.LOSS_BOX_REG_OFFLINE_WEIGHT,
        "loss_box_reg_online": c.LOSS_BOX_REG_ONLINE_WEIGHT,
        "loss_cls": c.LOSS_CLS_WEIGHT,
        "loss_text_align": c.LOSS_TEXT_ALIGN_WEIGHT,
        "loss_distillation": c.LOSS_DISTILLATION_WEIGHT,
        "loss_cls_b": c.LOSS_CLS_B_WEIGHT,
        "loss_rpn_distillation": c.LOSS_DISTILLATION_WEIGHT,
        "loss_rpn_cls": cfg.MODEL.RPN.LOSS_WEIGHT,
        "loss_rpn_loc": (cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT
                         * cfg.MODEL.RPN.LOSS_WEIGHT),
    }


def auto_scale_workers(cfg, num_workers: int):
    """detectron2 ``DefaultTrainer.auto_scale_workers`` parity (SURVEY
    §2.8; called by every reference trainer ctor, e.g.
    coin/engine/trainer.py:50): when ``SOLVER.REFERENCE_WORLD_SIZE`` is
    set and differs from the actual worker count, rescale the global
    batch linearly and LR/schedule accordingly so a config written for
    N workers trains equivalently on M. Returns a new cfg; a no-op at
    the reference value 0. ``num_workers`` here is the global device
    count (the TPU-mesh analog of detectron2's #GPUs)."""
    old = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if old == 0 or old == num_workers:
        return cfg
    cfg = cfg.clone()
    scale = num_workers / old
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = int(
        round(cfg.SOLVER.IMG_PER_BATCH_UNLABEL * scale))
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = [int(round(s / scale)) for s in cfg.SOLVER.STEPS]
    cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
    cfg.SOLVER.CHECKPOINT_PERIOD = int(
        round(cfg.SOLVER.CHECKPOINT_PERIOD / scale))
    cfg.SOLVER.REFERENCE_WORLD_SIZE = num_workers
    logger.info("auto_scale_workers: %d -> %d workers (batch %d, lr %g, "
                "max_iter %d)", old, num_workers,
                cfg.SOLVER.IMG_PER_BATCH_UNLABEL, cfg.SOLVER.BASE_LR,
                cfg.SOLVER.MAX_ITER)
    return cfg


class DetectorTrainerBase:
    """Builds the detector + partitioned params + optimizer + loaders."""

    def __init__(self, cfg, class_tokens: Optional[np.ndarray] = None,
                 train_loader: Optional[TrainLoader] = None):
        import jax as _jax
        cfg = auto_scale_workers(cfg, _jax.device_count())
        self.cfg = cfg
        root = cfg.DATASETS.ROOT
        train_name = cfg.DATASETS.TRAIN_UNLABEL[0]
        self.train_loader = train_loader or TrainLoader(
            train_name, root, batch_size=cfg.SOLVER.IMG_PER_BATCH_UNLABEL,
            seed=cfg.SEED, min_size=cfg.INPUT.MIN_SIZE_TRAIN,
            max_size=cfg.INPUT.MAX_SIZE)
        self.num_classes = len(self.train_loader.spec.class_names)
        if class_tokens is not None:
            self.class_tokens = class_tokens
            self.clip_tokenizer = None
        else:
            from coin_tpu.engine.clip_setup import setup_clip_assets
            self.class_tokens, self.clip_tokenizer = setup_clip_assets(
                cfg, self.train_loader.spec.class_names)
        import jax.numpy as _jnp
        compute_dtype = {"bfloat16": _jnp.bfloat16,
                         "float32": _jnp.float32}[
            cfg.get_path("TPU.COMPUTE_DTYPE", "bfloat16")]
        self.model = OpenVocabularyRCNN(
            num_classes=self.num_classes,
            depth=cfg.MODEL.RESNETS.DEPTH,
            pooling=cfg.MODEL.ROI_HEADS.POOLING_TYPE,
            add_prompt_num=cfg.CLOUD.ADD_PROMPT_NUM,
            text_layers=cfg.get_path("TPU.TEXT_LAYERS", 12),
            text_width=cfg.get_path("TPU.TEXT_WIDTH", 512),
            text_heads=cfg.get_path("TPU.TEXT_HEADS", 8),
            compute_dtype=compute_dtype,
            scan_blocks=cfg.get_path("TPU.SCAN_BLOCKS", False),
            box_reg_classes=(1 if cfg.MODEL.ROI_BOX_HEAD
                             .CLS_AGNOSTIC_BBOX_REG else self.num_classes),
            quant_train_res5=(
                0 if not cfg.get_path("TPU.INT8_TRAIN", False)
                else (4 if not cfg.get_path("TPU.INT8_TRAIN_DGRAD",
                                            True)
                      else 3 if cfg.get_path("TPU.INT8_TRAIN_SCALE",
                                             "tensor") == "sample"
                      else 1 if cfg.get_path("TPU.INT8_TRAIN_WGRAD",
                                             True)
                      else 2)),
            quant_roi=cfg.get_path("TPU.INT8_ROI", False),
        )
        self.pcfg = pipeline_config_from(cfg, self.num_classes)
        self.loss_weights = loss_weights_from(cfg)
        self.checkpointer = Checkpointer(cfg.OUTPUT_DIR)
        self.metrics = MetricLogger(
            cfg.OUTPUT_DIR, cfg.SOLVER.MAX_ITER,
            tensorboard=cfg.get_path("TPU.TENSORBOARD", False))

        # data-parallel mesh: params replicated, batch dim sharded; XLA
        # inserts gradient psums (SURVEY §2.8 TPU-native equivalent of DDP).
        # Mesh size = largest divisor of the batch ≤ the device count, so
        # odd batch/device combinations degrade gracefully.
        from coin_tpu.parallel import mesh_utils
        import jax as _jax
        n_dev = len(_jax.devices())
        batch = cfg.SOLVER.IMG_PER_BATCH_UNLABEL
        n = max(d for d in range(1, min(n_dev, batch) + 1)
                if batch % d == 0)
        self.mesh = mesh_utils.data_mesh(n)
        self._dp = n > 1

    def shard_batch(self, tree):
        """Device-put batch-leading arrays onto the data axis."""
        if not self._dp:
            return tree
        from coin_tpu.parallel import mesh_utils
        return mesh_utils.shard_batch(self.mesh, tree)

    def replicate_state(self, state):
        if not self._dp:
            return state
        from coin_tpu.parallel import mesh_utils
        return mesh_utils.replicate(self.mesh, state)

    def init_variables(self):
        canvas = self.train_loader.canvas_hw
        dummy = jnp.zeros((1, *canvas, 3), jnp.float32)
        rois = jnp.asarray([[[0, 0, 32, 32]]], jnp.float32)
        variables = self.model.init(jax.random.key(self.cfg.SEED), dummy,
                                    jnp.asarray(self.class_tokens), rois)
        clip_path = self.cfg.get_path("TPU.CLIP_WEIGHTS", "")
        if clip_path:
            from coin_tpu.engine.clip_setup import load_clip_into_variables
            variables, _ = load_clip_into_variables(
                variables, clip_path, self.cfg.MODEL.RESNETS.DEPTH,
                region_clip_path=self.cfg.get_path(
                    "TPU.REGION_CLIP_WEIGHTS", ""))
        return variables

    def init_prototypes(self, variables) -> jnp.ndarray:
        """Template-mean prototypes when CLIP assets are configured,
        otherwise the learnable-prompt features at init."""
        if self.clip_tokenizer is not None:
            from coin_tpu.engine.clip_setup import template_prototypes
            encode = jax.jit(lambda t: self.model.apply(
                variables, t, method="encode_text"))
            names = list(self.train_loader.spec.class_names) \
                + ["background"]
            return jnp.asarray(template_prototypes(
                encode, self.clip_tokenizer, names,
                self.cfg.DATASETS.STYLE_NAME or "realistic"))
        return self.model.apply(variables, jnp.asarray(self.class_tokens),
                                method="text_features")

    def split_params(self, variables):
        return partition_params(
            variables,
            default_freeze_predicate(
                self.cfg.CLOUD.UPDATE_BACKBONE,
                freeze_at=self.cfg.MODEL.BACKBONE.FREEZE_AT))

    def build_optimizer(self, params):
        return build_optimizer(params, self.cfg)

    def evaluate(self, params, frozen) -> Dict[str, float]:
        import os
        # loader (XML parse + index) is config-determined: build once,
        # reuse across the periodic evals
        loader = getattr(self, "_eval_loader", None)
        if loader is None:
            loader = TestLoader(
                self.cfg.DATASETS.TEST[0], self.cfg.DATASETS.ROOT,
                batch_size=max(self.cfg.SOLVER.IMG_PER_BATCH_UNLABEL, 4),
                min_size=self.cfg.INPUT.MIN_SIZE_TEST,
                max_size=self.cfg.INPUT.MAX_SIZE,
                canvas_hw=self.train_loader.canvas_hw)
            self._eval_loader = loader
        variables = merge_params(params, frozen)
        save_pkl = (os.path.join(self.cfg.OUTPUT_DIR, "detections.pckl")
                    if self.cfg.get_path("TEST.SAVE_DETECTION_PKLS", False)
                    else None)
        # serving-path knob: dynamic-int8 convs at inference only (the
        # same trained variables load unchanged — Int8Conv quantizes on
        # the fly). Never affects training numerics.
        model = (self.model.clone(quant_convs=True)
                 if self.cfg.get_path("TPU.INT8_INFERENCE", False)
                 else self.model)
        return evaluate_detector(model, variables, loader,
                                 self.class_tokens, self.pcfg,
                                 save_pkl=save_pkl)
