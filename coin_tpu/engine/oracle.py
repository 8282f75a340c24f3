"""OracleTrainer — supervised upper-bound training on GT labels.

The minimum end-to-end slice (SURVEY §7 step 5): exercises data → model →
solver → eval → checkpoint with none of the dual-teacher machinery.
Replaces coin/engine/oracle_train.py.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from coin_tpu.data.augment import preprocess_batch
from coin_tpu.data.loader import TestLoader, TrainLoader
from coin_tpu.engine import pipelines
from coin_tpu.engine.checkpoint import Checkpointer
from coin_tpu.engine.common import (MetricLogger, batch_gt_detections,
                                    simple_class_tokens)
from coin_tpu.engine.evaluator import evaluate_detector
from coin_tpu.engine.state import (TrainState, default_freeze_predicate,
                                   merge_params, partition_params)
from coin_tpu.models.detector import OpenVocabularyRCNN
from coin_tpu.parallel import mesh_utils
from coin_tpu.solver import build_optimizer

logger = logging.getLogger(__name__)


class OracleTrainer:
    def __init__(self, cfg, class_tokens: Optional[np.ndarray] = None,
                 data_root: Optional[str] = None):
        self.cfg = cfg
        root = data_root or cfg.DATASETS.ROOT
        train_name = cfg.DATASETS.TRAIN_UNLABEL[0]
        self.train_loader = TrainLoader(
            train_name, root, batch_size=cfg.SOLVER.IMG_PER_BATCH_UNLABEL,
            seed=cfg.SEED, min_size=cfg.INPUT.MIN_SIZE_TRAIN,
            max_size=cfg.INPUT.MAX_SIZE)
        self.num_classes = len(self.train_loader.spec.class_names)
        self.class_tokens = (class_tokens if class_tokens is not None
                             else simple_class_tokens(self.num_classes + 1))

        self.model = OpenVocabularyRCNN(
            num_classes=self.num_classes,
            depth=cfg.MODEL.RESNETS.DEPTH,
            pooling=cfg.MODEL.ROI_HEADS.POOLING_TYPE,
            text_layers=cfg.get_path("TPU.TEXT_LAYERS", 12),
            text_width=cfg.get_path("TPU.TEXT_WIDTH", 512),
            text_heads=cfg.get_path("TPU.TEXT_HEADS", 8),
        )
        self.pcfg = pipeline_config_from(cfg, self.num_classes)

        rng = jax.random.key(cfg.SEED)
        canvas = self.train_loader.canvas_hw
        dummy_imgs = jnp.zeros((1, *canvas, 3), jnp.float32)
        dummy_rois = jnp.asarray([[[0, 0, 32, 32]]], jnp.float32)
        variables = self.model.init(rng, dummy_imgs,
                                    jnp.asarray(self.class_tokens),
                                    dummy_rois)
        params, frozen = partition_params(
            variables, default_freeze_predicate(cfg.CLOUD.UPDATE_BACKBONE))
        self.tx, self.schedule = build_optimizer(params, cfg)
        self.state = TrainState(
            params=params, frozen=frozen, opt_state=self.tx.init(params),
            step=jnp.asarray(0), rng=jax.random.key(cfg.SEED + 1))
        self.checkpointer = Checkpointer(cfg.OUTPUT_DIR)
        self.metrics = MetricLogger(cfg.OUTPUT_DIR, cfg.SOLVER.MAX_ITER)
        self.mesh = mesh_utils.data_mesh()
        self._train_step = self._build_train_step()
        self.ap_50 = {}

    def _build_train_step(self):
        model = self.model
        pcfg = self.pcfg
        tokens = jnp.asarray(self.class_tokens)
        tx = self.tx

        @jax.jit
        def train_step(state: TrainState, images_u8, image_hw, flip,
                       gt_boxes, gt_classes, gt_valid):
            rng, rng_aug, rng_step = jax.random.split(state.rng, 3)
            strong, _ = preprocess_batch(images_u8, flip, rng_aug)
            from coin_tpu.structures import Detections
            gt = Detections(boxes=gt_boxes,
                            scores=jnp.ones_like(gt_classes, jnp.float32),
                            classes=gt_classes, valid=gt_valid, probs=None)

            def loss_fn(params):
                variables = merge_params(params, state.frozen)
                losses = pipelines.oracle_train_losses(
                    model, variables, strong, image_hw, gt, tokens,
                    rng_step, pcfg)
                return sum(losses.values()), losses

            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=params, opt_state=opt_state,
                                      step=state.step + 1, rng=rng)
            return new_state, losses

        return train_step

    def train(self, max_iter: Optional[int] = None):
        max_iter = max_iter or self.cfg.SOLVER.MAX_ITER
        it = iter(self.train_loader)
        start = int(self.state.step)
        for i in range(start, max_iter):
            batch = next(it)
            self.state, losses = self._train_step(
                self.state, jnp.asarray(batch.images),
                jnp.asarray(batch.image_hw), jnp.asarray(batch.flip),
                jnp.asarray(batch.gt_boxes), jnp.asarray(batch.gt_classes),
                jnp.asarray(batch.gt_valid))
            self.metrics.log(i, {k: float(v) for k, v in losses.items()})
            if (i + 1) % self.cfg.TEST.EVAL_PERIOD == 0:
                res = self.test()
                self.ap_50[i] = res["AP50"]
            if (i + 1) % self.cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                self.checkpointer.save(self.state, i + 1)
        return self.state

    def test(self) -> Dict[str, float]:
        loader = TestLoader(
            self.cfg.DATASETS.TEST[0], self.cfg.DATASETS.ROOT,
            batch_size=max(self.cfg.SOLVER.IMG_PER_BATCH_UNLABEL, 4),
            min_size=self.cfg.INPUT.MIN_SIZE_TEST,
            max_size=self.cfg.INPUT.MAX_SIZE,
            canvas_hw=self.train_loader.canvas_hw)
        variables = merge_params(self.state.params, self.state.frozen)
        return evaluate_detector(self.model, variables, loader,
                                 self.class_tokens, self.pcfg)

    def resume_or_load(self, resume: bool = False):
        if resume:
            self.state = self.checkpointer.load_latest(self.state)


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
        bg_train=cfg.CLOUD.BG_TRAIN,
    )
