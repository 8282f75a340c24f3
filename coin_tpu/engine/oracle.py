"""OracleTrainer — supervised upper-bound training on GT labels.

The minimum end-to-end slice (SURVEY §7 step 5): exercises data → model →
solver → eval → checkpoint with none of the dual-teacher machinery.
Replaces coin/engine/oracle_train.py.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from coin_tpu.data.augment import preprocess_batch
from coin_tpu.engine import pipelines
from coin_tpu.engine.base import DetectorTrainerBase
from coin_tpu.engine.common import lr_value
from coin_tpu.engine.state import TrainState, jit_train_step, merge_params
from coin_tpu.structures import Detections

logger = logging.getLogger(__name__)


class OracleTrainer(DetectorTrainerBase):
    def __init__(self, cfg, class_tokens: Optional[np.ndarray] = None,
                 data_root: Optional[str] = None):
        if data_root:
            cfg = cfg.clone()
            cfg.DATASETS.ROOT = data_root
        super().__init__(cfg, class_tokens)
        variables = self.init_variables()
        params, frozen = self.split_params(variables)
        self.tx, self.schedule = self.build_optimizer(params)
        self.state = TrainState(
            params=params, frozen=frozen, opt_state=self.tx.init(params),
            step=jnp.asarray(0), rng=jax.random.key(cfg.SEED + 1))
        self.state = self.replicate_state(self.state)
        self._train_step = self._build_train_step()
        self.ap_50 = {}

    def _build_train_step(self):
        model = self.model
        pcfg = self.pcfg
        tokens = jnp.asarray(self.class_tokens)
        tx = self.tx

        @jit_train_step
        def train_step(state: TrainState, images_u8, image_hw,
                       gt_boxes, gt_classes, gt_valid):
            rng, rng_aug, rng_step = jax.random.split(state.rng, 3)
            strong, _ = preprocess_batch(images_u8, rng_aug)
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
            arrays = self.shard_batch((
                jnp.asarray(batch.images), jnp.asarray(batch.image_hw),
                jnp.asarray(batch.gt_boxes),
                jnp.asarray(batch.gt_classes),
                jnp.asarray(batch.gt_valid)))
            self.state, losses = self._train_step(self.state, *arrays)
            # device scalars: materialized only at the logger's flush
            metrics = dict(losses)
            if i % self.metrics.period == 0:
                metrics["lr"] = lr_value(self.schedule, i)
            self.metrics.log(i, metrics)
            if (i + 1) % self.cfg.TEST.EVAL_PERIOD == 0:
                self.ap_50[i] = self.test()["AP50"]
            if (i + 1) % self.cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                self.checkpointer.save(self.state, i + 1)
        self.metrics.close()
        return self.state

    def test(self) -> Dict[str, float]:
        return self.evaluate(self.state.params, self.state.frozen)

    def resume_or_load(self, resume: bool = False):
        if resume:
            self.state = self.checkpointer.load_latest(self.state)


# re-exported for callers that used the local helper
from coin_tpu.engine.base import pipeline_config_from  # noqa: E402,F401
