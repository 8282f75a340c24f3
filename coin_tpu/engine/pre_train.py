"""PRETrainer — knowledge-dissemination stage (replaces
coin/engine/pre_train.py): train CLIPDET from cached cloud pseudo-labels.
Both the strong and the weak view are trained (run_step :178-211); the
cached RCNN/RPN views arrive pre-packed on the batch (set_boxes :213-236
is now loader-side)."""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from coin_tpu.data.augment import preprocess_batch
from coin_tpu.data.loader import TrainLoader
from coin_tpu.engine import coin_pipelines
from coin_tpu.engine.base import DetectorTrainerBase
from coin_tpu.engine.common import lr_value
from coin_tpu.engine.results_store import ResultStore
from coin_tpu.engine.state import Prototypes, TrainState, jit_train_step
from coin_tpu.structures import Detections

logger = logging.getLogger(__name__)


def online_view_to_detections(view: Dict[str, np.ndarray]) -> Detections:
    return Detections(
        boxes=jnp.asarray(view["boxes"]),
        scores=jnp.asarray(view["scores"]),
        classes=jnp.asarray(view["classes"]),
        valid=jnp.asarray(view["valid"]),
        probs=jnp.asarray(view["probs"]),
    )


class PRETrainer(DetectorTrainerBase):
    def __init__(self, cfg, store: Optional[ResultStore] = None,
                 class_tokens: Optional[np.ndarray] = None):
        from coin_tpu.engine.base import auto_scale_workers
        import jax as _jax
        cfg = auto_scale_workers(cfg, _jax.device_count())
        if store is None:
            store = self._load_store(cfg)
        root = cfg.DATASETS.ROOT
        clipart = tuple(cfg.DATASETS.TRAIN_UNLABEL) == ("cliparttrain",)
        loader = TrainLoader(
            cfg.DATASETS.TRAIN_UNLABEL[0], root,
            batch_size=cfg.SOLVER.IMG_PER_BATCH_UNLABEL, seed=cfg.SEED,
            min_size=cfg.INPUT.MIN_SIZE_TRAIN, max_size=cfg.INPUT.MAX_SIZE,
            store=store, store_cap=cfg.get_path("TPU.CAP_TEACHER", 128),
            store_thresh=0.5 if clipart else None)
        super().__init__(cfg, class_tokens, train_loader=loader)
        self.store = store
        self.prob_weighted = clipart

        variables = self.init_variables()
        params, frozen = self.split_params(variables)
        self.tx, self.schedule = self.build_optimizer(params)
        proto0 = self.init_prototypes(variables)
        self.state = TrainState(
            params=params, frozen=frozen, opt_state=self.tx.init(params),
            step=jnp.asarray(0), rng=jax.random.key(cfg.SEED + 1),
            prototypes=Prototypes(proto0, proto0, proto0))
        self.state = self.replicate_state(self.state)
        self._train_step = self._build_train_step()
        self.ap_50 = {}

    @staticmethod
    def _load_store(cfg) -> ResultStore:
        path = cfg.get_path("CLOUD.COLLECT_FILE", "")
        if path and os.path.exists(path):
            logger.info("loading collect store: %s", path)
            return ResultStore.load(path)
        raise FileNotFoundError(
            "PRETrainer needs cached cloud results: set CLOUD.COLLECT_FILE "
            "to a ResultStore .npz (produced by the collection pass) or "
            "pass store= explicitly")

    def _build_train_step(self):
        model, pcfg = self.model, self.pcfg
        tokens = jnp.asarray(self.class_tokens)
        tx = self.tx
        from coin_tpu.engine.state import merge_params
        rate = self.cfg.CLOUD.PROTOTYPE_UPDATE_WEIGHT
        weights = self.loss_weights
        prob_weighted = self.prob_weighted

        @jit_train_step
        def train_step(state: TrainState, images_u8, image_hw,
                       rcnn: Detections, rpn: Detections,
                       update_prototype):
            rng, rng_aug, rng_s, rng_w = jax.random.split(state.rng, 4)
            strong, weak = preprocess_batch(images_u8, rng_aug)
            # both views trained (pre_train.py:190-196)
            images2 = jnp.concatenate([strong, weak], axis=0)
            hw2 = jnp.concatenate([image_hw, image_hw], axis=0)
            tile2 = lambda t: jax.tree.map(
                lambda x: jnp.concatenate([x, x], axis=0), t)
            rcnn2, rpn2 = tile2(rcnn), tile2(rpn)

            def loss_fn(params):
                variables = merge_params(params, state.frozen)
                losses, new_proto = coin_pipelines.pretrain_losses(
                    model, variables, images2, hw2, rcnn2, rpn2,
                    state.prototypes.proto, tokens, rng_s, pcfg,
                    update_prototype, rate, prob_weighted, weights)
                return sum(losses.values()), (losses, new_proto)

            (_, (losses, new_proto)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            protos = Prototypes(new_proto, state.prototypes.b_online,
                                state.prototypes.b_offline)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1, rng=rng,
                                 prototypes=protos), losses

        return train_step

    def train(self, max_iter: Optional[int] = None):
        cfg = self.cfg
        max_iter = max_iter or cfg.SOLVER.MAX_ITER
        it = iter(self.train_loader)
        start = int(self.state.step)
        upd_start = cfg.CLOUD.PROTOTYPE_UPDATE_START
        for i in range(start, max_iter):
            batch = next(it)
            update_prototype = (upd_start != -1) and (i >= upd_start)
            arrays = self.shard_batch((
                jnp.asarray(batch.images), jnp.asarray(batch.image_hw),
                online_view_to_detections(batch.online["RCNN"]),
                online_view_to_detections(batch.online["RPN"])))
            self.state, losses = self._train_step(
                self.state, *arrays, jnp.asarray(update_prototype))
            # device scalars: materialized only at the logger's flush
            metrics = dict(losses)
            if i % self.metrics.period == 0:
                metrics["lr"] = lr_value(self.schedule, i)
            self.metrics.log(i, metrics)
            if (i + 1) % cfg.TEST.EVAL_PERIOD == 0:
                self.ap_50[i] = self.test()["AP50"]
            if (i + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                self.checkpointer.save(self.state, i + 1)
        self.checkpointer.save(self.state, max_iter,
                               name=f"pre_train_CLIP_{max_iter:07d}")
        self.metrics.close()
        return self.state

    def test(self) -> Dict[str, float]:
        return self.evaluate(self.state.params, self.state.frozen)

    def resume_or_load(self, resume: bool = False):
        if resume:
            self.state = self.checkpointer.load_latest(self.state)
