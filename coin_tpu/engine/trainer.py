"""CoinTrainer — the final knowledge separation + distillation stage.

TPU re-design of coin/engine/trainer.py: one jitted train step fuses
  EMA teacher update → teacher forward (weak view) → dual-teacher A/B/C
  matching → student forward/losses (strong view) → CKG merge training via
  the gradient-alignment loss (second-order jax.grad over the `trans`
  MLP — no double-backward contortions) → dual optimizer updates →
  prototype EMA.

Burn-up switching (step_one → step_two, WEIGHT_FOR_BOX_A 1.0 → 0.5,
teacher EMA start) is data-dependent scalar control inside the single
compiled step (trainer.py:149-218).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.data.loader import TrainLoader
from coin_tpu.engine import pipelines
from coin_tpu.engine.base import DetectorTrainerBase
from coin_tpu.engine.common import lr_value
from coin_tpu.engine.pre_train import online_view_to_detections
from coin_tpu.engine.results_store import ResultStore
from coin_tpu.engine.state import Prototypes, TrainState, merge_params
from coin_tpu.models.ckg import CKGNet
from coin_tpu.solver import build_optimizer

logger = logging.getLogger(__name__)


class CoinTrainer(DetectorTrainerBase):
    def __init__(self, cfg, store: Optional[ResultStore] = None,
                 class_tokens: Optional[np.ndarray] = None):
        from coin_tpu.engine.base import auto_scale_workers
        cfg = auto_scale_workers(cfg, jax.device_count())
        if store is None:
            store = self._load_store(cfg)
        loader = TrainLoader(
            cfg.DATASETS.TRAIN_UNLABEL[0], cfg.DATASETS.ROOT,
            batch_size=cfg.SOLVER.IMG_PER_BATCH_UNLABEL, seed=cfg.SEED,
            min_size=cfg.INPUT.MIN_SIZE_TRAIN, max_size=cfg.INPUT.MAX_SIZE,
            store=store, store_cap=cfg.get_path("TPU.CAP_TEACHER", 128))
        super().__init__(cfg, class_tokens, train_loader=loader)
        self.store = store

        variables = self.init_variables()
        params, frozen = self.split_params(variables)
        self.tx, self.schedule = self.build_optimizer(params)

        self.merge_model = CKGNet(
            hidden_size=cfg.MODEL.MERGE_DIM,
            num_classes=self.num_classes + 1)
        dummy_feats = jnp.zeros((2, cfg.MODEL.MERGE_DIM))
        dummy_proto = jnp.zeros((self.num_classes + 1,
                                 cfg.MODEL.MERGE_DIM))
        dummy_probs = jnp.zeros((2, self.num_classes + 1))
        merge_vars = self.merge_model.init(
            jax.random.key(cfg.SEED + 2), dummy_feats, dummy_proto,
            dummy_proto, dummy_probs, dummy_probs)
        # merge optimizer: same cfg/schedule, no per-module multipliers
        # (CKG param names never match the visual/text override patterns
        # in the reference either — build_optimizer(cfg, merge) there
        # resolves every merge param to the base LR)
        self.merge_tx, self.merge_schedule = build_optimizer(
            merge_vars["params"], cfg, overrides={})

        proto0 = self.init_prototypes(variables)
        self.state = TrainState(
            params=params, frozen=frozen, opt_state=self.tx.init(params),
            step=jnp.asarray(0), rng=jax.random.key(cfg.SEED + 1),
            prototypes=Prototypes(proto0, proto0, proto0),
            teacher_params=jax.tree.map(jnp.copy, params),
            merge_params=merge_vars["params"],
            merge_opt_state=self.merge_tx.init(merge_vars["params"]))
        # teacher proposal budget: the teacher pools res5 over its
        # post-NMS proposals every step, so its top-k dominates step cost
        # alongside the student's sampled 512. TPU.TEACHER_POST_NMS_TOPK
        # (default = reference parity 1000) trades pseudo-label recall
        # for throughput; 512 measured +12.6% step rate (BENCH.md).
        self.teacher_pcfg = dataclasses.replace(
            self.pcfg,
            pre_nms_topk_test=cfg.get_path(
                "TPU.TEACHER_PRE_NMS_TOPK", self.pcfg.pre_nms_topk_test),
            post_nms_topk_test=cfg.get_path(
                "TPU.TEACHER_POST_NMS_TOPK",
                self.pcfg.post_nms_topk_test),
            # res5-crop sharing (BENCH.md crop-count lever): pool only
            # IoU-cluster representatives up to this static budget
            share_crops_budget=cfg.get_path("TPU.TEACHER_SHARE_CROPS", 0),
            share_crops_thresh=cfg.get_path(
                "TPU.TEACHER_SHARE_THRESH", 0.9),
            # fast head: res5-once + RoIAlign-on-res5 for the teacher
            # tower (share-crops is void post-NMS-0.7 — BENCH.md r2)
            fast_head=cfg.get_path("TPU.TEACHER_FAST_HEAD", False))
        self.state = self.replicate_state(self.state)
        self._train_step, self._train_step_cached = \
            self._build_train_step()
        self.teacher_store = None
        self._collect_loader = None
        self._collect_infer = None
        self.ap_50_student = {}
        self.ap_50_offline_teacher = {}

    @staticmethod
    def _load_store(cfg) -> ResultStore:
        path = cfg.get_path("CLOUD.COLLECT_FILE", "")
        if path and os.path.exists(path):
            return ResultStore.load(path)
        raise FileNotFoundError(
            "CoinTrainer needs cached cloud results (CLOUD.COLLECT_FILE)")

    # ------------------------------------------------------------- #
    def _build_train_step(self):
        """All step wiring lives in engine/step_builder.py — the SAME
        builder bench.py and __graft_entry__.dryrun_multichip call, so
        the benchmark and the driver's multi-chip artifact measure the
        production step itself."""
        from coin_tpu.engine.step_builder import (build_adaptation_steps,
                                                  hyper_from_cfg)
        hyper = dataclasses.replace(hyper_from_cfg(self.cfg),
                                    loss_weights=self.loss_weights)
        self._refresh_epochs = self.cfg.get_path(
            "TPU.TEACHER_REFRESH_EPOCHS", 0)
        steps = build_adaptation_steps(
            self.model, self.merge_model, self.tx, self.merge_tx,
            self.class_tokens, self.pcfg, self.teacher_pcfg, hyper,
            with_cached_two=bool(self._refresh_epochs))
        self._train_step_cached_two = steps[2] if len(steps) > 2 else None
        return steps[0], steps[1]

    # ------------------------------------------------------------- #
    def collect_teacher_store(self):
        """Inference passes of the (frozen, pre-burn-up) teacher over
        the unlabeled train set — one per orientation — → per-image
        cache in CANVAS coords (see the flip-exact note below).

        Called once for the step_one cache and periodically by the
        TPU.TEACHER_REFRESH_EPOCHS lever, so the jitted inference is
        built ONCE with the teacher variables passed as call arguments
        — a per-call closure would embed the weights as HLO constants
        and recompile (and re-ship the program through the relay) on
        every refresh."""
        from coin_tpu.data.augment import normalize_batch
        from coin_tpu.data.loader import TestLoader
        from coin_tpu.engine.results_store import ResultStore

        if self._collect_loader is None:
            self._collect_loader = TestLoader(
                self.cfg.DATASETS.TRAIN_UNLABEL[0],
                self.cfg.DATASETS.ROOT,
                batch_size=max(self.cfg.SOLVER.IMG_PER_BATCH_UNLABEL, 4),
                min_size=self.cfg.INPUT.MIN_SIZE_TRAIN,
                max_size=self.cfg.INPUT.MAX_SIZE,
                canvas_hw=self.train_loader.canvas_hw)
        loader = self._collect_loader
        variables = merge_params(self.state.teacher_params,
                                 self.state.frozen)
        tokens = jnp.asarray(self.class_tokens)

        if self._collect_infer is None:
            pcfg = self.teacher_pcfg
            # TPU.INT8_COLLECT: run the collection pass with the
            # dynamic-int8 serving convs (the pass is pure inference;
            # int8 MXU is ~1.8x bf16 at the hot shapes — BENCH.md). A
            # semantic knob: ship only with its own A/B artifact
            # (validate_cached_teacher.py --mode refresh_int8).
            infer_model = (self.model.clone(quant_convs=True)
                           if self.cfg.get_path("TPU.INT8_COLLECT", False)
                           else self.model)

            @jax.jit
            def infer(variables, images_u8, hw, tokens):
                return pipelines.inference(infer_model, variables,
                                           normalize_batch(images_u8),
                                           hw, tokens, pcfg)

            self._collect_infer = infer

        # FLIP-EXACT cache: the weak view's only stochastic element is
        # the horizontal flip (the resize factor is deterministic), and
        # the loader flips the valid canvas region host-side — so
        # caching the teacher's predictions for BOTH orientations makes
        # the cached step equal to the live teacher forward on every
        # batch (up to ~1-ulp XLA reassociation between executables). Unlike the CLOUD store (original coords,
        # geometric re-projection — reference parity with
        # base.py:80-126), this store is internal and rebuilt per run,
        # so it keeps CANVAS coords: no /scale·*scale float round-trip,
        # the packed detections ARE the live inference outputs bit for
        # bit (tests/test_adaptation_e2e.py asserts this).
        both = getattr(self.train_loader, "flip", True)
        store = ResultStore(self.num_classes)
        for batch, n_valid in loader:
            passes = [("RCNN", batch.images)]
            if both:
                fl = batch.images.copy()
                for i in range(len(fl)):
                    nh = int(batch.image_hw[i][0])
                    nw = int(batch.image_hw[i][1])
                    fl[i, :nh, :nw] = fl[i, :nh, :nw][:, ::-1]
                passes.append(("RCNN_FLIP", fl))
            for view, images in passes:
                dets = jax.device_get(self._collect_infer(
                    variables, jnp.asarray(images),
                    jnp.asarray(batch.image_hw), tokens))
                for i in range(n_valid):
                    valid = dets.valid[i]
                    store.put(batch.image_ids[i], view,
                              dets.boxes[i][valid],
                              dets.classes[i][valid],
                              dets.scores[i][valid],
                              dets.probs[i][valid])
        logger.info("cached teacher predictions for %d images%s",
                    len(store), " (both orientations)" if both else "")
        return store

    def _pack_offline(self, batch):
        """Serve the teacher cache for a train batch. The store holds
        CANVAS coords (scale=1, no rescale), and flipped samples read
        the RCNN_FLIP view — predictions made ON the flipped image —
        so the packed arrays equal the live teacher inference with no
        semantic approximation."""
        import numpy as np
        cap = self.pcfg.test_topk
        per = []
        for j in range(len(batch.image_ids)):
            fl = bool(batch.flip[j])
            if fl and not self.teacher_store.has_view(
                    batch.image_ids[j], "RCNN_FLIP"):
                raise RuntimeError(
                    "teacher store lacks the RCNN_FLIP view for flipped "
                    "sample %r — re-collect with flips enabled"
                    % batch.image_ids[j])
            per.append(self.teacher_store.pack_view(
                batch.image_ids[j], "RCNN_FLIP" if fl else "RCNN",
                cap, 1.0, False, 0.0))
        return {k: np.stack([p[k] for p in per]) for k in per[0]}

    def train(self, max_iter: Optional[int] = None):
        cfg = self.cfg
        max_iter = max_iter or cfg.SOLVER.MAX_ITER
        it = iter(self.train_loader)
        start = int(self.state.step)
        burn_up = cfg.CLOUD.BURN_UP_STEP
        # cache the frozen teacher's predictions for the step_one phase
        # (worth it only for long phases; the live path is exact parity)
        min_steps = cfg.get_path("TPU.CACHE_TEACHER_MIN_STEPS", 500)
        use_cache = (cfg.get_path("TPU.CACHE_TEACHER", True)
                     and burn_up - start >= min_steps)
        if use_cache and self.teacher_store is None:
            self.teacher_store = self.collect_teacher_store()
        # step_two teacher-refresh lever (TPU.TEACHER_REFRESH_EPOCHS = N):
        # instead of a per-step teacher tower, refresh the whole
        # prediction store with a batched collection pass every N epochs
        # (teacher weights keep their exact EMA trajectory; only the
        # predictions go stale). 0 = off = reference parity. Fixture-v3
        # A/B PASS (bench_artifacts/ab_refresh_v3_s8.json); shipped in
        # foggy_fast.yaml.
        refresh_steps = self._refresh_epochs * max(
            len(self.train_loader.records)
            // cfg.SOLVER.IMG_PER_BATCH_UNLABEL, 1)
        last_refresh = None
        for i in range(start, max_iter):
            batch = next(it)
            arrays = self.shard_batch((
                jnp.asarray(batch.images), jnp.asarray(batch.image_hw),
                online_view_to_detections(batch.online["RCNN"]),
                online_view_to_detections(batch.online["RPN"])))
            if use_cache and i < burn_up:
                offline = online_view_to_detections(
                    self._pack_offline(batch))
                self.state, losses = self._train_step_cached(
                    self.state, *arrays, offline)
            elif refresh_steps and i >= burn_up:
                if last_refresh is None \
                        or i - last_refresh >= refresh_steps:
                    self.teacher_store = self.collect_teacher_store()
                    last_refresh = i
                offline = online_view_to_detections(
                    self._pack_offline(batch))
                self.state, losses = self._train_step_cached_two(
                    self.state, *arrays, offline)
            else:
                self.state, losses = self._train_step(self.state,
                                                      *arrays)
            # keep losses as device scalars — MetricLogger materializes
            # them only at its flush period, so the step chain stays async
            metrics = dict(losses)
            if i % self.metrics.period == 0:
                metrics["lr"] = lr_value(self.schedule, i)
                metrics["merge_lr"] = lr_value(self.merge_schedule, i)
            self.metrics.log(i, metrics)
            if i == cfg.CLOUD.BURN_UP_STEP - 1:
                self.checkpointer.save(self.state, i,
                                       name=f"burn_up_{i:07d}")
            if (i + 1) % cfg.TEST.EVAL_PERIOD == 0:
                self.ap_50_student[i] = self.test()["AP50"]
                if i >= cfg.CLOUD.BURN_UP_STEP \
                        and cfg.CLOUD.EMA_KEEP_RATE_OFFLINE != 1.0:
                    self.ap_50_offline_teacher[i] = \
                        self.test_teacher()["AP50"]
            if (i + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                self.checkpointer.save(
                    self.state, i + 1,
                    extras={"ap_50_student": self.ap_50_student,
                            "ap_50_offline_teacher":
                                self.ap_50_offline_teacher})
        self.metrics.close()
        return self.state

    def test(self) -> Dict[str, float]:
        return self.evaluate(self.state.params, self.state.frozen)

    def test_teacher(self) -> Dict[str, float]:
        return self.evaluate(self.state.teacher_params, self.state.frozen)

    def resume_or_load(self, resume: bool = False):
        """MODEL.WEIGHTS semantics (trainer.py:220-265): a single path =
        full resume; 'pretrain_ckpt+collect_npz' = fresh start from CLIPDET
        weights + collect store (the store is already loaded via
        CLOUD.COLLECT_FILE in this design)."""
        w = self.cfg.MODEL.WEIGHTS
        if resume:
            self.state = self.checkpointer.load_latest(self.state)
            latest = self.checkpointer.latest_path()
            if latest:
                ex = self.checkpointer.load_extras(latest)
                self.ap_50_student.update(
                    {int(k): v for k, v in ex.get(
                        "ap_50_student", {}).items()})
                self.ap_50_offline_teacher.update(
                    {int(k): v for k, v in ex.get(
                        "ap_50_offline_teacher", {}).items()})
            return
        if not w:
            return
        paths = w.split("+")
        pre = paths[0]
        if len(paths) == 2 and os.path.exists(paths[1]):
            # 'pretrain_ckpt+collect_store' form (trainer.py:222-235)
            self.store = ResultStore.load(paths[1])
            self.train_loader.store = self.store
            logger.info("loaded collect store from %s", paths[1])
        if os.path.exists(pre):
            # structure-agnostic load: the pretrain TrainState lacks the
            # teacher/merge fields, so restore the raw tree and take
            # params + prototypes; teacher starts as a copy of the
            # student (trainer.py:225-235)
            raw = self.checkpointer.load_tree(pre)
            as_jnp = lambda t: jax.tree.map(jnp.asarray, t)
            params = as_jnp(raw["params"])
            pr = raw["prototypes"]
            # re-replicate the restored leaves onto the data mesh: the
            # raw tree is host-local/uncommitted, and in multi-process DP
            # the next jitted step needs every leaf addressable on every
            # mesh device (single-process DP only worked via implicit
            # resharding)
            self.state = self.replicate_state(self.state.replace(
                params=params, frozen=as_jnp(raw["frozen"]),
                prototypes=Prototypes(jnp.asarray(pr["proto"]),
                                      jnp.asarray(pr["b_online"]),
                                      jnp.asarray(pr["b_offline"])),
                teacher_params=jax.tree.map(jnp.copy, params)))
            logger.info("loaded CLIPDET pretrain weights from %s", pre)
