"""The ONE adaptation-step builder (VERDICT r2: "one step-builder,
three consumers").

CoinTrainer (production training), bench.py (the driver benchmark) and
__graft_entry__.dryrun_multichip (the driver's multi-chip sharding
artifact) all build their jitted dual-teacher step HERE, so the bench
and the dry-run measure/validate the production step itself — any drift
in step wiring (EMA gating, match thresholds, C-caps, optimizer order)
is impossible by construction.

The step fuses, in one XLA program (reference: the Python loop body of
coin/engine/trainer.py:160-218):

  EMA teacher update → teacher forward on the weak view (live flavor)
  → dual-teacher A/B/C matching → student forward/backward with the
  complete loss stack → CKG merge update (second-order gradient
  alignment via jax.grad) → prototype EMA.

Three flavors share one ``step_body``:
  - ``train_step``        — live teacher tower every step (exact
                            reference parity; the step_two phase).
  - ``train_step_cached`` — the teacher's per-image predictions served
    from a one-time collection cache; valid for step_one only because
    the teacher is FROZEN until burn-up (trainer.py:169-172) — the
    reference recomputes this identical forward for all 45k step_one
    iterations.
  - ``train_step_cached_two`` (opt-in) — step_two semantics with cached
    teacher predictions: the EMA teacher keeps its exact-parity weight
    trajectory, but its PREDICTIONS are refreshed only every
    TPU.TEACHER_REFRESH_EPOCHS epochs by a batched collection pass
    (trainer.refresh loop) instead of per-step. A staleness
    approximation, adjudicated PASS on the A/A-calibrated fixture-v3
    A/B (bench_artifacts/ab_refresh_v3_s8.json: avg3 delta +0.35,
    CI95 [-0.78, +1.48], n=8) — shipped in foggy_fast.yaml; off in
    the exact-parity recipe (foggy.yaml).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from coin_tpu.data.augment import preprocess_batch
from coin_tpu.engine import coin_pipelines, pipelines
from coin_tpu.engine.matching import match_dual_teacher_single
from coin_tpu.engine.state import TrainState, jit_train_step, merge_params
from coin_tpu.structures import truncate


@dataclasses.dataclass(frozen=True)
class StepHyper:
    """Scalar hyper-parameters of the adaptation step (the CLOUD.* knobs
    the step body reads; defaults = reference foggy recipe)."""
    burn_up: int                      # CLOUD.BURN_UP_STEP
    ema_rate: float = 0.9996          # CLOUD.EMA_KEEP_RATE_OFFLINE
    ema_every: int = 1                # CLOUD.OFFLINE_TEACHER_UPDATE_ITER
    proto_rate: float = 0.9996        # CLOUD.PROTOTYPE_UPDATE_WEIGHT
    proto_start: int = 0              # CLOUD.PROTOTYPE_UPDATE_START
    match_thr: float = 0.5            # CLOUD.MATCHER.IOU_THRESHOLDS
    cls_b_thresh: float = 0.7         # CLOUD.CLS_B_THRESH
    cap_c: int = 64                   # TPU.CAP_C (private-set capacity)
    loss_weights: Optional[Dict[str, float]] = None  # CLOUD.*_WEIGHT


def build_adaptation_steps(model, merge_model, tx, merge_tx, tokens,
                           pcfg, teacher_pcfg, hyper: StepHyper,
                           donate_default: bool = True,
                           with_cached_two: bool = False):
    """Returns ``(train_step, train_step_cached)`` over a TrainState —
    plus ``train_step_cached_two`` when ``with_cached_two``.

    ``train_step(state, images_u8, image_hw, online_rcnn,
    online_rpn) -> (state, losses)`` (flips are applied host-side by
    the loader, so the step takes no flip flags) and ``train_step_cached(state, ...,
    offline) -> (state, losses)``; all Detections arguments are batched
    padded structures. ``pcfg`` sets the student shapes, ``teacher_pcfg``
    the (possibly budgeted) offline-teacher inference shapes.
    """
    tokens = jnp.asarray(tokens)
    h = hyper

    def step_body(state, strong, image_hw, online_rcnn, online_rpn,
                  offline, teacher, rng, rng_fwd, step, step_two):
        # ---- dual-teacher matching (A/B/C; trainer.py:338-478) ----
        box_a_w = jnp.where(step_two, 0.5, 1.0)
        matched_rcnn = jax.vmap(
            lambda o, f: match_dual_teacher_single(
                o, f, h.match_thr, box_a_w, with_b=True)
        )(online_rcnn, offline)
        matched_rpn = jax.vmap(
            lambda o, f: match_dual_teacher_single(
                o, f, h.match_thr, box_a_w, with_b=False)
        )(online_rpn, offline)

        # bound the private-set capacity before the per-box C forward
        # (real C counts are tens; padded capacity is No+Nf)
        matched_rcnn = matched_rcnn._replace(
            c=truncate(matched_rcnn.c, h.cap_c))
        matched_rpn = matched_rpn._replace(
            c=truncate(matched_rpn.c, h.cap_c))

        update_prototype = ((h.proto_start != -1)
                            & (step >= h.proto_start))

        def merge_probs_fn(feats_b, p_off, p_on):
            return merge_model.apply(
                {"params": state.merge_params}, feats_b,
                state.prototypes.b_offline,
                state.prototypes.b_online, p_off, p_on)

        # ---- student forward + losses ----
        def loss_fn(params):
            variables = merge_params(params, state.frozen)
            fw = coin_pipelines.student_forward(
                model, variables, strong, image_hw, matched_rcnn,
                matched_rpn, tokens, rng_fwd, pcfg, step_two,
                state.prototypes.proto, merge_probs_fn, h.cls_b_thresh)
            losses = fw.losses
            if h.loss_weights is not None:
                losses = coin_pipelines.apply_loss_weights(
                    losses, h.loss_weights)
            return sum(losses.values()), (losses, fw)

        (_, (losses, fw)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)

        # ---- CKG merge training (trainer.py:192-197) ----
        student_vars = merge_params(state.params, state.frozen)
        text = model.apply(student_vars, tokens, method="text_features")

        def merge_loss_fn(mp):
            ml = coin_pipelines.merge_losses(
                merge_model, mp, student_vars, model, fw,
                state.prototypes, pcfg.num_classes, text)
            return ml["loss_merge_grad"] + ml["loss_merge_base"], ml

        (_, mlosses), mgrads = jax.value_and_grad(
            merge_loss_fn, has_aux=True)(state.merge_params)
        any_b = jnp.any(fw.sp.group == 1)
        train_merge = any_b & update_prototype
        mgrads = jax.tree.map(
            lambda g: jnp.where(train_merge, g, 0.0), mgrads)
        mupdates, merge_opt_state = merge_tx.update(
            mgrads, state.merge_opt_state, state.merge_params)
        merge_p = optax.apply_updates(state.merge_params, mupdates)

        # ---- prototype EMA updates (fast_rcnn.py:477-517) ----
        protos = coin_pipelines.update_prototypes(
            state.prototypes, fw, pcfg.num_classes, h.proto_rate,
            update_prototype)

        losses = dict(losses)
        losses.update(mlosses)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=step + 1,
            rng=rng, prototypes=protos, teacher_params=teacher,
            merge_params=merge_p, merge_opt_state=merge_opt_state)
        return new_state, losses

    # donation is auto-disabled on remote-TPU relays / the CPU mesh only
    # (engine/state.jit_train_step); direct-attached chips donate the
    # TrainState so params/opt_state/teacher are not double-buffered
    @partial(jit_train_step, donate_default=donate_default)
    def train_step(state: TrainState, images_u8, image_hw,
                   online_rcnn, online_rpn):
        step = state.step
        step_two = step >= h.burn_up
        rng, rng_aug, rng_fwd = jax.random.split(state.rng, 3)
        strong, weak = preprocess_batch(images_u8, rng_aug)

        # ---- EMA teacher update (trainer.py:169-172) ----
        do_ema = step_two & ((step - h.burn_up) % h.ema_every == 0)
        teacher = jax.tree.map(
            lambda t, s: jnp.where(
                do_ema, t * h.ema_rate + s * (1.0 - h.ema_rate), t),
            state.teacher_params, state.params)

        # ---- offline teacher forward on the weak view ----
        teacher_vars = merge_params(teacher, state.frozen)
        offline = pipelines.inference(model, teacher_vars, weak,
                                      image_hw, tokens, teacher_pcfg)
        offline = jax.lax.stop_gradient(offline)
        return step_body(state, strong, image_hw, online_rcnn,
                         online_rpn, offline, teacher, rng, rng_fwd,
                         step, step_two)

    @partial(jit_train_step, donate_default=donate_default)
    def train_step_cached(state: TrainState, images_u8, image_hw,
                          online_rcnn, online_rpn, offline):
        """step_one with the teacher's per-image predictions served from
        a one-time collection cache — valid because the teacher is
        FROZEN until burn-up (trainer.py:169-172), so recomputing its
        forward every step (as the reference does) is redundant.

        FLIP-EXACT: the collection pass caches the teacher's
        predictions for BOTH orientations of every image in CANVAS
        coords (the loader's host-side flip makes the flipped canvas
        bit-identical between the collect pass and the train step), so
        the served offline detections equal the live teacher forward
        on every batch — flipped or not — with ZERO semantic
        approximation; the only residual is ~1-ulp XLA reassociation
        noise between executables compiled at different batch shapes.
        The default's defense is tests/test_adaptation_e2e.py's
        equality tests, not a statistical A/B.
        """
        step = state.step
        rng, rng_aug, rng_fwd = jax.random.split(state.rng, 3)
        strong, _ = preprocess_batch(images_u8, rng_aug)
        return step_body(state, strong, image_hw, online_rcnn,
                         online_rpn, offline, state.teacher_params,
                         rng, rng_fwd, step, jnp.asarray(False))

    if not with_cached_two:
        return train_step, train_step_cached

    @partial(jit_train_step, donate_default=donate_default)
    def train_step_cached_two(state: TrainState, images_u8, image_hw,
                              online_rcnn, online_rpn, offline):
        """step_two with STALE teacher predictions (the refresh lever,
        TPU.TEACHER_REFRESH_EPOCHS): the EMA teacher-weight trajectory is
        exact parity — only the predictions come from the trainer's
        periodic collection pass instead of a per-step forward. The
        staleness (≤ refresh period) is the approximation; everything
        else (WEIGHT_FOR_BOX_A=0.5, merge/prototype gating, losses)
        follows the live step_two branch."""
        step = state.step
        step_two = step >= h.burn_up
        rng, rng_aug, rng_fwd = jax.random.split(state.rng, 3)
        strong, _ = preprocess_batch(images_u8, rng_aug)
        do_ema = step_two & ((step - h.burn_up) % h.ema_every == 0)
        teacher = jax.tree.map(
            lambda t, s: jnp.where(
                do_ema, t * h.ema_rate + s * (1.0 - h.ema_rate), t),
            state.teacher_params, state.params)
        return step_body(state, strong, image_hw, online_rcnn,
                         online_rpn, offline, teacher, rng, rng_fwd,
                         step, step_two)

    return train_step, train_step_cached, train_step_cached_two


def hyper_from_cfg(cfg) -> StepHyper:
    """StepHyper from a CfgNode (the CoinTrainer construction path)."""
    return StepHyper(
        burn_up=cfg.CLOUD.BURN_UP_STEP,
        ema_rate=cfg.CLOUD.EMA_KEEP_RATE_OFFLINE,
        ema_every=cfg.CLOUD.OFFLINE_TEACHER_UPDATE_ITER,
        proto_rate=cfg.CLOUD.PROTOTYPE_UPDATE_WEIGHT,
        proto_start=cfg.CLOUD.PROTOTYPE_UPDATE_START,
        match_thr=cfg.CLOUD.MATCHER.IOU_THRESHOLDS,
        cls_b_thresh=cfg.CLOUD.CLS_B_THRESH,
        cap_c=cfg.get_path("TPU.CAP_C", 64))
