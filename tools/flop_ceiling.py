#!/usr/bin/env python
"""Publish the bf16 MXU FLOP ceiling of every recipe variant (VERDICT r3
item 2 / "What's missing" item 3).

For each step flavor the trainer can run (live parity, live@t512,
cached, cached_two refresh, and the round-4 semantic knobs: int8
training compute full/wgrad-exact, student ROI 384, int8 collection)
this tool traces the PRODUCTION program — built by the same
``engine.step_builder.build_adaptation_steps`` the trainer/bench/
dry-run use — at the production Foggy shapes and counts the matmul
FLOPs of the traced jaxpr (dot_general + conv, 2 FLOPs/MAC),
backend-independent, bucketed by operand dtype. The ceiling of a
flavor is the mixed-precision MXU roofline
``1 / (bf16_flops/197e12 + int8_flops/394e12)`` per image at 100% MXU
utilization and ZERO non-matmul time — an upper bound no amount of
kernel work can beat without changing the semantics (crop counts,
caching, refresh) or the arithmetic (int8).

Output: one JSON blob (bench_artifacts/flop_ceiling.json) with
per-flavor FLOPs, per-flavor ceilings, and the schedule-weighted
ceiling of every recipe combination, ending in an explicit statement of
which combinations can mathematically reach the 5x target
(37.5 img/s/chip vs BASELINE.md's 7.5 img/s reference estimate).

Runs on CPU (tracing only — nothing is executed):
  JAX_PLATFORMS=cpu python tools/flop_ceiling.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# v5e peaks (public spec): 197 TFLOP/s bf16, 394 TOP/s int8
V5E_BF16 = 197e12
V5E_INT8 = 394e12
TARGET_X = 5.0
REF_IMG_S = 7.5            # BASELINE derivation, BENCH.md
BURN_UP, MAX_ITER = 45000, 65000   # foggy schedule (45k/20k iters)


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") is None:
        # tracing-only: nothing executes, CPU is always sufficient
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from coin_tpu.engine import pipelines
    from coin_tpu.engine.common import simple_class_tokens
    from coin_tpu.engine.state import (Prototypes, TrainState,
                                       default_freeze_predicate,
                                       merge_params, partition_params)
    from coin_tpu.engine.step_builder import (StepHyper,
                                              build_adaptation_steps)
    from coin_tpu.models.ckg import CKGNet
    from coin_tpu.models.detector import OpenVocabularyRCNN
    from coin_tpu.structures import Detections

    num_classes = 8
    b, h, w, cap = 3, 608, 1216, 128

    model = OpenVocabularyRCNN(num_classes=num_classes, depth=50,
                               compute_dtype=jnp.bfloat16)
    pcfg = pipelines.PipelineConfig(
        num_classes=num_classes,
        pre_nms_topk_train=6000, post_nms_topk_train=1000,
        pre_nms_topk_test=6000, post_nms_topk_test=1000,
        roi_batch_size=512, rpn_batch_size=256)
    pcfg_t512 = dataclasses.replace(pcfg, pre_nms_topk_test=3000,
                                    post_nms_topk_test=512)
    tokens = jnp.asarray(simple_class_tokens(num_classes + 1))
    merge_model = CKGNet(hidden_size=1024, num_classes=num_classes + 1)

    # ---- abstract state/input construction (eval_shape: no params
    # are ever materialized at production scale) ----
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    img1 = sds((1, h, w, 3), jnp.float32)
    box1 = sds((1, 1, 4), jnp.float32)
    var_shapes = jax.eval_shape(
        lambda k, i, t, bx: model.init(k, i, t, bx),
        jax.random.key(0), img1, tokens, box1)
    params, frozen = partition_params(var_shapes,
                                      default_freeze_predicate(True))
    tx = optax.sgd(1e-5, momentum=0.9)
    merge_tx = optax.sgd(1e-5, momentum=0.9)
    merge_shapes = jax.eval_shape(
        lambda k: merge_model.init(k, jnp.zeros((2, 1024)),
                                   jnp.zeros((num_classes + 1, 1024)),
                                   jnp.zeros((num_classes + 1, 1024)),
                                   jnp.zeros((2, num_classes + 1)),
                                   jnp.zeros((2, num_classes + 1))),
        jax.random.key(1))
    mparams = merge_shapes["params"]
    proto = sds((num_classes + 1, 1024), jnp.float32)
    state = TrainState(
        params=params, frozen=frozen,
        opt_state=jax.eval_shape(tx.init, params),
        step=sds((), jnp.int32),
        rng=jax.eval_shape(lambda: jax.random.key(2)),
        prototypes=Prototypes(proto, proto, proto),
        teacher_params=jax.tree.map(lambda x: x, params),
        merge_params=mparams,
        merge_opt_state=jax.eval_shape(merge_tx.init, mparams))

    def dets(n):
        return Detections(
            boxes=sds((b, n, 4), jnp.float32),
            scores=sds((b, n), jnp.float32),
            classes=sds((b, n), jnp.int32),
            valid=sds((b, n), jnp.bool_),
            probs=sds((b, n, num_classes + 1), jnp.float32))

    images_u8 = sds((b, h, w, 3), jnp.uint8)
    image_hw = sds((b, 2), jnp.float32)
    ins = (images_u8, image_hw, dets(cap), dets(cap))
    offline = dets(100)

    hyper = StepHyper(burn_up=10, proto_start=0)

    # ---- MXU FLOP counter over the traced jaxpr ----
    # Counts ONLY matmul-class work (dot_general + conv_general_dilated,
    # 2 FLOPs per MAC) — exactly the work the MXU ceiling divides by;
    # elementwise/reduction FLOPs ride the VPU and don't bound the MXU.
    # The traced program includes the full backward (value_and_grad is
    # part of the step), so counts cover fwd+bwd.
    #
    # Round 4: the counter buckets each matmul by operand dtype —
    # int8×int8 contractions (ops/qconv.py, clip_resnet.Int8Conv) ride
    # the v5e int8 MXU at 2× the bf16 rate, so the ceiling of a mixed
    # program is 1 / (bf16_flops/PEAK_BF16 + int8_flops/PEAK_INT8) —
    # a mixed-precision roofline, not a single-peak division.
    import math

    def _bucket(eqn) -> str:
        a, b_ = eqn.invars[0].aval, eqn.invars[1].aval
        return ("int8" if a.dtype == jnp.int8 and b_.dtype == jnp.int8
                else "bf16")

    def _dot_flops(eqn):
        dnums = eqn.params["dimension_numbers"]
        (lc, rc), (lb, rb) = dnums
        a, b_ = eqn.invars[0].aval, eqn.invars[1].aval
        batch = math.prod(a.shape[i] for i in lb)
        k = math.prod(a.shape[i] for i in lc)
        m = math.prod(a.shape[i] for i in range(a.ndim)
                      if i not in lc and i not in lb)
        n = math.prod(b_.shape[i] for i in range(b_.ndim)
                      if i not in rc and i not in rb)
        return 2.0 * batch * m * n * k

    def _conv_flops(eqn):
        lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
        out = eqn.outvars[0].aval
        dn = eqn.params["dimension_numbers"]
        groups = (eqn.params.get("feature_group_count", 1)
                  * eqn.params.get("batch_group_count", 1))
        kspatial = math.prod(rhs.shape[i] for i in dn.rhs_spec[2:])
        cin = lhs.shape[dn.lhs_spec[1]]
        return 2.0 * out.size * kspatial * cin / groups

    def _add(t, u):
        return {k: t[k] + u[k] for k in t}

    def _jaxpr_flops(jaxpr, mult=1.0):
        total = {"bf16": 0.0, "int8": 0.0}
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            if name == "dot_general":
                total[_bucket(eqn)] += mult * _dot_flops(eqn)
            elif name == "conv_general_dilated":
                total[_bucket(eqn)] += mult * _conv_flops(eqn)
            elif name == "scan":
                total = _add(total, _jaxpr_flops(
                    eqn.params["jaxpr"].jaxpr,
                    mult * eqn.params["length"]))
            elif name == "while":
                # NMS-style loops: matmul-free in this codebase; count
                # one trip if any (conservative-low for a ceiling)
                total = _add(total, _jaxpr_flops(
                    eqn.params["body_jaxpr"].jaxpr, mult))
            elif name == "cond":
                # data-dependent branch: take the max branch (at any
                # step exactly one executes; max keeps the ceiling's
                # FLOP figure an upper bound of what a step needs) —
                # max by mixed-roofline TIME, the quantity that bounds
                branches = [_jaxpr_flops(br.jaxpr, mult)
                            for br in eqn.params["branches"]]
                total = _add(total, max(
                    branches, key=lambda t: (t["bf16"] / V5E_BF16
                                             + t["int8"] / V5E_INT8)))
            else:
                for p in eqn.params.values():
                    if hasattr(p, "jaxpr"):       # pjit/remat/closed
                        total = _add(total, _jaxpr_flops(p.jaxpr, mult))
                    elif hasattr(p, "eqns"):
                        total = _add(total, _jaxpr_flops(p, mult))
                    elif isinstance(p, (tuple, list)):
                        for q in p:
                            if hasattr(q, "jaxpr"):
                                total = _add(total,
                                             _jaxpr_flops(q.jaxpr, mult))
        return total

    def flops_of(jitted, *args):
        closed = jax.make_jaxpr(lambda *a: jitted(*a))(state, *args)
        return _jaxpr_flops(closed.jaxpr)

    live_parity, cached = build_adaptation_steps(
        model, merge_model, tx, merge_tx, tokens, pcfg, pcfg, hyper)
    live_t512, _, cached_two = build_adaptation_steps(
        model, merge_model, tx, merge_tx, tokens, pcfg, pcfg_t512, hyper,
        with_cached_two=True)

    flops = {
        "live_parity": flops_of(live_parity, *ins),
        "live_t512": flops_of(live_t512, *ins),
        "cached": flops_of(cached, *ins, offline),
        "cached_two_refresh": flops_of(cached_two, *ins, offline),
    }

    # round-4 semantic-knob flavors (each gated on its own fixture-v3
    # A/B artifact; the ceilings say which combinations MATTER):
    #   i8wx  — int8 training compute, wgrad-exact (TPU.INT8_TRAIN +
    #           INT8_TRAIN_WGRAD: false; --mode int8train_wx)
    #   i8    — full int8 incl. wgrad (--mode int8train, INCONCLUSIVE)
    #   r384  — student ROI batch 512→384 (--mode roibatch75)
    pcfg_r384 = dataclasses.replace(pcfg, roi_batch_size=384)
    model_i8wx = model.clone(quant_train_res5=2)
    model_i8 = model.clone(quant_train_res5=1)
    for key, m, sp in (("i8wx", model_i8wx, pcfg),
                       ("i8", model_i8, pcfg),
                       ("r384", model, pcfg_r384),
                       ("i8wx_r384", model_i8wx, pcfg_r384)):
        _, c1, c2 = build_adaptation_steps(
            m, merge_model, tx, merge_tx, tokens, sp, pcfg_t512, hyper,
            with_cached_two=True)
        flops[f"cached_{key}"] = flops_of(c1, *ins, offline)
        flops[f"cached_two_{key}"] = flops_of(c2, *ins, offline)

    # collection/refresh inference pass (teacher forward, budget 512),
    # batch 4 as the trainer's collect loader uses
    cb = 4

    @jax.jit
    def collect_infer(variables, images, hw, tokens):
        from coin_tpu.data.augment import normalize_batch
        return pipelines.inference(model, variables,
                                   normalize_batch(images), hw, tokens,
                                   pcfg_t512)

    all_vars = jax.eval_shape(lambda p, f: merge_params(p, f), params,
                              frozen)
    closed = jax.make_jaxpr(lambda *a: collect_infer(*a))(
        all_vars, sds((cb, h, w, 3), jnp.uint8),
        sds((cb, 2), jnp.float32), tokens)
    flops["collect_infer_b4"] = _jaxpr_flops(closed.jaxpr)

    # the TPU.INT8_COLLECT variant: the same pass over the dynamic-int8
    # serving convs (quant_convs — traced for real, not approximated by
    # a peak ratio; the text/attnpool matmuls stay bf16)
    model_qc = model.clone(quant_convs=True)

    @jax.jit
    def collect_infer_qc(variables, images, hw, tokens):
        from coin_tpu.data.augment import normalize_batch
        return pipelines.inference(model_qc, variables,
                                   normalize_batch(images), hw, tokens,
                                   pcfg_t512)

    closed = jax.make_jaxpr(lambda *a: collect_infer_qc(*a))(
        all_vars, sds((cb, h, w, 3), jnp.uint8),
        sds((cb, 2), jnp.float32), tokens)
    flops["collect_infer_int8_b4"] = _jaxpr_flops(closed.jaxpr)

    # ---- ceilings (mixed bf16+int8 MXU roofline) ----
    def _coll(k):
        return k.startswith("collect_infer")

    per_img = {k: {d: v[d] / (cb if _coll(k) else b) for d in v}
               for k, v in flops.items()}

    def mixed_ceiling(f):
        return 1.0 / (f["bf16"] / V5E_BF16 + f["int8"] / V5E_INT8)

    ceil = {k: mixed_ceiling(v) for k, v in per_img.items()}

    img_one = BURN_UP * 3          # cached step_one images
    img_two = (MAX_ITER - BURN_UP) * 3

    def sched(r1, r2):
        return (img_one + img_two) / (img_one / r1 + img_two / r2)

    # refresh recipe: step_two runs cached_two; every TEACHER_REFRESH_
    # EPOCHS=R epochs one collection pass covers the train set in BOTH
    # orientations (flip-exact) => amortized extra inference FLOPs per
    # trained image = 2 * collect_per_img / R.
    R = 4

    def refresh_step_two(step_key, collect_key):
        f = {d: (per_img[step_key][d]
                 + 2.0 * per_img[collect_key][d] / R)
             for d in ("bf16", "int8")}
        return mixed_ceiling(f)

    ceil["refresh_recipe_step_two"] = refresh_step_two(
        "cached_two_refresh", "collect_infer_b4")
    ceil["refresh_recipe_step_two_int8collect"] = refresh_step_two(
        "cached_two_refresh", "collect_infer_int8_b4")

    recipes = {
        "parity (cached + live)": sched(ceil["cached"],
                                        ceil["live_parity"]),
        "fast (cached + live_t512)": sched(ceil["cached"],
                                           ceil["live_t512"]),
        "refresh (cached + cached_two, bf16 collect, R=4)":
            sched(ceil["cached"], ceil["refresh_recipe_step_two"]),
        "refresh (cached + cached_two, int8 collect, R=4)":
            sched(ceil["cached"],
                  ceil["refresh_recipe_step_two_int8collect"]),
        "all-cached bound (cached both phases)": ceil["cached"],
        # round-4 semantic-knob recipes (refresh step_two flavor +
        # int8 collection where the knob's model changes apply to the
        # collection pass too)
        "int8wx refresh (cached_i8wx + cached_two_i8wx, int8 collect)":
            sched(ceil["cached_i8wx"], refresh_step_two(
                "cached_two_i8wx", "collect_infer_int8_b4")),
        "int8 full refresh (cached_i8 + cached_two_i8, int8 collect)":
            sched(ceil["cached_i8"], refresh_step_two(
                "cached_two_i8", "collect_infer_int8_b4")),
        "r384 refresh (cached_r384 + cached_two_r384, bf16 collect)":
            sched(ceil["cached_r384"], refresh_step_two(
                "cached_two_r384", "collect_infer_b4")),
        "int8wx+r384 refresh (shipped candidate, int8 collect)":
            sched(ceil["cached_i8wx_r384"], refresh_step_two(
                "cached_two_i8wx_r384", "collect_infer_int8_b4")),
    }

    target = TARGET_X * REF_IMG_S
    rnd = lambda v: {d: round(v[d] / 1e12, 3) for d in v}
    out = {
        "v5e_bf16_peak_tflops": V5E_BF16 / 1e12,
        "v5e_int8_peak_tops": V5E_INT8 / 1e12,
        "batch": b, "canvas": [h, w], "num_classes": num_classes,
        "flops_per_step": {k: rnd(v) for k, v in flops.items()},
        "tflops_per_image": {k: rnd(v) for k, v in per_img.items()},
        "ceiling_img_per_s": {k: round(v, 2) for k, v in ceil.items()},
        "weighted_ceiling_img_per_s": {k: round(v, 2)
                                       for k, v in recipes.items()},
        "target_img_per_s": target,
        "reachable": {k: bool(v >= target) for k, v in recipes.items()},
        "note": "mixed-precision MXU roofline: int8×int8 contractions "
                "counted at the v5e int8 peak, everything else at bf16 "
                "peak; ceilings assume 100% MXU utilization and ZERO "
                "time on non-matmul work (RoIAlign gathers, NMS, "
                "elementwise, layout) — real steps cannot exceed them; "
                "FLOPs are counted from the traced production programs "
                "(tools/flop_ceiling.py).",
    }
    os.makedirs("bench_artifacts", exist_ok=True)
    with open("bench_artifacts/flop_ceiling.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
