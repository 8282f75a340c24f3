#!/usr/bin/env python
"""Root-cause probe for dual-teacher step donation (BENCH.md caveat /
VERDICT item 8): progressively grow the donated step from a trivial EMA
tree_map to the full dual-teacher shape on the REAL backend and report
exactly which stage first rejects donation — instead of the opaque
INVALID_ARGUMENT the round-1 bench hit.

  python tools/probe_donation.py          # on the attached TPU
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def probe(name, fn, *args):
    import jax
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        # second call reuses the donated buffers for real
        out = fn(*jax.tree.map(lambda x: x, out) if isinstance(out, tuple)
                 else (out,))
        jax.block_until_ready(out)
        print(f"[OK]   {name}")
        return True
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:300]}")
        traceback.print_exc(limit=3)
        return False


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    print("backend:", jax.default_backend(), jax.devices())

    k = jax.random.key(0)
    params = {"w": jax.random.normal(k, (1024, 1024), jnp.float32),
              "b": jnp.zeros((1024,), jnp.float32)}
    teacher = jax.tree.map(jnp.copy, params)
    tx = optax.sgd(1e-3, momentum=0.9)
    opt = tx.init(params)

    # 1: donated EMA tree_map only
    @__import__("functools").partial(jax.jit, donate_argnums=(0, 1))
    def ema_step(params, teacher):
        teacher = jax.tree.map(lambda t, s: t * 0.999 + s * 0.001,
                               teacher, params)
        return params, teacher

    probe("ema tree_map (donate params+teacher)", ema_step, params,
          teacher)

    # 2: donated grad+update, teacher passed through unchanged
    params = {"w": jax.random.normal(k, (1024, 1024), jnp.float32),
              "b": jnp.zeros((1024,), jnp.float32)}
    teacher = jax.tree.map(jnp.copy, params)
    opt = tx.init(params)

    @__import__("functools").partial(jax.jit, donate_argnums=(0, 1, 2))
    def grad_step(params, teacher, opt):
        def loss(p):
            x = jnp.ones((8, 1024))
            return jnp.mean((x @ p["w"] + p["b"]) ** 2)
        g = jax.grad(loss)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), teacher, opt

    probe("grad+sgd update, teacher pass-through", grad_step, params,
          teacher, opt)

    # 3: teacher USED (forward) then EMA'd + passed out — the
    # dual-teacher pattern: both read and aliased-out
    params = {"w": jax.random.normal(k, (1024, 1024), jnp.float32),
              "b": jnp.zeros((1024,), jnp.float32)}
    teacher = jax.tree.map(jnp.copy, params)
    opt = tx.init(params)

    @__import__("functools").partial(jax.jit, donate_argnums=(0, 1, 2))
    def dual_step(params, teacher, opt):
        teacher = jax.tree.map(lambda t, s: t * 0.999 + s * 0.001,
                               teacher, params)
        x = jnp.ones((8, 1024))
        pseudo = jax.lax.stop_gradient(x @ teacher["w"] + teacher["b"])

        def loss(p):
            return jnp.mean((x @ p["w"] + p["b"] - pseudo) ** 2)
        g = jax.grad(loss)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), teacher, opt

    probe("teacher fwd + EMA + student update (dual pattern)",
          dual_step, params, teacher, opt)

    # 4: the REAL dual-teacher trainer step, tiny shapes, donated
    os.environ["COIN_TPU_DONATE"] = "1"
    from coin_tpu.engine.common import simple_class_tokens
    print("probing the real CoinTrainer step with COIN_TPU_DONATE=1 …")
    import __graft_entry__  # noqa: F401  (reuse its tiny builders)
    from coin_tpu.engine import coin_pipelines, pipelines  # noqa: F401

    # reuse the dryrun body but on the real backend, n=1, donated
    try:
        _probe_real_step()
        print("[OK]   real dual-teacher step donated")
    except Exception as e:
        print(f"[FAIL] real dual-teacher step: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:300]}")
        traceback.print_exc(limit=5)

    # 5: the same real step under HOT donation (params/opt_state/
    # teacher_params only — engine/state.jit_train_step 'hot' mode).
    # The round-5 bisect showed the axon relay accepts donation of the
    # three heavy trees and rejects the step only when the small
    # leaves (prototypes/merge/rng/step) join the donated set; this
    # stage verifies the shipped wrapper end-to-end on the backend.
    # Run in a SUBPROCESS: a failed donated execution (stage 4 on the
    # relay) can wedge the parent's backend state and cascade-fail
    # every later execution in-process (observed in the round-5
    # bisect).
    import subprocess
    print("probing the real CoinTrainer step with COIN_TPU_DONATE=hot …",
          flush=True)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--hot-only"],
        env={**os.environ, "COIN_TPU_DONATE": "hot"},
        capture_output=True, text=True, timeout=1200)
    tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    if r.returncode == 0 and "[OK]" in r.stdout:
        print("[OK]   real dual-teacher step donated (hot)")
    else:
        print(f"[FAIL] real dual-teacher step (hot): rc={r.returncode}")
        for ln in tail:
            print("   " + ln[:200])


def _probe_real_step():
    import dataclasses as dc
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from coin_tpu.data.augment import preprocess_batch
    from coin_tpu.engine import coin_pipelines, pipelines
    from coin_tpu.engine.common import simple_class_tokens
    from coin_tpu.engine.matching import match_dual_teacher_single
    from coin_tpu.engine.state import (Prototypes, TrainState,
                                       default_freeze_predicate,
                                       jit_train_step, merge_params,
                                       partition_params)
    from coin_tpu.models.ckg import CKGNet
    from coin_tpu.models.detector import OpenVocabularyRCNN
    from coin_tpu.structures import Detections, truncate

    num_classes = 3
    model = OpenVocabularyRCNN(num_classes=num_classes, depth=50,
                               text_layers=2, text_width=64, text_heads=2)
    pcfg = pipelines.PipelineConfig(
        num_classes=num_classes, pre_nms_topk_train=256,
        post_nms_topk_train=64, pre_nms_topk_test=256,
        post_nms_topk_test=64, roi_batch_size=32, rpn_batch_size=32,
        test_topk=20)
    tokens = jnp.asarray(simple_class_tokens(num_classes + 1))
    b, h, w, cap = 1, 64, 64, 8
    rng0 = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng0.randint(0, 255, (b, h, w, 3), np.uint8))
    image_hw = jnp.asarray([[h, w]], jnp.float32)

    boxes = rng0.uniform(0, 40, (b, cap, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 16
    probs = np.full((b, cap, num_classes + 1), 0.1, np.float32)
    probs[..., 0] = 0.7
    online = Detections(
        boxes=jnp.asarray(boxes), scores=jnp.asarray(probs.max(-1)),
        classes=jnp.zeros((b, cap), jnp.int32),
        valid=jnp.ones((b, cap), bool), probs=jnp.asarray(probs))

    variables = model.init(jax.random.key(0),
                           images_u8.astype(jnp.float32), tokens,
                           jnp.asarray([[[0, 0, 16, 16]]], jnp.float32))
    params, frozen = partition_params(variables,
                                      default_freeze_predicate(True))
    merge_model = CKGNet(hidden_size=1024, num_classes=num_classes + 1)
    mv = merge_model.init(jax.random.key(1), jnp.zeros((2, 1024)),
                          jnp.zeros((num_classes + 1, 1024)),
                          jnp.zeros((num_classes + 1, 1024)),
                          jnp.zeros((2, num_classes + 1)),
                          jnp.zeros((2, num_classes + 1)))
    proto0 = jnp.zeros((num_classes + 1, 1024), jnp.float32)
    tx, mtx = optax.sgd(1e-3, momentum=0.9), optax.sgd(1e-3)
    state = TrainState(
        params=params, frozen=frozen, opt_state=tx.init(params),
        step=jnp.asarray(0), rng=jax.random.key(2),
        prototypes=Prototypes(proto0, proto0, proto0),
        teacher_params=jax.tree.map(jnp.copy, params),
        merge_params=mv["params"],
        merge_opt_state=mtx.init(mv["params"]))

    @partial(jit_train_step, donate_default=True)
    def step(state: TrainState, images_u8, image_hw, online):
        rng, rng_aug, rng_fwd = jax.random.split(state.rng, 3)
        strong, weak = preprocess_batch(images_u8, rng_aug)
        teacher = jax.tree.map(lambda t, s: t * 0.999 + s * 0.001,
                               state.teacher_params, state.params)
        offline = pipelines.inference(
            model, merge_params(teacher, state.frozen), weak, image_hw,
            tokens, pcfg)
        offline = jax.lax.stop_gradient(offline)
        matched = jax.vmap(lambda o, f: match_dual_teacher_single(
            o, f, 0.5, 1.0, with_b=True))(online, offline)
        matched = matched._replace(c=truncate(matched.c, 8))
        matched_rpn = jax.vmap(lambda o, f: match_dual_teacher_single(
            o, f, 0.5, 1.0, with_b=False))(online, offline)
        matched_rpn = matched_rpn._replace(c=truncate(matched_rpn.c, 8))

        def merge_probs_fn(fb, po, pn):
            return merge_model.apply({"params": state.merge_params}, fb,
                                     state.prototypes.b_offline,
                                     state.prototypes.b_online, po, pn)

        def loss_fn(p):
            fw = coin_pipelines.student_forward(
                model, merge_params(p, state.frozen), strong, image_hw,
                matched, matched_rpn, tokens, rng_fwd, pcfg,
                jnp.asarray(False), state.prototypes.proto,
                merge_probs_fn, 0.7)
            return sum(fw.losses.values()), fw

        (loss, fw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)

        sv = merge_params(state.params, state.frozen)
        text = model.apply(sv, tokens, method="text_features")

        def mloss(mp):
            ml = coin_pipelines.merge_losses(
                merge_model, mp, sv, model, fw, state.prototypes,
                num_classes, text)
            return ml["loss_merge_grad"] + ml["loss_merge_base"], ml

        (_, _), mg = jax.value_and_grad(mloss, has_aux=True)(
            state.merge_params)
        mupd, mos = mtx.update(mg, state.merge_opt_state,
                               state.merge_params)
        mp = optax.apply_updates(state.merge_params, mupd)
        protos = coin_pipelines.update_prototypes(
            state.prototypes, fw, num_classes, 0.9996, jnp.asarray(True))
        return state.replace(params=new_params, teacher_params=teacher,
                             merge_params=mp, opt_state=opt_state,
                             merge_opt_state=mos, prototypes=protos,
                             rng=rng, step=state.step + 1), loss

    for _ in range(2):
        state, loss = step(state, images_u8, image_hw, online)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))


if __name__ == "__main__":
    if "--hot-only" in sys.argv:
        # subprocess entry for stage 5: run ONLY the real step under
        # the COIN_TPU_DONATE mode inherited from the environment
        _probe_real_step()
        print("[OK]")
    else:
        main()
