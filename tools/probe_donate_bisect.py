#!/usr/bin/env python
"""Bisect WHICH TrainState leaf-group's donation breaks the real
dual-teacher step on the TPU backend (probe_donation.py stage 4 fails
with an opaque INVALID_ARGUMENT; its synthetic stages 1-3 pass).

Runs the real step with the state split into (hot, cold) dicts and only
`hot` donated. Round-5 result (BENCH.md): the heavy trio
params/opt_state/teacher_params donates fine; the failure appears when
the SMALL leaves (prototypes/merge/rng/step) join the donated set —
which is why engine/state.jit_train_step's ``hot`` mode exists.

Run each split in a FRESH process (one failed donated execution wedges
the process's backend state and cascade-fails later configs):

  for s in control hbm hbm+merge hbm+mos hbm+protos hbm+rng hbm+step \
           all; do python tools/probe_donate_bisect.py "$s"; done
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["COIN_TPU_DONATE"] = "0"   # we manage donation ourselves


def main():
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from coin_tpu.utils.setup import enable_compile_cache
    enable_compile_cache()

    from coin_tpu.data.augment import preprocess_batch
    from coin_tpu.engine import coin_pipelines, pipelines
    from coin_tpu.engine.common import simple_class_tokens
    from coin_tpu.engine.matching import match_dual_teacher_single
    from coin_tpu.engine.state import (Prototypes, TrainState,
                                       default_freeze_predicate,
                                       merge_params, partition_params)
    from coin_tpu.models.ckg import CKGNet
    from coin_tpu.models.detector import OpenVocabularyRCNN
    from coin_tpu.structures import Detections, truncate

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
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

    def fresh():
        return dict(
            params=jax.tree.map(jnp.copy, params),
            opt_state=tx.init(params),
            teacher_params=jax.tree.map(jnp.copy, params),
            merge_params=jax.tree.map(jnp.copy, mv["params"]),
            merge_opt_state=mtx.init(mv["params"]),
            prototypes=Prototypes(proto0, proto0, proto0),
            rng=jax.random.key(2),
            step=jnp.asarray(0),
        )

    ALL = ("params", "opt_state", "teacher_params", "merge_params",
           "merge_opt_state", "prototypes", "rng", "step")

    def make_step(hot_keys):
        cold_keys = [k for k in ALL if k not in hot_keys]

        @partial(jax.jit, donate_argnums=(0,))
        def step(hot, cold, images_u8, image_hw, online):
            st = {**hot, **cold}
            rng, rng_aug, rng_fwd = jax.random.split(st["rng"], 3)
            strong, weak = preprocess_batch(images_u8, rng_aug)
            teacher = jax.tree.map(lambda t, s: t * 0.999 + s * 0.001,
                                   st["teacher_params"], st["params"])
            offline = pipelines.inference(
                model, merge_params(teacher, frozen), weak, image_hw,
                tokens, pcfg)
            offline = jax.lax.stop_gradient(offline)
            matched = jax.vmap(lambda o, f: match_dual_teacher_single(
                o, f, 0.5, 1.0, with_b=True))(online, offline)
            matched = matched._replace(c=truncate(matched.c, 8))
            matched_rpn = jax.vmap(lambda o, f: match_dual_teacher_single(
                o, f, 0.5, 1.0, with_b=False))(online, offline)
            matched_rpn = matched_rpn._replace(
                c=truncate(matched_rpn.c, 8))

            def merge_probs_fn(fb, po, pn):
                return merge_model.apply(
                    {"params": st["merge_params"]}, fb,
                    st["prototypes"].b_offline, st["prototypes"].b_online,
                    po, pn)

            def loss_fn(p):
                fw = coin_pipelines.student_forward(
                    model, merge_params(p, frozen), strong, image_hw,
                    matched, matched_rpn, tokens, rng_fwd, pcfg,
                    jnp.asarray(False), st["prototypes"].proto,
                    merge_probs_fn, 0.7)
                return sum(fw.losses.values()), fw

            (loss, fw), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st["params"])
            upd, opt_state = tx.update(grads, st["opt_state"],
                                       st["params"])
            new_params = optax.apply_updates(st["params"], upd)

            sv = merge_params(st["params"], frozen)
            text = model.apply(sv, tokens, method="text_features")

            def mloss(mp):
                ml = coin_pipelines.merge_losses(
                    merge_model, mp, sv, model, fw,
                    st["prototypes"], num_classes, text)
                return ml["loss_merge_grad"] + ml["loss_merge_base"], ml

            (_, _), mg = jax.value_and_grad(mloss, has_aux=True)(
                st["merge_params"])
            mupd, mos = mtx.update(mg, st["merge_opt_state"],
                                   st["merge_params"])
            mp = optax.apply_updates(st["merge_params"], mupd)
            protos = coin_pipelines.update_prototypes(
                st["prototypes"], fw, num_classes, 0.9996,
                jnp.asarray(True))
            new = dict(params=new_params, opt_state=opt_state,
                       teacher_params=teacher, merge_params=mp,
                       merge_opt_state=mos, prototypes=protos,
                       rng=rng, step=st["step"] + 1)
            hot_out = {k: new[k] for k in hot_keys}
            cold_out = {k: new[k] for k in cold_keys}
            return hot_out, cold_out, loss

        def run():
            st = fresh()
            hot = {k: st[k] for k in hot_keys}
            cold = {k: st[k] for k in cold_keys}
            for _ in range(2):
                hot, cold, loss = step(hot, cold, images_u8, image_hw,
                                       online)
                jax.block_until_ready(loss)
            assert np.isfinite(float(loss))
        return run

    splits = {
        "control": (),
        "hbm": ("params", "opt_state", "teacher_params"),
        "hbm+merge": ("params", "opt_state", "teacher_params",
                      "merge_params"),
        "hbm+mos": ("params", "opt_state", "teacher_params",
                    "merge_opt_state"),
        "hbm+protos": ("params", "opt_state", "teacher_params",
                       "prototypes"),
        "hbm+rng": ("params", "opt_state", "teacher_params", "rng"),
        "hbm+step": ("params", "opt_state", "teacher_params", "step"),
        "merge_only": ("merge_params",),
        "protos_only": ("prototypes",),
        "rng_only": ("rng",),
        "all": ALL,
    }
    which = sys.argv[1] if len(sys.argv) > 1 else "hbm"
    keys = splits[which]
    try:
        make_step(tuple(keys))()
        print(f"[OK]   {which}", flush=True)
    except Exception as e:
        print(f"[FAIL] {which}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        traceback.print_exc(limit=2)


if __name__ == "__main__":
    main()
