#!/usr/bin/env python
"""Map trace op names (fusion.88, multiply_add_fusion.13, ...) to their
HLO content: the fused computation's heavy ops and tensor shapes.

Compiles the production cached/live step (cache-hit through the relay),
dumps optimized HLO text, and for each requested op name prints the ops
inside its fused computation — the missing link between trace_step.py's
per-op costs and actionable shapes.

  python tools/map_trace_ops.py --flavor cached --ops fusion.88,multiply_add_fusion.13
  python tools/map_trace_ops.py --flavor cached --top-from /tmp/coin_trace
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_step(flavor: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from coin_tpu.engine import pipelines
    from coin_tpu.engine.common import simple_class_tokens
    from coin_tpu.engine.state import (Prototypes, TrainState,
                                       default_freeze_predicate,
                                       partition_params)
    from coin_tpu.engine.step_builder import (StepHyper,
                                              build_adaptation_steps)
    from coin_tpu.models.ckg import CKGNet
    from coin_tpu.models.detector import OpenVocabularyRCNN
    from coin_tpu.structures import Detections

    num_classes, b, h, w, cap = 8, 3, 608, 1216, 128
    # int8-training flavors mirror trace_step.py: qt=1 full int8,
    # qt=2 wgrad-exact, qt=3 per-sample scales
    qt = {"cached_i8": 1, "cached_i8wx": 2, "cached_i8ps": 3,
          "cached_i8roi": 3}.get(flavor, 0)
    model = OpenVocabularyRCNN(num_classes=num_classes, depth=50,
                               compute_dtype=jnp.bfloat16,
                               quant_train_res5=qt,
                               quant_roi=(flavor == "cached_i8roi"))
    pcfg = pipelines.PipelineConfig(
        num_classes=num_classes, pre_nms_topk_train=6000,
        post_nms_topk_train=1000, pre_nms_topk_test=6000,
        post_nms_topk_test=1000, roi_batch_size=512, rpn_batch_size=256)
    tokens = jnp.asarray(simple_class_tokens(num_classes + 1))
    merge_model = CKGNet(hidden_size=1024, num_classes=num_classes + 1)
    rng0 = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng0.randint(0, 255, (b, h, w, 3), np.uint8))
    image_hw = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (b, 1))

    def synth_online(n, capn=cap):
        boxes = rng0.uniform(0, 500, (b, capn, 4)).astype(np.float32)
        boxes[..., 2:] = boxes[..., :2] + rng0.uniform(32, 160, (b, capn, 2))
        classes = rng0.randint(0, num_classes, (b, capn))
        probs = np.full((b, capn, num_classes + 1), 0.02, np.float32)
        for i in range(b):
            probs[i, np.arange(capn), classes[i]] = 0.8
        valid = np.zeros((b, capn), bool)
        valid[:, :n] = True
        return Detections(boxes=jnp.asarray(boxes),
                          scores=jnp.asarray(probs.max(-1)),
                          classes=jnp.asarray(classes, jnp.int32),
                          valid=jnp.asarray(valid),
                          probs=jnp.asarray(probs))

    online_rcnn, online_rpn = synth_online(24), synth_online(32)
    offline = synth_online(40, 100)
    variables = model.init(jax.random.key(0), images_u8[:1].astype(
        jnp.float32), tokens, jnp.asarray([[[0, 0, 64, 64]]], jnp.float32))
    params, frozen = partition_params(variables,
                                      default_freeze_predicate(True))
    merge_vars = merge_model.init(
        jax.random.key(1), jnp.zeros((2, 1024)),
        jnp.zeros((num_classes + 1, 1024)),
        jnp.zeros((num_classes + 1, 1024)),
        jnp.zeros((2, num_classes + 1)), jnp.zeros((2, num_classes + 1)))
    proto0 = jnp.asarray(rng0.randn(num_classes + 1, 1024), jnp.float32)
    tx = optax.sgd(1e-5, momentum=0.9)
    merge_tx = optax.sgd(1e-5, momentum=0.9)
    state = TrainState(
        params=params, frozen=frozen, opt_state=tx.init(params),
        step=jnp.asarray(0), rng=jax.random.key(2),
        prototypes=Prototypes(proto0, proto0, proto0),
        teacher_params=jax.tree.map(jnp.copy, params),
        merge_params=merge_vars["params"],
        merge_opt_state=merge_tx.init(merge_vars["params"]))
    live, cached = build_adaptation_steps(
        model, merge_model, tx, merge_tx, tokens, pcfg, pcfg,
        StepHyper(burn_up=10, proto_start=0))
    if flavor.startswith("cached"):
        return cached, (state, images_u8, image_hw, online_rcnn,
                        online_rpn, offline)
    return live, (state, images_u8, image_hw, online_rcnn,
                  online_rpn)


HEAVY = ("convolution", "dot(", "dot.", " dot ", "reduce-window",
         "scatter", "gather", "transpose", "reduce(", "sort", "while")


def parse_hlo(text_path: str):
    """Stream the HLO: map computation name -> list of its op lines, and
    op name -> (defining line, called computation)."""
    comp_ops = defaultdict(list)
    op_info = {}
    cur = None
    call_re = re.compile(r"calls=([%\w.\-]+)")
    with open(text_path) as f:
        for line in f:
            ls = line.strip()
            m = re.match(r"^(%?[\w.\-]+)\s*(?:\([^)]*\))?\s*->?.*\{$", ls)
            if (ls.endswith("{") and not ls.startswith("ROOT")
                    and ("(" in ls or ls.startswith("ENTRY"))):
                name = ls.split()[0].lstrip("%")
                if ls.startswith("ENTRY"):
                    name = ls.split()[1].lstrip("%")
                cur = name
                continue
            if ls == "}" or ls == "})":
                continue
            if cur and "=" in ls:
                opname = ls.split("=")[0].strip().lstrip("%").rstrip()
                comp_ops[cur].append(ls)
                mm = call_re.search(ls)
                op_info[opname.replace("ROOT ", "")] = (
                    ls, mm.group(1).lstrip("%") if mm else None, cur)
    return comp_ops, op_info


def summarize(name, comp_ops, op_info, max_lines=14):
    info = op_info.get(name)
    if info is None:
        print(f"\n### {name}: NOT FOUND in entry computation")
        return
    line, called, _ = info
    print(f"\n### {name}")
    print("  " + line[:240])
    if called and called in comp_ops:
        body = comp_ops[called]
        heavy = [l for l in body if any(h in l for h in HEAVY)]
        show = heavy if heavy else body
        print(f"  fused computation {called}: {len(body)} ops, "
              f"{len(heavy)} heavy")
        for l in show[:max_lines]:
            print("    " + l[:240])


SCOPE_RE = re.compile(r'op_name="jit\((?:train_step(?:_cached)?)\)/([^"]*)"')


def scope_of(line: str, depth: int = 3) -> str:
    """Module scope from HLO metadata: first `depth` path segments of the
    op_name, with jvp/transpose wrappers folded into fwd/bwd tags."""
    m = SCOPE_RE.search(line)
    if not m:
        return "(no-metadata)"
    path = m.group(1)
    tag = "bwd" if "transpose(" in path else "fwd"
    path = path.replace("transpose(jvp(", "").replace("jvp(", "")
    path = path.replace("))", ")").replace("(", "/").replace(")", "")
    segs = [s for s in path.split("/") if s]
    return tag + ":" + "/".join(segs[:depth])


def rollup(trace_dir: str, op_info, depth: int):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_step import parse_trace
    _, by_name = parse_trace(trace_dir, top=0)
    by_scope = defaultdict(float)
    missing = 0.0
    total = 0.0
    for name, dur in by_name.items():
        info = op_info.get(name)
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue  # module/step aggregate events double-count children
        total += dur
        if info is None:
            missing += dur
            continue
        by_scope[scope_of(info[0], depth)] += dur
    print(f"\n# rollup by module scope (device us, {total/1e3:.1f} ms "
          f"total; {missing/1e3:.1f} ms unmatched)")
    for s, d in sorted(by_scope.items(), key=lambda kv: -kv[1])[:48]:
        print(f"{d/1e3:9.2f} ms  {100*d/max(total,1e-9):5.1f}%  {s}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--flavor", default="cached",
                   choices=("cached", "live", "cached_i8", "cached_i8wx",
                            "cached_i8ps", "cached_i8roi"))
    p.add_argument("--ops", default="")
    p.add_argument("--top-from", default="")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--rollup-from", default="",
                   help="trace dir: aggregate ALL device time by module "
                        "scope (HLO metadata join)")
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--hlo-out", default="/tmp/coin_step_hlo.txt")
    p.add_argument("--reuse-hlo", action="store_true")
    args = p.parse_args()

    names = [o for o in args.ops.split(",") if o]
    if args.top_from:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from trace_step import parse_trace
        _, by_name = parse_trace(args.top_from, top=0)
        ranked = sorted(by_name.items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked
                  if ("fusion" in n or "while" in n or "reduce" in n
                      or "convolution" in n or n.startswith("dot"))
                  ][:args.top]

    if not args.reuse_hlo or not os.path.exists(args.hlo_out):
        import jax
        fn, fargs = build_step(args.flavor)
        lowered = jax.jit(fn.__wrapped__) if hasattr(fn, "__wrapped__") \
            else fn
        compiled = fn.lower(*fargs).compile()
        txt = compiled.as_text()
        with open(args.hlo_out, "w") as f:
            f.write(txt)
        print(f"optimized HLO -> {args.hlo_out} ({len(txt)/1e6:.1f} MB)")

    comp_ops, op_info = parse_hlo(args.hlo_out)
    print(f"parsed: {len(comp_ops)} computations, {len(op_info)} ops")
    for n in names:
        summarize(n, comp_ops, op_info)
    if args.rollup_from:
        rollup(args.rollup_from, op_info, args.depth)


if __name__ == "__main__":
    main()
