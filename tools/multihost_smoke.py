#!/usr/bin/env python
"""Two-process multihost smoke (VERDICT round-1 item 10): run the REAL
JAX distributed runtime (coordinator + N processes, CPU backend) and
exercise the cross-process paths that single-process tests can only
no-op through: process_allgather-based object gather, ResultStore union,
metric gather to rank 0, and an XLA psum over the global mesh.

Launched once per process (tests/test_multihost.py spawns both):

  python tools/multihost_smoke.py --process-id 0 --num-processes 2 \
      --coordinator localhost:12377
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--coordinator", default="localhost:12377")
    p.add_argument("--devices-per-process", type=int, default=2)
    p.add_argument("--pipeline", default="",
                   help="data root: run the END-TO-END multi-process "
                        "pipeline (sharded collect -> store union -> "
                        "pretrain steps -> per-rank eval) instead of "
                        "the primitive smoke")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--stage", choices=("all", "collect"), default="all",
                   help="pipeline scope: 'collect' stops after the "
                        "sharded-collect -> union stage (no jitted "
                        "training/eval compiles) so the distributed "
                        "union proof runs even on boxes where the full "
                        "train stage would exceed a CI budget")
    p.add_argument("--out", default="", help="JSON result path (pipeline)")
    args = p.parse_args(argv)

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{args.devices_per_process}").strip()

    import jax

    # sitecustomize may force an accelerator platform over the env var
    jax.config.update("jax_platforms", "cpu")
    # CPU cross-process collectives need an explicit transport
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from coin_tpu.utils.setup import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_cpu"))
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)

    import numpy as np

    from coin_tpu.engine.results_store import ResultStore
    from coin_tpu.parallel import multihost

    if args.pipeline:
        return run_pipeline(args)

    rank = multihost.process_index()
    world = multihost.process_count()
    assert world == args.num_processes, (world, args.num_processes)
    assert rank == args.process_id

    # 1) object allgather (the collector-union / metric wire)
    got = multihost.all_gather_objects({"rank": rank,
                                        "blob": b"x" * (100 + rank * 50)})
    assert [g["rank"] for g in got] == list(range(world)), got
    assert len(got[1]["blob"]) == 150

    # 2) ResultStore union: disjoint shards -> every process sees all
    store = ResultStore(num_classes=2)
    for j in range(3):
        img = f"img_r{rank}_{j}"
        boxes = np.asarray([[0.0, 0.0, 10.0 + j, 10.0]], np.float32)
        probs = np.asarray([[0.7, 0.2, 0.1]], np.float32)
        store.put(img, "RCNN", boxes, np.asarray([0]),
                  np.asarray([0.7], np.float32), probs)
    store = multihost.merge_result_stores(store)
    assert len(store) == 3 * world, len(store)
    assert "img_r0_0" in store and f"img_r{world-1}_2" in store

    # 2b) chunked union path: force multi-chunk exchange (the BDD100K-
    # scale guard) and require the identical result
    store2 = ResultStore(num_classes=2)
    for j in range(3):
        img = f"img2_r{rank}_{j}"
        boxes = np.asarray([[0.0, 0.0, 10.0 + j, 10.0]], np.float32)
        probs = np.asarray([[0.7, 0.2, 0.1]], np.float32)
        store2.put(img, "RCNN", boxes, np.asarray([0]),
                   np.asarray([0.7], np.float32), probs)
    store2 = multihost.merge_result_stores(store2, chunk_bytes=256)
    assert len(store2) == 3 * world, len(store2)
    assert f"img2_r{world-1}_2" in store2

    # 3) metric gather to rank 0 (evaluator path)
    metrics = multihost.all_gather_objects({"loss": 1.0 + rank})
    if multihost.is_main_process():
        total = sum(m["loss"] for m in metrics)
        assert abs(total - (world * 1.0 + world * (world - 1) / 2)) < 1e-6

    # 4) global-mesh psum: data-parallel gradient reduction semantics
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coin_tpu.parallel import mesh_utils
    n = len(jax.devices())
    mesh = mesh_utils.data_mesh(n)
    x = jax.device_put(
        jnp.ones((n, 4)),
        NamedSharding(mesh, P("data")))

    @jax.jit
    def total_sum(x):
        return jnp.sum(x)

    s = float(total_sum(x))
    assert abs(s - n * 4.0) < 1e-6, s

    print(f"multihost_smoke rank {rank}/{world} OK "
          f"({n} global devices)")


def _synth_record_store(records, num_classes):
    """Deterministic per-image pseudo-labels (seeded by the image id) so
    every rank's shard — and the single-process control — produce the
    SAME union store."""
    import zlib

    import numpy as np

    from coin_tpu.engine.results_store import ResultStore

    store = ResultStore(num_classes)
    for rec in records:
        rng = np.random.RandomState(
            zlib.crc32(rec["image_id"].encode()) % (2 ** 31))
        boxes = rec["boxes"] + rng.uniform(-3, 3, rec["boxes"].shape)
        n = len(boxes)
        probs = np.full((n, num_classes + 1), 0.04, np.float32)
        scores = rng.uniform(0.5, 0.95, n).astype(np.float32)
        for i, c in enumerate(rec["classes"]):
            probs[i, c] = scores[i]
        probs /= probs.sum(1, keepdims=True)
        for view in ("RCNN", "RPN"):
            store.put(rec["image_id"], view, boxes, rec["classes"],
                      probs.max(1), probs)
    return store


def run_pipeline(args):
    """End-to-end multi-process pipeline (VERDICT r2 item 6): each rank
    'collects' pseudo-labels for ITS shard of the train images (the
    reference's per-rank collector pass, gdino_collector.py:51-75),
    unions the stores across ranks (the all_gather at :72-75), runs
    `--steps` data-parallel PRETrainer steps over the global mesh, then
    evaluates per rank (predictions gathered to rank 0 in the reference,
    cloud_pascal_voc_evaluation.py:78-84; here every rank must agree).
    Emits a JSON with the union ids, a params checksum and AP50 —
    compared by tests/test_multihost.py against the single-process run.
    """
    import hashlib
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coin_tpu.config import load_config
    from coin_tpu.data import voc as voc_mod
    from coin_tpu.data.voc import load_voc_instances
    from coin_tpu.engine.pre_train import (PRETrainer,
                                           online_view_to_detections)
    from coin_tpu.parallel import multihost

    rank = multihost.process_index()
    world = multihost.process_count()
    root = args.pipeline
    classes = ("car", "person")
    try:
        voc_mod.register_pascal_voc("mhtrain", "synth/VOC2007", "train",
                                    classes, ".jpg")
        voc_mod.register_pascal_voc("mhval", "synth/VOC2007", "val",
                                    classes, ".jpg")
    except (KeyError, ValueError):
        pass  # already registered

    import os as _os
    records = load_voc_instances(_os.path.join(root, "synth/VOC2007"),
                                 "train", classes, ".jpg")

    # ---- stage 1: sharded collect -> union (collector semantics) ----
    shard = [r for i, r in enumerate(records) if i % world == rank]
    store = _synth_record_store(shard, num_classes=len(classes))
    store = multihost.merge_result_stores(store)
    assert len(store) == len(records), (len(store), len(records))
    union_ids = sorted(store.image_ids())

    if args.stage == "collect":
        result = {
            "rank": rank, "world": world,
            "union_md5": hashlib.md5(
                "|".join(union_ids).encode()).hexdigest(),
            "n_union": len(union_ids),
        }
        if args.out:
            with open(args.out, "w") as f:
                json.dump(result, f)
        print("PIPELINE_RESULT " + json.dumps(result))
        return

    # ---- stage 2: data-parallel pretrain over the global mesh ----
    cfg = load_config()
    cfg.DATASETS.ROOT = root
    cfg.DATASETS.TRAIN_UNLABEL = ["mhtrain"]
    cfg.DATASETS.TEST = ["mhval"]
    cfg.OUTPUT_DIR = _os.path.join(root, f"out_rank{rank}_w{world}")
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 4
    cfg.SOLVER.MAX_ITER = args.steps
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.STEPS = [10 ** 9]
    cfg.SOLVER.FACTOR_LIST = [1, 0.1]
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.INPUT.MIN_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE = 128
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.TPU.TEXT_LAYERS = 2
    cfg.TPU.TEXT_WIDTH = 64
    cfg.TPU.TEXT_HEADS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.CAP_TEACHER = 16
    cfg.CLOUD.PROTOTYPE_UPDATE_START = min(10, max(args.steps // 2, 1))

    tr = PRETrainer(cfg, store=store)
    # manual step loop (no checkpoint/eval hooks): every process feeds
    # the identical global batch; shard_batch lays it out over the
    # GLOBAL data mesh, XLA psums the grads across processes
    it = iter(tr.train_loader)
    upd_start = cfg.CLOUD.PROTOTYPE_UPDATE_START
    for i in range(args.steps):
        batch = next(it)
        arrays = tr.shard_batch((
            jnp.asarray(batch.images), jnp.asarray(batch.image_hw),
            online_view_to_detections(batch.online["RCNN"]),
            online_view_to_detections(batch.online["RPN"])))
        tr.state, _ = tr._train_step(tr.state, *arrays,
                                     jnp.asarray(i >= upd_start))

    # ---- stage 3: per-rank eval on host-pulled (replicated) params ----
    from coin_tpu.parallel.mesh_utils import host_copy
    params = host_copy(tr.state.params)
    frozen = host_copy(tr.state.frozen)
    checksum = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                         for l in jax.tree.leaves(params)))
    ap = tr.evaluate(jax.tree.map(jnp.asarray, params),
                     jax.tree.map(jnp.asarray, frozen))["AP50"]

    result = {
        "rank": rank, "world": world,
        "union_md5": hashlib.md5(
            "|".join(union_ids).encode()).hexdigest(),
        "n_union": len(union_ids),
        "params_checksum": checksum,
        "ap50": float(ap),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    print("PIPELINE_RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
