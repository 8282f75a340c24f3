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
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)

    import numpy as np

    from coin_tpu.engine.results_store import ResultStore
    from coin_tpu.parallel import multihost

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


if __name__ == "__main__":
    main()
