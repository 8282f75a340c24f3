"""Multi-host utilities.

The reference's cross-process traffic (detectron2 comm.gather/all_gather,
SURVEY §2.8) maps to:
- gradient reduction: implicit XLA collectives under the data mesh;
- collector-result union / evaluator gathers: host-side allgather over
  the JAX distributed runtime (DCN), wrapped here.
Single-process runs are no-ops.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process (the
    collector-union / metric-gather path)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # the padded allgather materializes world_size × max_payload on every
    # host — warn before a collector union silently eats tens of GB
    gb = payload.size * jax.process_count() / 2 ** 30
    if gb > 4.0:
        import logging
        logging.getLogger(__name__).warning(
            "all_gather_objects: ~%.1f GB gathered per host (payload "
            "%.1f MB x %d processes) — consider sharding the store "
            "merge", gb, payload.size / 2 ** 20, jax.process_count())
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(sizes[i][0])].tobytes())
            for i in range(jax.process_count())]


def merge_result_stores(store, chunk_bytes: int = 512 << 20):
    """Union each process's ResultStore shard (replaces the collector
    all_gather, gdino_collector.py:72-75).

    Stores beyond ``chunk_bytes`` of pickle are exchanged in image-id
    chunks: the padded allgather materializes world × max_payload per
    host, and a BDD100K-scale store (70k images × 128 boxes) is hundreds
    of MB per rank — chunking bounds peak host memory instead of letting
    one gather eat world × store at once."""
    if jax.process_count() == 1:
        return store
    payload_size = len(pickle.dumps(store))
    # every process must take the same branch and chunk count
    n_chunks = max(1, -(-payload_size // chunk_bytes))
    n_chunks = max(all_gather_objects(n_chunks))
    if n_chunks == 1:
        for other in all_gather_objects(store):
            store.merge(other)
        return store
    ids = sorted(store.image_ids())
    for ci in range(n_chunks):
        sub = type(store)(store.num_classes)
        sub._data = {i: store._data[i] for i in ids[ci::n_chunks]}
        for other in all_gather_objects(sub):
            store.merge(other)
    return store
