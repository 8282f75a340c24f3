"""Mesh construction + sharding helpers.

The reference's only distribution strategy is DDP over NCCL (SURVEY §2.8);
the TPU-native equivalent is a 1-D ``data`` mesh over ICI with
batch-sharded inputs and replicated parameters: XLA inserts the psum for
gradient reduction when the loss is averaged over the sharded batch under
jit. Collector unions / evaluator gathers use process_allgather on host.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _to_global(x, sharding: NamedSharding):
    """Lay a host-side value out as a (possibly multi-process) global
    array. Single-process: plain device_put. Multi-process: device_put
    rejects shardings with non-addressable devices, so build the global
    array shard-by-shard from the (identical-on-every-host) full value
    via make_array_from_callback. PRNG key arrays (extended dtypes) are
    unwrapped to their uint32 data and re-wrapped."""
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(x)
        g = jax.make_array_from_callback(
            np.shape(data), sharding, lambda idx: data[idx])
        return jax.random.wrap_key_data(g)
    x = jnp.asarray(x)
    return jax.make_array_from_callback(
        np.shape(x), sharding, lambda idx: x[idx])


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Lay every leaf with a leading batch dim onto the data axis. Every
    process must pass the identical FULL global batch (the loaders are
    deterministic given seed + store); each host contributes only its
    addressable shards."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: _to_global(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: _to_global(x, sharding), tree)


def host_copy(tree: Any) -> Any:
    """Fetch (replicated) global arrays to host numpy — works in
    multi-process where device_get on non-fully-addressable arrays
    doesn't: reads the first addressable replica."""
    def one(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return np.asarray(a.addressable_data(0))
        return np.asarray(a)
    return jax.tree.map(one, tree)
