#!/usr/bin/env python
"""Collection-pass throughput: GroundingDINO swinB forward + postprocess
at the reference collection resolution (800 short side; gdino.py test
pipeline). Random weights — perf only, numerics are parity-tested.

Prints one JSON line (not the driver headline; see bench.py)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from coin_tpu.models.gdino import GroundingDINO


def main():
    b, h, w, t = 1, 800, 1344, 24   # 1333 padded to 64-multiple
    model = GroundingDINO(variant="swinB", dtype=jnp.bfloat16)
    img = jnp.zeros((b, h, w, 3), jnp.float32)
    embeds = jnp.zeros((b, t, 768), jnp.float32)
    mask = jnp.ones((b, t), bool)
    params = model.init(jax.random.key(0), img, embeds, mask)["params"]

    @jax.jit
    def fwd(params, img, embeds, mask):
        return model.apply({"params": params}, img, embeds, mask)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    out = fwd(params, img, embeds, mask)
    jax.block_until_ready(out)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, img, embeds, mask)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "gdino_swinB_collection_images_per_sec",
        "value": round(b * iters / dt, 3),
        "unit": "images/sec/chip",
        # reference: GDINO swinB on a 3090 ≈ 4-6 img/s at this size
        "vs_baseline": round(b * iters / dt / 5.0, 3),
    }))


if __name__ == "__main__":
    main()
