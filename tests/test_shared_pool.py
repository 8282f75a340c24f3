"""Res5-crop sharing (pipelines.shared_pool): exact when clusters are
IoU=1 duplicates or when every box is unique and fits the budget."""

import numpy as np
import jax
import jax.numpy as jnp

from coin_tpu.engine import pipelines
from coin_tpu.ops.dedup import self_cluster_index


class _PoolModel:
    """Stand-in model: pool_boxes = deterministic function of the box."""

    def apply(self, variables, feats, boxes, resolution,
              method="pool_boxes"):
        # (B, N, 4) -> (B, N, 8): features derived from box coords only
        return jnp.concatenate([boxes, boxes * 2.0], axis=-1)


def _boxes_unique(n, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, 1000, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + 20 + rng.uniform(0, 10, (n, 2))],
                          axis=-1).astype(np.float32)


def test_cluster_index_duplicates():
    b = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60],
                    [0, 0, 10, 10]], np.float32)
    keep, rep = self_cluster_index(jnp.asarray(b),
                                   jnp.ones(4, bool), 0.9)
    np.testing.assert_array_equal(np.asarray(keep),
                                  [True, False, True, False])
    np.testing.assert_array_equal(np.asarray(rep), [0, 0, 2, 0])


def test_shared_pool_exact_for_unique_boxes():
    n, budget = 12, 12
    boxes = jnp.asarray(_boxes_unique(n))[None]
    valid = jnp.ones((1, n), bool)
    cfg = pipelines.PipelineConfig(num_classes=2, share_crops_budget=budget)
    model = _PoolModel()
    ref = model.apply(None, None, boxes, 14)
    out = pipelines.shared_pool(model, None, None, boxes, valid, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_shared_pool_broadcasts_duplicates():
    base = _boxes_unique(4, seed=3)
    boxes = np.concatenate([base, base[:2]], axis=0)  # 2 duplicates
    boxes = jnp.asarray(boxes)[None]
    valid = jnp.ones((1, 6), bool)
    cfg = pipelines.PipelineConfig(num_classes=2, share_crops_budget=4)
    model = _PoolModel()
    out = np.asarray(pipelines.shared_pool(model, None, None, boxes,
                                           valid, cfg))
    ref = np.asarray(model.apply(None, None, boxes, 14))
    # 6 boxes, 4 clusters, budget 4: every member gets its rep's (exact)
    np.testing.assert_allclose(out, ref)
