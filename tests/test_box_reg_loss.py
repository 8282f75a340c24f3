"""Golden tests for box_reg_loss vs a direct numpy replica of the
reference formula (coin/modeling/roi_heads/fast_rcnn.py:601-646), incl.
the dual online/offline variant on per-class delta columns
(fast_rcnn.py:547-569): both losses regress to the SAME fused gt box;
they differ only in which class picks the fg mask / delta column."""

import numpy as np
import jax.numpy as jnp

from coin_tpu.models import roi_heads as rh
from coin_tpu.ops import boxes as box_ops

BW = rh.BOX_REG_WEIGHTS


def ref_box_reg_loss(prop, gt, deltas, classes, num_classes, normalizer):
    """Reference semantics: fg = 0 <= cls < C; per-class column select
    when deltas has C*4 columns; smooth_l1(beta=0) == L1, summed, divided
    by the normalizer."""
    fg = (classes >= 0) & (classes < num_classes)
    total = 0.0
    for i in np.where(fg)[0]:
        if deltas.shape[1] == 4:
            d = deltas[i]
        else:
            d = deltas[i].reshape(num_classes, 4)[classes[i]]
        t = np.asarray(box_ops.encode_deltas(
            jnp.asarray(prop[i]), jnp.asarray(gt[i]), BW))
        total += np.abs(d - t).sum()
    return total / normalizer


def make_sp(rng, n=16, num_classes=5):
    prop = rng.uniform(0, 80, (n, 4)).astype(np.float32)
    prop[:, 2:] = prop[:, :2] + rng.uniform(4, 30, (n, 2))
    gt = prop + rng.uniform(-3, 3, (n, 4)).astype(np.float32)
    group = np.full(n, rh.GROUP_PAD, np.int8)
    group[:4] = rh.GROUP_A
    group[4:8] = rh.GROUP_B
    group[8:12] = rh.GROUP_BG
    cls_off = np.full(n, -1, np.int32)
    cls_on = np.full(n, -1, np.int32)
    cls_off[:4] = cls_on[:4] = rng.randint(0, num_classes, 4)
    # B rows: DIFFERENT online vs offline classes (incl. one bg-on-one-side)
    cls_off[4:8] = [0, 1, 2, num_classes]
    cls_on[4:8] = [3, 1, num_classes, 4]
    cls_off[8:12] = cls_on[8:12] = num_classes  # bg
    c1 = num_classes + 1
    probs = np.full((n, c1), 1.0 / c1, np.float32)
    return rh.SampledProposals(
        boxes=jnp.asarray(prop), group=jnp.asarray(group),
        gt_boxes=jnp.asarray(gt), cls_offline=jnp.asarray(cls_off),
        cls_online=jnp.asarray(cls_on),
        probs_offline=jnp.asarray(probs), probs_online=jnp.asarray(probs)
    ), prop, gt, cls_off, cls_on


def test_agnostic_matches_reference(rng):
    num_classes = 5
    sp, prop, gt, cls_off, cls_on = make_sp(rng, num_classes=num_classes)
    deltas = rng.randn(16, 4).astype(np.float32)
    denom = float(np.sum(np.asarray(sp.group) != rh.GROUP_PAD))
    ours = float(rh.box_reg_loss(sp, jnp.asarray(deltas), num_classes,
                                 use_online_classes=True,
                                 normalizer=denom))
    want = ref_box_reg_loss(prop, gt, deltas, cls_on, num_classes, denom)
    np.testing.assert_allclose(ours, want, rtol=1e-5)


def test_per_class_dual_online_offline(rng):
    num_classes = 5
    sp, prop, gt, cls_off, cls_on = make_sp(rng, num_classes=num_classes)
    deltas = rng.randn(16, 4 * num_classes).astype(np.float32)
    denom = float(np.sum(np.asarray(sp.group) != rh.GROUP_PAD))

    on = float(rh.box_reg_loss(sp, jnp.asarray(deltas), num_classes,
                               use_online_classes=True, normalizer=denom))
    off = float(rh.box_reg_loss(sp, jnp.asarray(deltas), num_classes,
                                use_online_classes=False, normalizer=denom))
    want_on = ref_box_reg_loss(prop, gt, deltas, cls_on, num_classes, denom)
    want_off = ref_box_reg_loss(prop, gt, deltas, cls_off, num_classes,
                                denom)
    np.testing.assert_allclose(on, want_on, rtol=1e-5)
    np.testing.assert_allclose(off, want_off, rtol=1e-5)
    # the B rows disagree on classes, so the two losses must differ
    assert abs(on - off) > 1e-6


def test_padding_rows_never_contribute(rng):
    num_classes = 5
    sp, prop, gt, cls_off, cls_on = make_sp(rng, num_classes=num_classes)
    deltas = rng.randn(16, 4).astype(np.float32)
    big = deltas.copy()
    big[12:] = 1e6  # pad rows (group == -1, cls == -1)
    a = float(rh.box_reg_loss(sp, jnp.asarray(deltas), num_classes,
                              normalizer=16.0))
    b = float(rh.box_reg_loss(sp, jnp.asarray(big), num_classes,
                              normalizer=16.0))
    np.testing.assert_allclose(a, b, rtol=1e-6)
