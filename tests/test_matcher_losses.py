import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from coin_tpu.ops import losses as L
from coin_tpu.ops import matcher as M


def matcher_ref(quality, thresholds, labels, allow_low_quality):
    """detectron2 Matcher reference reimplementation (numpy)."""
    matched_vals = quality.max(0)
    matched_idx = quality.argmax(0)
    out = np.full(quality.shape[1], labels[0], np.int8)
    bounds = list(thresholds) + [np.inf]
    for (lo, hi), lab in zip(zip([-np.inf] + list(thresholds), bounds),
                             labels):
        sel = (matched_vals >= lo) & (matched_vals < hi)
        out[sel] = lab
    if allow_low_quality:
        best = quality.max(1, keepdims=True)
        rows, cols = np.nonzero((quality >= best) & (best > 0))
        out[cols] = 1
    return matched_idx, out


def test_matcher_matches_detectron2_semantics(rng):
    m, n = 6, 40
    quality = rng.rand(m, n).astype(np.float32)
    for allow in (False, True):
        idx, lab = M.match(jnp.asarray(quality), jnp.ones(m, bool),
                           (0.3, 0.7), (0, -1, 1), allow)
        ridx, rlab = matcher_ref(quality, (0.3, 0.7), (0, -1, 1), allow)
        np.testing.assert_array_equal(np.asarray(idx), ridx)
        np.testing.assert_array_equal(np.asarray(lab), rlab)


def test_matcher_invalid_gt_ignored(rng):
    quality = rng.rand(4, 20).astype(np.float32)
    gt_valid = np.array([True, False, True, False])
    idx, lab = M.match(jnp.asarray(quality), jnp.asarray(gt_valid),
                       (0.5,), (0, 1), False)
    ridx, rlab = matcher_ref(quality[gt_valid], (0.5,), (0, 1), False)
    np.testing.assert_array_equal(np.asarray(lab), rlab)
    # matched idx should point at valid gts only
    assert set(np.asarray(idx)).issubset({0, 2})


def test_matcher_no_valid_gt_all_negative(rng):
    quality = rng.rand(3, 10).astype(np.float32)
    _, lab = M.match(jnp.asarray(quality), jnp.zeros(3, bool),
                     (0.3, 0.7), (0, -1, 1), True)
    assert (np.asarray(lab) == 0).all()


def test_subsample_respects_counts(rng):
    labels = jnp.asarray(rng.choice([-1, 0, 1], size=200,
                                    p=[0.2, 0.6, 0.2]).astype(np.int8))
    pos, neg = M.subsample_labels(labels, 64, 0.25, jax.random.key(0))
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() <= 16
    assert pos.sum() + neg.sum() <= 64
    assert (np.asarray(labels)[pos] == 1).all()
    assert (np.asarray(labels)[neg] == 0).all()


# ------------------------- losses vs torch ------------------------- #
def test_mil_cross_entropy_matches_torch(rng):
    n, c = 30, 9
    logits = rng.randn(n, c).astype(np.float32)
    target = (rng.rand(n, c) > 0.7).astype(np.float32)
    target[target.sum(1) == 0, 0] = 1  # ensure ≥1 positive per row
    tx = torch.tensor(logits)
    tt = torch.tensor(target)
    probs = torch.exp(tx) / torch.exp(tx).sum(-1, keepdim=True)
    ref = (-torch.log((tt * probs).sum(-1))).mean().item()
    got = L.mil_cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                              jnp.ones(n, bool))
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_mil_cross_entropy_empty_is_zero():
    got = L.mil_cross_entropy(jnp.zeros((4, 3)), jnp.zeros((4, 3)),
                              jnp.zeros(4, bool))
    assert float(got) == 0.0


def test_kl_div_matches_torch(rng):
    n, c = 12, 5
    logp = np.log(rng.dirichlet(np.ones(c), n)).astype(np.float32)
    target = rng.dirichlet(np.ones(c), n).astype(np.float32)
    ref = F.kl_div(torch.tensor(logp), torch.tensor(target),
                   reduction="batchmean").item()
    got = L.kl_div(jnp.asarray(logp), jnp.asarray(target), jnp.ones(n, bool))
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_gradient_discrepancy_matches_torch(rng):
    # two tiny "grad pytrees": a flax (in, out) kernel and a bias; the
    # torch reference weight is the transpose (out, in) with cosine over
    # dim=1 (per output unit, coin/utils/losses.py:89-92)
    ga = {"w": rng.randn(8, 4).astype(np.float32),
          "b": rng.randn(8).astype(np.float32)}
    gb = {"w": rng.randn(8, 4).astype(np.float32),
          "b": rng.randn(8).astype(np.float32)}
    got = L.gradient_discrepancy(jax.tree.map(jnp.asarray, ga),
                                 jax.tree.map(jnp.asarray, gb))
    sim_w = F.cosine_similarity(torch.tensor(ga["w"].T),
                                torch.tensor(gb["w"].T), dim=1).mean()
    sim_b = F.cosine_similarity(torch.tensor(ga["b"]),
                                torch.tensor(gb["b"]), dim=0)
    ref = (1.0 - torch.stack([sim_b, sim_w]).mean()).item()
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_smooth_l1_matches_torch(rng):
    a = rng.randn(20, 4).astype(np.float32)
    b = rng.randn(20, 4).astype(np.float32)
    got = np.asarray(L.smooth_l1(jnp.asarray(a), jnp.asarray(b), beta=1.0))
    ref = F.smooth_l1_loss(torch.tensor(a), torch.tensor(b), beta=1.0,
                           reduction="none").numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    got0 = np.asarray(L.smooth_l1(jnp.asarray(a), jnp.asarray(b), beta=0.0))
    np.testing.assert_allclose(got0, np.abs(a - b), rtol=1e-6)
