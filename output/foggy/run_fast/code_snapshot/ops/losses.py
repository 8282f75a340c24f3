"""Loss primitives — masked, functional versions of coin/utils/losses.py and
the distillation/KL/regression losses spread across
coin/modeling/roi_heads/fast_rcnn.py and coin/modeling/proposal_generator/
rpn.py.

Every loss takes an explicit ``valid`` mask and does its own safe reduction:
mean over valid rows, exact 0.0 when no row is valid (the reference's
``0.0 * loss.sum()`` idiom, losses.py:32).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.sum(valid)
    return jnp.where(cnt > 0, jnp.sum(jnp.where(valid, x, 0.0))
                     / jnp.maximum(cnt, 1), 0.0)


def mil_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                      valid: jnp.ndarray,
                      weights: Optional[jnp.ndarray] = None,
                      avg_positives: bool = False) -> jnp.ndarray:
    """Multi-instance CE (coin/utils/losses.py:6-34): softmax over logits,
    −log Σ target·p (or the positive-average variant)."""
    probs = jax.nn.softmax(logits, axis=-1)
    pos = jnp.sum(target * probs, axis=-1)
    if avg_positives:
        pos = pos / (jnp.sum(target, axis=-1) + 1e-6)
    loss = -jnp.log(jnp.maximum(pos, 1e-20))
    if weights is not None:
        loss = loss * weights
    return masked_mean(loss, valid)


def mil_focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
                   valid: jnp.ndarray, alpha: Optional[jnp.ndarray] = None,
                   gamma: float = 1.5,
                   avg_positives: bool = True) -> jnp.ndarray:
    """Multi-instance focal loss (coin/utils/losses.py:36-73)."""
    num_classes = logits.shape[-1]
    if alpha is None:
        alpha = jnp.ones((num_classes,), logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    a = jnp.sum(target * alpha[None, :], axis=-1) \
        / (jnp.sum(target, axis=-1) + 1e-6)
    p = jnp.sum(target * probs, axis=-1)
    if avg_positives:
        p = p / (jnp.sum(target, axis=-1) + 1e-6)
    loss = -a * ((1.0 - p) ** gamma) * jnp.log(jnp.maximum(p, 1e-20))
    return masked_mean(loss, valid)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 0.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (detectron2 convention: beta=0 → pure L1)."""
    diff = jnp.abs(pred - target)
    if beta <= 0.0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def kl_div(log_pred: jnp.ndarray, target_probs: jnp.ndarray,
           valid: jnp.ndarray) -> jnp.ndarray:
    """KL(target || pred) with 'batchmean'-like masked reduction — mirrors
    torch F.kl_div(log_softmax(x), target) usage in the RPN distillation
    (coin/modeling/proposal_generator/rpn.py:326-340) and the C-box prob
    distillation (fast_rcnn.py:540-545)."""
    per_elem = target_probs * (jnp.log(jnp.maximum(target_probs, 1e-20))
                               - log_pred)
    per_row = jnp.sum(per_elem, axis=-1)
    return masked_mean(per_row, valid)


def cosine_rows(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1,
                eps: float = 1e-8) -> jnp.ndarray:
    na = jnp.linalg.norm(a, axis=axis)
    nb = jnp.linalg.norm(b, axis=axis)
    return jnp.sum(a * b, axis=axis) / jnp.maximum(na * nb, eps)


def gradient_discrepancy(grads_a, grads_b) -> jnp.ndarray:
    """1 − mean cosine between two gradient pytrees (coin/utils/losses.py:
    75-96): per parameter, matrices use a per-output-unit cosine then
    mean, vectors a single cosine; the loss averages over parameters.
    ``grads_a`` is the detached branch.

    NOTE: torch Linear weights are (out, in) and the reference takes
    cosine over dim=1 (per output row); flax kernels are (in, out), so
    matrices here reduce over axis 0 (per output column).
    """
    sims = []
    for ga, gb in zip(jax.tree_util.tree_leaves(grads_a),
                      jax.tree_util.tree_leaves(grads_b)):
        ga = jax.lax.stop_gradient(ga)
        if ga.ndim > 1:
            ga2 = ga.reshape(-1, ga.shape[-1])
            gb2 = gb.reshape(-1, gb.shape[-1])
            sims.append(jnp.mean(cosine_rows(ga2, gb2, axis=0)))
        else:
            sims.append(cosine_rows(ga, gb))
    return 1.0 - jnp.mean(jnp.stack(sims))
