"""Optimizer / LR schedule factory (optax).

Mirrors coin/solver/build.py + lr_scheduler.py:
- SGD with momentum / nesterov / weight decay.
- Per-module LR multipliers: substring match on the parameter path with
  later-keys-override semantics (build.py:193-196) — e.g.
  {'backbone': 0.1, 'logit_scale': 0.0}.
- ``WarmupTwoStageMultiStepLR``: lr = base · warmup(t) ·
  factor_list[bisect(milestones, t)] (lr_scheduler.py:51-62) — this is what
  produces the burn-up → step-two LR jump (1, 0.1, 0.5, 0.1).

Freezing is expressed as a 0.0 multiplier (the engine additionally
partitions frozen subtrees out of the differentiated params entirely).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import optax


def two_stage_lr_schedule(base_lr: float, milestones: Sequence[int],
                          factor_list: Sequence[float],
                          warmup_iters: int = 1000,
                          warmup_factor: float = 0.001):
    """Returns an optax-compatible schedule fn iter → lr."""
    assert len(factor_list) == len(milestones) + 1
    milestones = jnp.asarray(list(milestones))
    factors = jnp.asarray(list(factor_list), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # linear warmup (detectron2 _get_warmup_factor_at_iter)
        alpha = step / jnp.maximum(warmup_iters, 1)
        warm = jnp.where(step >= warmup_iters, 1.0,
                         warmup_factor * (1 - alpha) + alpha)
        idx = jnp.sum(step >= milestones)
        return base_lr * warm * factors[idx]

    def host(step) -> float:
        """Pure-python mirror for logging: the jnp schedule traces inside
        the jitted step; calling it eagerly per log line would dispatch a
        tiny device executable (and the remote-TPU relay intermittently
        rejects those with INVALID_ARGUMENT)."""
        import bisect
        step = float(step)
        alpha = step / max(warmup_iters, 1)
        warm = (1.0 if step >= warmup_iters
                else warmup_factor * (1 - alpha) + alpha)
        idx = bisect.bisect_right(list(milestone_list), step)
        return float(base_lr * warm * factor_list[idx])

    milestone_list = list(milestones.tolist())
    schedule.host = host
    return schedule


def lr_multiplier_for_path(path: str,
                           overrides: Dict[str, float]) -> float:
    """Later-keys-override substring matching (coin/solver/build.py:193-196):
    every dict key that is a substring of the parameter path overwrites the
    multiplier, in dict order."""
    mult = 1.0
    for key, value in overrides.items():
        if key in path:
            mult = float(value)
    return mult


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def make_schedule(sol):
    """LR schedule dispatch (coin/solver/build.py:24-59)."""
    name = sol.get("LR_SCHEDULER_NAME", "WarmupTwoStageMultiStepLR")
    if name == "WarmupTwoStageMultiStepLR":
        return two_stage_lr_schedule(
            sol.BASE_LR, sol.STEPS, sol.FACTOR_LIST, sol.WARMUP_ITERS,
            sol.WARMUP_FACTOR)
    if name == "WarmupMultiStepLR":
        gamma = sol.get("GAMMA", 0.1)
        factors = [gamma ** i for i in range(len(sol.STEPS) + 1)]
        return two_stage_lr_schedule(
            sol.BASE_LR, sol.STEPS, factors, sol.WARMUP_ITERS,
            sol.WARMUP_FACTOR)
    if name == "WarmupCosineLR":
        warm = optax.linear_schedule(
            sol.BASE_LR * sol.WARMUP_FACTOR, sol.BASE_LR,
            sol.WARMUP_ITERS)
        cos = optax.cosine_decay_schedule(
            sol.BASE_LR, max(sol.MAX_ITER - sol.WARMUP_ITERS, 1))
        return optax.join_schedules([warm, cos], [sol.WARMUP_ITERS])
    raise ValueError(f"unknown scheduler: {name}")


# named param groups (coin/solver/build.py only_text_encoder dispatch):
# 'all' trains everything; 'cls' only the text-encoder side
# (learnable prompts); 'backbone' everything except it
GROUP_FILTERS = {
    "all": {},
    "cls": {"": 0.0, "prompted_text": 1.0},
    "backbone": {"prompted_text": 0.0},
}


def build_optimizer(params, cfg, overrides: Dict[str, float] = None,
                    name: str = "all"):
    """SGD + schedule + per-path multipliers for a param pytree.

    Returns optax.GradientTransformation; multipliers are baked in via a
    mask-scaled transform chain so a single update call covers all groups.
    ``name`` selects the reference's named param groups.
    """
    sol = cfg.SOLVER
    overrides = overrides if overrides is not None else (
        sol.PER_MODULE_PARAM_WEIGHT[0] if sol.PER_MODULE_PARAM_WEIGHT
        else {})
    # group exclusions are applied AFTER config multipliers so they win
    # (later substring keys override earlier ones)
    merged = dict(overrides)
    merged.update(GROUP_FILTERS[name])
    overrides = merged

    schedule = make_schedule(sol)

    mults = jax.tree_util.tree_map_with_path(
        lambda p, _: lr_multiplier_for_path(_path_str(p), overrides), params)

    chain = [optax.add_decayed_weights(sol.WEIGHT_DECAY)]
    if sol.MOMENTUM:
        chain.append(optax.trace(decay=sol.MOMENTUM,
                                 nesterov=bool(sol.NESTEROV)))
    chain.append(optax.scale_by_learning_rate(schedule))
    chain.append(_scale_by_tree(mults))
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        chain.insert(0, optax.clip_by_global_norm(
            cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
    return optax.chain(*chain), schedule


def _scale_by_tree(mults):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, mults), state

    return optax.GradientTransformation(init_fn, update_fn)
