"""Functional train state + parameter partitioning.

The reference mutates module buffers and keeps four separate nn.Modules in
an EnsembleTSModel (coin/modeling/meta_arch/ts_ensemble.py). Here ALL
evolving state is one pytree:

    TrainState(params, frozen, opt_state, step, rng, prototypes,
               teacher_params, merge_params, merge_opt_state)

- ``params``    — trainable student leaves (what jax.grad differentiates).
- ``frozen``    — frozen leaves (text trunk, FrozenBN stats, optionally the
  visual backbone). Merged back before apply; excluded from grads so XLA
  never builds their backward pass.
- EMA teacher update (ts_ensemble.py:38-69) is a pure tree_map.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util
from flax.core import freeze, unfreeze


def partition_params(variables: Dict, is_frozen: Callable[[str], bool]
                     ) -> Tuple[Dict, Dict]:
    """Split a flax variables['params'] tree into (trainable, frozen) by a
    path predicate ('/'-joined lowercase path)."""
    flat = traverse_util.flatten_dict(unfreeze(variables["params"]))
    train, frozen = {}, {}
    for k, v in flat.items():
        path = "/".join(k)
        (frozen if is_frozen(path) else train)[k] = v
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_params(params: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(params))
    flat.update(traverse_util.flatten_dict(frozen))
    return {"params": traverse_util.unflatten_dict(flat)}


def default_freeze_predicate(update_backbone: bool = True,
                             freeze_at: int = 2
                             ) -> Callable[[str], bool]:
    """Freeze policy of the reference: text trunk always frozen
    (clip_text.py freeze_encoder); every FrozenBN leaf frozen; and the
    detectron2 stage freeze — the CLIP ResNet is BUILT with
    ``MODEL.BACKBONE.FREEZE_AT`` (detectron2 default **2**: stem AND
    layer1 permanently frozen; coin/modeling/utils.py:243-283 freeze(),
    clip_backbone.py:191; no shipped reference config overrides it), so
    the stem/res2 never train in ANY reference run. UPDATE_BACKBONE
    only controls the REST of the backbone (clip_backbone.py:177
    freeze_backbone freezes everything but layer4 when False).

    Freezing the stem also stops the backward pass at layer2's input —
    the round-3 trace showed stem weight-gradients alone cost ~11% of
    the cached adaptation step (pathological small-channel wgrad
    emitters), all of it work the reference never does.
    """

    def pred(path: str) -> bool:
        p = path.lower()
        if "text_trunk" in p:
            return True
        if "/bn" in p or p.startswith("bn") or "downsample_bn" in p:
            return True
        if "backbone/" in p:
            if freeze_at >= 1 and "layer" not in p:
                return True  # stem conv1-3 (+ their bns, caught above)
            for idx, stage in enumerate(
                    ("layer1/", "layer2/", "layer3/"), start=2):
                if freeze_at >= idx and stage in p:
                    return True
            if not update_backbone and "layer4" not in p:
                return True
        return False

    return pred


def _is_relay_backend() -> bool:
    """True when the TPU is reached through a remote-compile relay (the
    'axon' transport) rather than direct-attached. The relay rejects the
    first execution of donated train-step executables (BENCH.md,
    tools/probe_donation.py), so donation must default off there — but
    only there."""
    try:
        from jax._src import xla_bridge
        return "axon" in xla_bridge.get_backend().platform_version.lower()
    except Exception:
        return False


# The TrainState leaves that dominate HBM (three same-sized trees:
# student params, SGD momentum, EMA teacher). "hot" donation donates
# exactly these — the round-5 bisect (tools/probe_donate_bisect, logged
# in BENCH.md) showed the axon relay accepts donation of these heavy
# leaves and rejects the step only when the SMALL leaves
# (prototypes/merge/rng/step) are donated alongside them.
_HOT_FIELDS = ("params", "opt_state", "teacher_params")


def jit_train_step(fn, donate_default: bool = True):
    """jit a `(state, *batch) -> (state, aux)` train step, donating the
    TrainState on accelerator backends. Donation lets XLA alias the
    input params/opt_state/teacher buffers with the outputs instead of
    double-buffering them (the TrainState dominates HBM at production
    scale).

    Donation modes (``COIN_TPU_DONATE`` = ``0`` / ``1`` / ``hot``):
    - **full** (``1``): donate the whole TrainState — the default on
      direct-attached TPUs.
    - **hot** (``hot``): donate only params/opt_state/teacher_params
      via a split-state inner jit. Same HBM win (those three trees are
      ~all of the state), but avoids donating the small leaves the
      axon relay rejects (round-5 bisect: full donation of the real
      dual-teacher step dies with INVALID_ARGUMENT exactly when
      prototypes/merge/rng/step are in the donated set; the heavy
      three alone run fine). ``frozen`` — pass-through by contract in
      every step_builder step — is re-attached host-side so it is
      neither donated nor copied through the jit boundary.
    - **off** (``0``): plain jit.

    Defaults: CPU → off (the virtual multi-device mesh crashes when
    donated buffers alias across a collective rendezvous, see
    BENCH.md); axon relay → off pending the hot-mode A/B below;
    direct-attached TPU → full.
    """
    import os
    env = os.environ.get("COIN_TPU_DONATE", "")
    if env:
        mode = {"0": "off", "1": "full", "full": "full",
                "hot": "hot"}.get(env, "off")
    else:
        if jax.default_backend() == "cpu" or not donate_default:
            mode = "off"
        elif _is_relay_backend():
            mode = "off"
        else:
            mode = "full"
    if mode == "off":
        return jax.jit(fn)
    if jax.default_backend() == "cpu" and mode == "full":
        return jax.jit(fn)
    if mode == "full":
        return jax.jit(fn, donate_argnums=(0,))

    # hot: split the state so ONLY the heavy evolving trees cross the
    # boundary as donated buffers. `frozen` (pass-through by contract
    # in every step_builder/pre_train step) stays a plain INPUT — free
    # — but is stripped from the jitted OUTPUT (returning a non-donated
    # input would copy it every step) and re-attached host-side.
    def inner_fn(hot, cold, *batch):
        state = cold.replace(**hot)
        new_state, aux = fn(state, *batch)
        new_hot = {f: getattr(new_state, f) for f in _HOT_FIELDS}
        new_cold = new_state.replace(
            frozen=None, **{f: None for f in _HOT_FIELDS})
        return new_hot, new_cold, aux

    if jax.default_backend() == "cpu":
        inner = jax.jit(inner_fn)
    else:
        inner = jax.jit(inner_fn, donate_argnums=(0,))

    def wrapper(state, *batch):
        hot = {f: getattr(state, f) for f in _HOT_FIELDS}
        cold = state.replace(**{f: None for f in _HOT_FIELDS})
        new_hot, new_cold, aux = inner(hot, cold, *batch)
        return new_cold.replace(frozen=state.frozen, **new_hot), aux

    wrapper.__wrapped__ = fn
    return wrapper


def ema_update(teacher: Dict, student: Dict, keep_rate: float) -> Dict:
    """Mean-teacher EMA: t ← s·(1−k) + t·k (ts_ensemble.py:58-63)."""
    return jax.tree.map(
        lambda t, s: t * keep_rate + s.astype(t.dtype) * (1.0 - keep_rate),
        teacher, student)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Prototypes:
    """Evolving class-prototype buffers (clip_text.py:262-279 buffers +
    fast_rcnn.py:399-517 EMA updates)."""
    proto: jnp.ndarray            # per_class_feat (C+1, D)
    b_online: jnp.ndarray
    b_offline: jnp.ndarray


def prototype_ema(current: jnp.ndarray, feats: jnp.ndarray,
                  one_hot: jnp.ndarray, valid: jnp.ndarray,
                  rate: float) -> jnp.ndarray:
    """EMA class-mean update (fast_rcnn.py:399-412): classes present in the
    batch move toward the batch class-mean of (normalized) features; absent
    classes keep their value."""
    oh = jnp.where(valid[:, None], one_hot, 0.0)
    counts = jnp.sum(oh, axis=0)                       # (C+1,)
    sums = oh.T @ feats.astype(jnp.float32)            # (C+1, D)
    mean = sums / jnp.maximum(counts, 1.0)[:, None]
    present = (counts > 0)[:, None]
    new = jnp.where(present, mean, current)
    return current * rate + (1.0 - rate) * new


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    frozen: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array
    prototypes: Optional[Prototypes] = None
    teacher_params: Optional[Any] = None
    merge_params: Optional[Any] = None
    merge_opt_state: Optional[Any] = None

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)
