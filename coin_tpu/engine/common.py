"""Shared engine utilities: batch conversion, token tables, metric logging."""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from coin_tpu.data.loader import Batch
from coin_tpu.structures import Detections

logger = logging.getLogger(__name__)


def batch_gt_detections(batch: Batch) -> Detections:
    """Ground-truth boxes of a host Batch as batched Detections (canvas
    coordinates)."""
    return Detections(
        boxes=jnp.asarray(batch.gt_boxes),
        scores=jnp.ones(batch.gt_classes.shape, jnp.float32),
        classes=jnp.asarray(batch.gt_classes),
        valid=jnp.asarray(batch.gt_valid),
        probs=None,
    )


def simple_class_tokens(num_classes_with_bg: int, context_length: int = 77,
                        prompt_tmp_len: int = 4,
                        add_prompt_num: int = 4) -> np.ndarray:
    """Synthetic per-class token table for runs without real CLIP weights:
    layout matches the learnable-prompt template
    [SOS][tmpl×4][X×4][cls][EOT][pad...] so the prompted path exercises the
    same slicing as with real CLIP tokens."""
    c = num_classes_with_bg
    toks = np.zeros((c, context_length), np.int32)
    sot, eot = 400, 500
    toks[:, 0] = sot
    for i in range(c):
        pos = 1
        for t in range(prompt_tmp_len):
            toks[i, pos] = 10 + t
            pos += 1
        for t in range(add_prompt_num):
            toks[i, pos] = 30 + t
            pos += 1
        toks[i, pos] = 100 + i
        toks[i, pos + 1] = eot
    return toks


def rescale_to_original(det_np: Dict[str, np.ndarray],
                        scale: float) -> Dict[str, np.ndarray]:
    out = dict(det_np)
    out["boxes"] = det_np["boxes"] / scale
    return out


def lr_value(schedule, step) -> float:
    """LR for logging: prefer the schedule's pure-python `.host` mirror
    (no device dispatch per log line — the remote-TPU relay
    intermittently rejects tiny eager executables)."""
    host = getattr(schedule, "host", None)
    if host is not None:
        return host(step)
    return float(schedule(step))


class MetricLogger:
    """Console + metrics.json (+ optional TensorBoard) writer (replaces
    CommonMetricPrinter / JSONWriter / TensorboardXWriter,
    coin/utils/util.py:270-400)."""

    def __init__(self, output_dir: str, max_iter: int, period: int = 20,
                 tensorboard: bool = False):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.json")
        self.period = period
        self.max_iter = max_iter
        self._window = defaultdict(list)
        self._t0 = time.perf_counter()
        self._last_step = None    # last FLUSHED step (iter-time base)
        self._last_logged = None  # last step passed to log()
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=output_dir)
            except Exception as e:  # keep training alive without TB
                logger.warning("TensorBoard writer unavailable: %s", e)

    def log(self, step: int, metrics: Dict[str, float]):
        """Buffer metrics; flush every `period` steps.

        Values may be device scalars (e.g. the loss dict straight out of
        a jitted step): they are buffered as-is and materialized only at
        the flush boundary, so the train loop never forces a host←device
        round-trip per step (the async dispatch queue stays full).
        """
        for k, v in metrics.items():
            self._window[k].append(v)
        self._last_logged = step
        if step % self.period != 0:
            return
        window = jax.device_get(dict(self._window))
        means = {k: float(np.mean(v)) for k, v in window.items()}
        self._window.clear()
        now = time.perf_counter()
        if self._last_step is not None:
            it_time = (now - self._t0) / max(step - self._last_step, 1)
            eta = it_time * (self.max_iter - step)
            means["iter_time"] = it_time
            means["eta_min"] = eta / 60.0
        self._t0, self._last_step = now, step
        loss_str = "  ".join(f"{k}: {v:.4g}" for k, v in sorted(
            means.items()) if k.startswith("loss"))
        logger.info("iter %d  %s  it/s %.2f", step, loss_str,
                    1.0 / means.get("iter_time", float("inf"))
                    if means.get("iter_time") else 0.0)
        with open(self.path, "a") as f:
            f.write(json.dumps({"iteration": step, **means}) + "\n")
        if self._tb is not None:
            for k, v in means.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        # flush any residual window so the tail iterations aren't lost
        if self._window:
            window = jax.device_get(dict(self._window))
            means = {k: float(np.mean(v)) for k, v in window.items()}
            # stamp the residual flush with the step actually logged
            # last, not the previous flush boundary (which would both
            # mislabel the tail and duplicate an iteration key)
            step = (self._last_logged if self._last_logged is not None
                    else 0)
            with open(self.path, "a") as f:
                f.write(json.dumps({"iteration": step, **means}) + "\n")
            self._window.clear()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
