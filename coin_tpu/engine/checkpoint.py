"""Checkpointing via orbax (replaces coin/checkpoint/detection_checkpoint.py
DetectionTSCheckpointer: whole-TrainState save/restore including the EMA
teacher, merge net, both optimizers, prototypes and step)."""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, output_dir: str, prefix: str = "model"):
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.prefix = prefix
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"{self.prefix}_{step:07d}")

    def save(self, state: Any, step: int, name: Optional[str] = None,
             extras: Optional[dict] = None):
        path = (os.path.join(self.dir, name) if name
                else self._path(step))
        self._ckpt.save(path, jax.device_get(state), force=True)
        if extras:
            import json
            with open(path + ".extras.json", "w") as f:
                json.dump(extras, f)
        logger.info("saved checkpoint: %s", path)
        return path

    def load_extras(self, path: str) -> dict:
        import json
        p = path + ".extras.json"
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def latest_path(self) -> Optional[str]:
        if not os.path.isdir(self.dir):
            return None
        best, best_step = None, -1
        for d in os.listdir(self.dir):
            m = re.match(rf"{self.prefix}_(\d+)$", d)
            if m and int(m.group(1)) > best_step:
                best, best_step = os.path.join(self.dir, d), int(m.group(1))
        return best

    def load(self, path: str, target: Any) -> Any:
        restored = self._ckpt.restore(path, item=jax.device_get(target))
        logger.info("restored checkpoint: %s", path)
        return restored

    def load_tree(self, path: str) -> Any:
        """Structure-agnostic restore (no target): returns the raw
        nested dict. Lets a trainer load a checkpoint saved by a
        DIFFERENT trainer's TrainState shape — e.g. CoinTrainer taking
        params/prototypes from a PRETrainer checkpoint (the reference's
        'CLIPDET weights + collect file' fresh-start semantics,
        coin/engine/trainer.py:220-235)."""
        restored = self._ckpt.restore(path)
        logger.info("restored checkpoint tree: %s", path)
        return restored

    def load_latest(self, target: Any) -> Any:
        path = self.latest_path()
        if path is None:
            logger.info("no checkpoint found in %s", self.dir)
            return target
        return self.load(path, target)
