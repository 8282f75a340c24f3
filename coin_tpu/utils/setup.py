"""Run setup: seeding, environment dump, config/code snapshot
(replaces coin/utils/util.py:27-121 default_setup / seed_all_rng /
copy_codes)."""

from __future__ import annotations

import logging
import os
import random
import shutil
import sys
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def seed_all(seed: int, rank: int = 0) -> int:
    """Deterministic per-process seeding (util.py:100-121)."""
    seed = seed + rank
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def dump_environment() -> str:
    import jax
    lines = [
        f"python: {sys.version.split()[0]}",
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"process: {jax.process_index()}/{jax.process_count()}",
    ]
    return "\n".join(lines)


def snapshot_run(cfg, output_dir: str, note: str = "") -> None:
    """Reproducibility artifacts: merged config dump, source snapshot,
    run note (train_net.py:60-68 semantics)."""
    import yaml
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(_plain(cfg), f, sort_keys=False)
    if note:
        with open(os.path.join(output_dir, "note.txt"), "w") as f:
            f.write(note + "\n")
    # snapshot the coin_tpu package only (the reference copies coin/,
    # train_net.py:60-68)
    src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(output_dir, "code_snapshot")
    if not os.path.exists(dst):
        shutil.copytree(src, dst, ignore=shutil.ignore_patterns(
            "__pycache__", "*.pyc", "*.so", ".git", ".jax_cache",
            "output", "datasets"))
    logger.info("run snapshot written to %s", output_dir)


def _plain(node):
    if isinstance(node, dict):
        return {k: _plain(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_plain(v) for v in node]
    return node


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache (first compile of the big step
    programs takes minutes through the remote-compile relay; cached
    executables load in seconds and bypass the relay's payload limit)."""
    import jax
    cache = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def default_setup(cfg, output_dir: Optional[str] = None,
                  note: str = "") -> None:
    out = output_dir or cfg.OUTPUT_DIR
    seed_all(cfg.SEED)
    enable_compile_cache()
    logger.info("environment:\n%s", dump_environment())
    snapshot_run(cfg, out, note)
