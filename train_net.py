#!/usr/bin/env python
"""coin_tpu training/eval entry point.

Mirrors the reference CLI surface (train_net.py: --config, --eval-only,
--resume, KEY VALUE overrides; trainer dispatch on CLOUD.Trainer) on the
TPU-native engine. Multi-process launch is replaced by the JAX runtime:
one process drives all local devices through the data mesh.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="coin_tpu train/eval")
    p.add_argument("--config", "--config-file", dest="config", default="")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--test_model_role", default="student",
                   choices=["student", "teacher"])
    p.add_argument("--data-root", default=None,
                   help="override DATASETS.ROOT")
    p.add_argument("--device", default=None,
                   help="force a JAX platform (cpu/tpu)")
    # reference-CLI compatibility (the JAX runtime replaces the
    # detectron2 multi-process launcher; these are accepted and ignored)
    p.add_argument("--num-gpus", type=int, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--num-machines", type=int, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--machine-rank", type=int, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--dist-url", default=None, help=argparse.SUPPRESS)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                   help="KEY VALUE config overrides")
    return p.parse_args(argv)


def setup(args):
    # --device wins; else honor JAX_PLATFORMS even when a sitecustomize
    # pins an accelerator platform (the env var alone is overridden)
    platform = args.device or os.environ.get("JAX_PLATFORMS")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    from coin_tpu.config import load_config
    cfg = load_config(args.config or None, args.opts)
    if args.data_root:
        cfg.DATASETS.ROOT = args.data_root
    from coin_tpu.data.voc import register_pascal_voc
    for spec in cfg.DATASETS.get("CUSTOM", []):
        register_pascal_voc(spec["NAME"], spec["DIRNAME"], spec["SPLIT"],
                            spec["CLASSES"], spec.get("EXT", ".jpg"))
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(name)s] %(message)s",
        handlers=[logging.StreamHandler(sys.stdout),
                  logging.FileHandler(os.path.join(cfg.OUTPUT_DIR,
                                                   "log.txt"))])
    logging.getLogger(__name__).info("config: %s  trainer: %s",
                                     args.config, cfg.CLOUD.Trainer)
    from coin_tpu.utils.setup import default_setup
    default_setup(cfg)
    return cfg


def build_trainer(cfg):
    name = cfg.CLOUD.Trainer
    if name == "OracleTrainer":
        from coin_tpu.engine.oracle import OracleTrainer
        return OracleTrainer(cfg)
    if name == "PRETrainer":
        from coin_tpu.engine.pre_train import PRETrainer
        return PRETrainer(cfg)
    if name == "CoinTrainer":
        from coin_tpu.engine.trainer import CoinTrainer
        return CoinTrainer(cfg)
    if name == "ModelZoo_test":
        # evaluate a released targetDET checkpoint (scripts/modelzoo/*)
        from coin_tpu.engine.results_store import ResultStore
        from coin_tpu.engine.trainer import CoinTrainer
        from coin_tpu.data.voc import get_dataset
        spec = get_dataset(cfg.DATASETS.TEST[0])
        return CoinTrainer(cfg, store=ResultStore(len(spec.class_names)))
    if name in ("GDINO_test", "GLIP_test", "CLIP_test"):
        from coin_tpu.engine.test import build_eval_trainer
        return build_eval_trainer(cfg, name)
    raise ValueError(f"unknown CLOUD.Trainer: {name}")


def main(argv=None):
    args = parse_args(argv)
    cfg = setup(args)
    trainer = build_trainer(cfg)
    # eval-only is implied for the test trainers (reference
    # train_net.py:49-50 auto-forces it for the *_test trainers)
    if not hasattr(trainer, "train"):
        args.eval_only = True
    if args.eval_only:
        trainer.resume_or_load(resume=args.resume)
        if (args.test_model_role == "teacher"
                and hasattr(trainer, "test_teacher")):
            results = trainer.test_teacher()
        else:
            results = trainer.test()
        from coin_tpu.evaluation import print_csv_format, verify_results
        print(print_csv_format(results))
        verify_results(cfg.TEST.EXPECTED_RESULTS, results)
        return results
    trainer.resume_or_load(resume=args.resume)
    trainer.train()
    return None


if __name__ == "__main__":
    main()
