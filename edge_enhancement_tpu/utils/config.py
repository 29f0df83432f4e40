"""YAML + CLI config system.

Same contract as the reference (utils/helper.py:115-127): load the YAML into
an attribute-access dict, then overlay argparse vars — CLI wins. The YAML
schema keeps the reference's hyperparameter keys (method_name, arch, epsilon,
num_steps_1..3, r/w/low/high/alpha/sigma/type_canny/n_queries, ...) plus
`dataset:` and `lr_schedule:` which the reference hard-codes per driver.
"""

from __future__ import annotations

import argparse
from typing import Any, Mapping, Optional

import yaml


class Config(dict):
    """dict with attribute access (EasyDict equivalent, no external dep)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def get_float(self, k, default=None):
        v = self.get(k, default)
        return None if v is None else float(v)


# dataset -> (default lr_schedule, num_classes, image size)
DATASET_DEFAULTS = {
    "mnist": {"lr_schedule": "multistep", "num_classes": 10, "cize": 28},
    "cifar100": {"lr_schedule": "piecewise_50_75", "num_classes": 100, "cize": 32},
    "tiny_imagenet": {"lr_schedule": "piecewise_50_75", "num_classes": 200, "cize": 64},
    "imagenet": {"lr_schedule": "step30", "num_classes": 1000, "cize": 224},
}


def load_config(path: str, cli_overrides: Optional[Mapping[str, Any]] = None) -> Config:
    with open(path) as f:
        cfg = Config(yaml.safe_load(f))
    dataset = cfg.get("dataset")
    if dataset in DATASET_DEFAULTS:
        for k, v in DATASET_DEFAULTS[dataset].items():
            cfg.setdefault(k, v)
    if cli_overrides:
        for k, v in cli_overrides.items():
            if v is not None:
                cfg[k] = v
    return cfg


def base_parser(description: str = "edge_enhancement_tpu trainer") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True, help="YAML config path")
    p.add_argument("--data", default=None,
                   help="dataset root dir, or 'synthetic'")
    p.add_argument("--evaluate", action="store_true", default=None)
    p.add_argument("--resume", default=None, help="checkpoint dir to resume")
    p.add_argument("--pretrained", default=None,
                   help="warm-start the backbone from a torchvision-format "
                        "torch state_dict (.pth); shape-mismatched heads "
                        "keep their fresh init (reference --pretrained, "
                        "experiments_imagenet.py:65-81)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", dest="batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--steps-per-dispatch", dest="steps_per_dispatch",
                   type=int, default=None,
                   help="device-side multi-step loop: K train steps per "
                        "dispatch (lax.scan over a batch stack)")
    p.add_argument("--restarts", type=int, default=None,
                   help="PGD restarts for the validation battery "
                        "(reference main_fast.py --restarts)")
    p.add_argument("--limit-batches", dest="limit_batches", type=int, default=None,
                   help="cap batches per epoch (smoke testing)")
    p.add_argument("--synthetic-size", dest="synthetic_size", type=int,
                   default=None,
                   help="train-split size when --data synthetic "
                        "(default 512; eval split uses half)")
    p.add_argument("--output", default="output", help="checkpoint/log root")
    p.add_argument("--print-freq", dest="print_freq", type=int, default=None)
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace of the first few steps "
                        "into this directory")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu) — the environment's "
                        "axon import hook overrides JAX_PLATFORMS, so this "
                        "re-sets jax.config after import")
    return p


def apply_platform(cfg) -> None:
    """Apply --platform AFTER jax import (see CLAUDE.md: the axon plugin
    force-appends itself during `import jax`, ignoring the env var), and
    enable the persistent compilation cache — remote-TPU compiles of the
    fused attack steps take minutes, and every CLI invocation would
    otherwise pay them again (bench.py already did this)."""
    import os

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/ee_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if cfg.get("platform"):
        jax.config.update("jax_platforms", str(cfg["platform"]))
