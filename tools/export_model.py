#!/usr/bin/env python
"""Export a trained checkpoint's eval forward to a serving artifact.

    python tools/export_model.py --config <cfg.yml> --resume <ckpt_dir> \
        --out model.stablehlo [--batch N]

The artifact is a single self-contained StableHLO file (weights baked in);
load it anywhere with

    from edge_enhancement_tpu.utils.export import load_serving_artifact
    fn = load_serving_artifact("model.stablehlo")
    logits = fn(x, seed)          # x: [B,H,W,C] float32 in [0,1]

(see edge_enhancement_tpu/utils/export.py). No model zoo, config system, or
checkpoint code is needed at serving time — only jax.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    from edge_enhancement_tpu.data.datasets import SPECS
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train import checkpoint as ckpt
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import create_train_state
    from edge_enhancement_tpu.utils.config import (apply_platform, base_parser,
                                                   load_config)
    from edge_enhancement_tpu.utils.export import save_serving_artifact

    parser = base_parser("export serving artifact")
    parser.add_argument("--out", default="model.stablehlo")
    parser.add_argument("--batch", type=int, default=None,
                        help="pin the batch dim (default: symbolic)")
    args = parser.parse_args()
    cfg = load_config(args.config, vars(args))
    apply_platform(cfg)

    spec = SPECS[cfg["dataset"]]
    size = int(cfg.get("cize") or cfg.get("crop_size") or spec.image_size)
    model = build_model(cfg["arch"], cfg, spec.num_classes)
    ops = ModelOps(model)
    sample = jnp.zeros((1, size, size, spec.channels), jnp.float32)
    state = create_train_state(ops, jax.random.PRNGKey(int(cfg.get("seed", 1))),
                               sample)
    if cfg.get("resume"):
        payload = ckpt.load_checkpoint(cfg["resume"], "best") or \
            ckpt.load_checkpoint(cfg["resume"], "last")
        if payload is None:
            raise FileNotFoundError(f"no checkpoint under {cfg['resume']}")
        state, epoch, _ = ckpt.restore_into_state(state, payload)
        print(f"=> loaded checkpoint (epoch {epoch})")
    save_serving_artifact(cfg["out"], ops, state.params, state.batch_stats,
                          size, spec.channels, batch=cfg.get("batch"))
    print(f"=> wrote {cfg['out']} "
          f"({os.path.getsize(cfg['out']) / 1e6:.1f} MB, "
          f"batch={'symbolic' if cfg.get('batch') is None else cfg['batch']})")


if __name__ == "__main__":
    main()
