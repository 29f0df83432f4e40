"""Locate the first non-finite step of a training config on real data.

Runs the config's REAL train step (no steps_per_dispatch) on synthetic-hard
batches, logging loss / logit / param / grad health per step until the
first NaN, then dumps which metric went non-finite first.

    python tools/probe_nan.py --config .../trades_training.yml --steps 80
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=10000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from edge_enhancement_tpu.utils.config import apply_platform, load_config
    cfg = load_config(args.config, {"platform": args.platform})
    apply_platform(cfg)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from edge_enhancement_tpu.data.datasets import get_dataset
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.parallel import mesh as meshlib
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import (OptimConfig,
                                                    build_train_step,
                                                    create_train_state)
    from train import make_method_config

    train_ds, spec = get_dataset(cfg["dataset"], "synthetic-hard", train=True,
                                 synthetic_size=args.size)
    bs = int(cfg["batch_size"])
    model = build_model(cfg["arch"], cfg, spec.num_classes)
    ops = ModelOps(model)
    mesh = meshlib.make_mesh()
    sample_x, _ = next(train_ds.batches(2, shuffle=False, seed=0))
    state = create_train_state(ops, jax.random.PRNGKey(1),
                               jnp.asarray(sample_x[:1]))
    state = meshlib.replicate(mesh, state)
    mcfg = make_method_config(cfg, spec.num_classes)
    opt = OptimConfig(momentum=float(cfg.get("momentum", 0.9)),
                      weight_decay=float(cfg.get("weight_decay", 0.0)))
    step = build_train_step(ops, mcfg, opt, mesh=mesh, donate=False)

    @jax.jit
    def health(state, x, y, key):
        logits = ops.logits_eval(state.params, state.batch_stats, x, key)
        pmax = jax.tree.reduce(jnp.maximum,
                               jax.tree.map(lambda p: jnp.abs(p).max(),
                                            state.params))
        pfinite = jax.tree.reduce(
            jnp.logical_and,
            jax.tree.map(lambda p: jnp.isfinite(p).all(), state.params))
        bsfin = jax.tree.reduce(
            jnp.logical_and,
            jax.tree.map(lambda p: jnp.isfinite(p).all(), state.batch_stats))
        return {"logit_max": jnp.abs(logits).max(),
                "logit_finite": jnp.isfinite(logits).all(),
                "param_max": pmax, "params_finite": pfinite,
                "stats_finite": bsfin}

    key = jax.random.PRNGKey(0)
    lr = jnp.float32(cfg["lr"])
    i = 0
    for x, y in train_ds.batches(bs, shuffle=True, seed=1, epoch=0,
                                 as_uint8=True):
        key, k, k2 = jax.random.split(key, 3)
        xb, yb = meshlib.shard_batch(mesh, (x, y))
        state, metrics = step(state, xb, yb, k, lr)
        m = jax.device_get(metrics)
        h = jax.device_get(health(state, jnp.asarray(
            x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x),
            jnp.asarray(y.astype(np.int32)), k2))
        print(json.dumps({"step": i, "loss": float(m["loss"]),
                          "top1": float(m["top1"]),
                          **{kk: float(v) for kk, v in h.items()}}))
        if not np.isfinite(m["loss"]) or not h["params_finite"]:
            print(f"first non-finite at step {i}")
            break
        i += 1
        if i >= args.steps:
            break


if __name__ == "__main__":
    main()
