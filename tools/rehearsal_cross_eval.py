#!/usr/bin/env python
"""Score the dress-rehearsal checkpoint with the REFERENCE's own evaluator.

The dress rehearsal (docs/REHEARSAL.md) trained the flagship recipe at
production shape and evaluated it with OUR eval stack. This tool closes the
evaluator loop the same way tools/twin_cross_eval.py does for the twin: it
inverse-converts the rehearsal's orbax `ckpt/best` into the reference's
torch `resnet18_EE_square` (Tiny_ImageNet/models_tinyimagenet.py) and runs
the reference's own `validate()` — its PGD, its eval-mode semantics
(experiments_tinyimagenet.py:326-432) — on a fixed sample of the SAME val
distribution, next to our `build_eval_step` on the identical arrays. If the
two stacks agree on clean/robust accuracy for a model trained entirely in
ours, the rehearsal numbers are evaluator-independent.

    python tools/rehearsal_cross_eval.py \
        --ckpt output/rehearsal/tiny_imagenet/EE_BPDA3_AT_square/\
resnet18_EE_square-bs100-lr0.1-seed1/ckpt [--n-val 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from digital_twin import _install_reference_shims  # noqa: E402

CFG_PATH = "edge_enhancement_tpu/configs/tiny_imagenet/ee_at_bpda3_square.yml"


def ours_eval(cfg, payload, xs, ys, bs=100):
    """Our evaluator (train-time validation protocol: PGD-10, eval mode) on
    the restored checkpoint — same program eval.py/train.py run."""
    import jax
    import jax.numpy as jnp

    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train import checkpoint as ckpt
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import (EvalAttackConfig,
                                                    build_eval_step,
                                                    create_train_state)

    ops = ModelOps(build_model(cfg["arch"], cfg, 200))
    state = create_train_state(ops, jax.random.PRNGKey(1),
                               jnp.zeros((1, 64, 64, 3)))
    state, epoch, best = ckpt.restore_into_state(state, payload)
    eval_step = build_eval_step(ops, EvalAttackConfig(
        "PGD", float(cfg["epsilon"]), int(cfg["num_steps_1"]),
        float(cfg["step_size_1"]), True, 200))
    key = jax.random.PRNGKey(2)
    clean, adv = [], []
    for i in range(0, len(xs), bs):
        key, k = jax.random.split(key)
        m = jax.device_get(eval_step(
            state, jnp.asarray(xs[i:i + bs].astype(np.float32) / 255.0),
            jnp.asarray(ys[i:i + bs].astype(np.int32)), k))
        clean.append(float(m["clean_top1"]))
        adv.append(float(m["adv_top1"]))
    return (epoch, best, float(np.mean(clean)), float(np.mean(adv)),
            state)  # state reused for the torch conversion


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="rehearsal ckpt dir")
    ap.add_argument("--which", default="best")
    ap.add_argument("--n-val", type=int, default=1000)
    ap.add_argument("--out", default=os.path.join(REPO, "output",
                                                  "rehearsal"))
    args = ap.parse_args()

    from edge_enhancement_tpu.utils.config import apply_platform, load_config
    cfg = load_config(CFG_PATH)
    apply_platform(cfg)

    from edge_enhancement_tpu.data.datasets import synthetic_hard_images
    from edge_enhancement_tpu.train.checkpoint import load_checkpoint

    payload = load_checkpoint(args.ckpt, which=args.which)
    assert payload is not None, f"no checkpoint at {args.ckpt}/{args.which}"
    xs, ys = synthetic_hard_images(args.n_val, seed=1)

    epoch, best, o_clean, o_adv, state = ours_eval(cfg, payload, xs, ys)
    print(f"ours: ckpt {args.which} (epoch {epoch}, best {best:.2f}) -> "
          f"clean {o_clean:.2f} adv {o_adv:.2f} on {args.n_val} samples")

    # --- reference side: its own model class + its own validate() ---
    _install_reference_shims()
    tiny = "/root/reference/Tiny_ImageNet"
    if tiny not in sys.path:
        sys.path.insert(0, tiny)
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader, TensorDataset

    import experiments_tinyimagenet as E
    from models_tinyimagenet import resnet18_EE_square

    from tools.convert_torch_checkpoint import (params_to_torch_state_dict,
                                                resnet_name_map)

    eargs = types.SimpleNamespace(
        epsilon=float(cfg["epsilon"]), num_steps_1=int(cfg["num_steps_1"]),
        step_size_1=float(cfg["step_size_1"]), random=True, seed=1,
        attack_method="PGD", print_freq=10 ** 9,
        method_name=str(cfg["method_name"]), cize=64,
        n_queries=int(cfg["n_queries"]), arch=str(cfg["arch"]))
    E.args = eargs
    torch.manual_seed(1)
    model = resnet18_EE_square(
        pretrained=False, cize=64, r=int(cfg["r"]), w=float(cfg["w"]),
        with_gf=bool(cfg.get("gf", False)), low=float(cfg["low"]),
        high=float(cfg["high"]), alpha=float(cfg.get("alpha", 0.0)),
        sigma=float(cfg.get("sigma", 1.0)), type_canny=cfg["type_canny"],
        epsilon=float(cfg["epsilon"]), n_queries=int(cfg["n_queries"]))
    sd = params_to_torch_state_dict(state.params, state.batch_stats,
                                    resnet_name_map(18))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    learned = [m for m in missing
               if ".num_batches_tracked" not in m
               and not m.startswith("u2netp.")
               and not any(s in m for s in ("canny", "filter", "kernel",
                                            "sobel", "gaussian", "hfs",
                                            "weight_fft", "mask"))]
    assert not learned, learned
    print(f"state_dict: {len(sd)} tensors loaded into the reference model")

    xt = torch.from_numpy(xs.astype(np.float32) / 255.0)
    xt = xt.permute(0, 3, 1, 2).contiguous()
    loader = DataLoader(TensorDataset(xt, torch.from_numpy(
        ys.astype(np.int64))), batch_size=50, shuffle=False)
    log_dir = os.path.join(args.out, "cross_eval") + os.sep
    os.makedirs(log_dir, exist_ok=True)
    E.validate(loader, model, nn.CrossEntropyLoss(), eargs.print_freq,
               "cpu", int(cfg["num_steps_1"]), float(cfg["step_size_1"]),
               log_dir)
    r_clean = r_adv = None
    for line in open(os.path.join(log_dir, "log.txt")):
        if line.startswith(" * Clean Prec@1"):
            r_clean = float(line.split()[3])
        elif line.startswith(" * Adv Prec@1"):
            r_adv = float(line.split()[3])

    res = {"ckpt": args.which, "epoch": int(epoch), "n_val": args.n_val,
           "ours_eval": {"clean": round(o_clean, 2), "adv": round(o_adv, 2)},
           "reference_validate_on_our_weights": {"clean": r_clean,
                                                 "adv": r_adv}}
    with open(os.path.join(args.out, "cross_eval.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
