#!/usr/bin/env python
"""Standalone robustness evaluation: PGD batteries, CW, FGSM, and the
AutoAttack standard suite (APGD-CE / APGD-T / FAB-T / Square).

Covers the reference's --evaluate paths (experiments_*.py) and the
standalone utils/aa.py AutoAttack driver (which, as shipped, imports a
nonexistent CannyFilter_pre and cannot run — reproduced here working).

    python eval.py --config <cfg.yml> --resume <ckpt_dir> --data <root> \
        --suite pgd,cw,fgsm,aa
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from edge_enhancement_tpu.attacks.autoattack import (STANDARD_ATTACKS,
                                                     build_autoattack)
from edge_enhancement_tpu.data.datasets import get_dataset
from edge_enhancement_tpu.models.registry import build_model
from edge_enhancement_tpu.parallel import mesh as meshlib
from edge_enhancement_tpu.train import checkpoint as ckpt
from edge_enhancement_tpu.train.modelops import ModelOps, topk_accuracy
from edge_enhancement_tpu.train.trainer import (EvalAttackConfig,
                                                build_eval_step,
                                                create_train_state,
                                                eval_protocol)
from edge_enhancement_tpu.utils.config import (apply_platform, base_parser,
                                                load_config)
from edge_enhancement_tpu.utils.meters import AverageMeter, Logger


def main():
    parser = base_parser("robustness evaluation")
    parser.add_argument("--suite", default="pgd",
                        help="comma list: pgd,fgsm,cw,aa")
    parser.add_argument("--aa-batches", type=int, default=None,
                        help="cap AA to first N batches")
    parser.add_argument("--aa-attacks", default=",".join(STANDARD_ATTACKS),
                        help="AA subset (reference 'individual' mode); "
                             "default is the 4-attack standard suite")
    args = parser.parse_args()
    cfg = load_config(args.config, vars(args))
    apply_platform(cfg)
    run(cfg)


def run(cfg):
    """Drive one eval config. Split from main() (same pattern as train.run)
    so CI can run the real driver at scaled-down shapes
    (tests/test_eval_driver.py)."""
    # dataset construction mirrors train.run: honour the config's
    # cize/crop_size (the fast-AT phase configs evaluate at their own
    # resolution, reference configs_fast_*_evaluate*.yml) and
    # synthetic_size for generated data
    image_size = cfg.get("cize") or cfg.get("crop_size")
    syn = cfg.get("synthetic_size")
    val_ds, spec = get_dataset(cfg["dataset"], cfg.get("data"), train=False,
                               image_size=image_size,
                               synthetic_size=syn // 2 if syn else None)
    model = build_model(cfg["arch"], cfg, spec.num_classes)
    ops = ModelOps(model)
    mesh = meshlib.make_mesh()
    log = Logger(None)

    sample_x, _ = next(val_ds.batches(2, shuffle=False, seed=0))
    state = create_train_state(ops, jax.random.PRNGKey(int(cfg.get("seed", 1))),
                               jnp.asarray(sample_x[:1]))
    if cfg.get("resume"):
        payload = ckpt.load_checkpoint(cfg["resume"], "best") or \
            ckpt.load_checkpoint(cfg["resume"], "last")
        if payload is None:
            raise FileNotFoundError(f"no checkpoint under {cfg['resume']}")
        state, epoch, _ = ckpt.restore_into_state(state, payload)
        log(f"=> loaded checkpoint (epoch {epoch})")
    state = meshlib.replicate(mesh, state)

    suite = [s.strip() for s in str(cfg.get("suite", "pgd")).split(",")]
    eps = float(cfg["epsilon"])
    bs = int(cfg["batch_size"])
    limit = cfg.get("limit_batches")

    def battery(attack, num_steps, step_size, label, **extra):
        # reference validate() protocol (tar* -> targeted attacks,
        # pre_square -> squared eval inputs) — shared with train.py
        es = build_eval_step(ops, EvalAttackConfig(
            attack, eps, num_steps, step_size,
            bool(cfg.get("random", True)), spec.num_classes,
            **eval_protocol(cfg), **extra), mesh=mesh)
        c1, a1 = AverageMeter(), AverageMeter()
        key = jax.random.PRNGKey(999)
        # uint8 over the host->device link; eval_step converts on device
        for i, (x, y) in enumerate(val_ds.batches(bs, shuffle=False, seed=0,
                                                  as_uint8=True)):
            if limit is not None and i >= limit:
                break
            key, k = jax.random.split(key)
            xb, yb = meshlib.shard_batch(mesh, (x, y))
            m = jax.device_get(es(state, xb, yb, k))
            c1.update(m["clean_top1"], len(y))
            if "adv_top1" in m:
                a1.update(m["adv_top1"], len(y))
        log(f"{label}: clean Prec@1 {c1.avg:.3f}  adv Prec@1 {a1.avg:.3f}")

    if "pgd" in suite:
        for tier in ("1", "2", "3"):
            ns = cfg.get(f"num_steps_{tier}")
            ss = cfg.get(f"step_size_{tier}")
            if ns is None:
                continue
            battery("PGD", int(ns), float(ss), f"PGD-{ns}")
    if "fgsm" in suite:
        battery("FGSM", 1, float(cfg.get("step_size_1", 2 / 255)), "FGSM")
    if "cw" in suite:
        # iteration count from the config like the PGD tiers (default 20 =
        # the reference CWLinfAttack max_iter, utils/attacks.py)
        cw_iters = int(cfg.get("cw_iters", 20))
        battery("CW", cw_iters, 0.00392, f"CW-Linf-{cw_iters}",
                cw_iters=cw_iters)
    if "aa" in suite:
        # AutoAttack over the (optionally capped) eval set. build_autoattack
        # jits every attack once (static step counts); successive batches of
        # the same shape reuse the compiled executables — usable on the TPU
        # where per-program compiles are minutes.
        def fwd(xx, kk):
            return ops.logits_eval(state.params, state.batch_stats, xx, kk)

        suite_fn = build_autoattack(
            fwd, epsilon=eps, num_classes=spec.num_classes,
            apgd_steps=int(cfg.get("aa_apgd_steps", 100)),
            fab_steps=int(cfg.get("aa_fab_steps", 100)),
            square_queries=int(cfg.get("aa_square_queries", 1000)),
            n_target_classes=int(cfg.get("aa_target_classes", 9)),
            attacks_to_run=tuple(
                a.strip() for a in
                str(cfg.get("aa_attacks", ",".join(STANDARD_ATTACKS))).split(",")))
        acc_fn = jax.jit(lambda xx, yy, kk: topk_accuracy(fwd(xx, kk), yy))
        a1, c1 = AverageMeter(), AverageMeter()
        key = jax.random.PRNGKey(31337)
        cap = cfg.get("aa_batches") or limit
        for i, (x, y) in enumerate(val_ds.batches(bs, shuffle=False, seed=0)):
            if cap is not None and i >= cap:
                break
            key, k1, k2 = jax.random.split(key, 3)
            xj, yj = jnp.asarray(x), jnp.asarray(y)
            x_adv = suite_fn(xj, yj, k1)
            clean = jax.device_get(acc_fn(xj, yj, k2))
            adv = jax.device_get(acc_fn(x_adv, yj, k2))
            c1.update(float(clean["top1"]), len(y))
            a1.update(float(adv["top1"]), len(y))
        log(f"AutoAttack: clean Prec@1 {c1.avg:.3f}  robust Prec@1 {a1.avg:.3f}")


if __name__ == "__main__":
    main()
