#!/usr/bin/env python
"""Digital-twin accuracy run for the AWP family: the reference's AWP driver
(`AWP/Tiny_imagenet/experiments_tiny_awp.py` train()/validate() — its PGD,
its AdvWeightPerturb proxy ascent, its per-minibatch 50/75 LR schedule —
running unmodified on torch-CPU) vs our functional AWP train step, from
identical initial weights on identical data.

This extends the whole-training twin evidence (docs/TWIN.md) to a SECOND
model family (PreActResNet18_EE_BPDA_3) and a second objective family
(EE_AT_AWP: PGD-AT + adversarial weight perturbation), at the shipped
hyperparameters (configs_tiny_awp/ee_bpda_3_at_awp.yml: gamma 0.005,
warmup 0, proxy lr 0.01, wd 5e-4, eps 16/255, PGD-10 train / PGD-20 eval),
bs shrunk 100 -> 25 for the one-core torch run, on the non-saturating
synthetic-hard task.

    python tools/digital_twin_awp.py --seeds 1 2 3 --epochs 10 \
        --n-train 500 --ref-only --out output/twin_hard_awp

Reference match: AWP/Tiny_imagenet/experiments_tiny_awp.py:230-311 (train),
:314-404 (validate, log_pgd.txt), models_tiny_awp/utils_awp.py:8-55 (AWP),
utils/helper.py:78-88 (adjust_learning_rate_1).
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
REF = "/root/reference"

from digital_twin import _install_reference_shims  # noqa: E402
from digital_twin_tiny import TASKS, converged  # noqa: E402

# shipped AWP recipe (configs_tiny_awp/ee_bpda_3_at_awp.yml), bs 100 -> 25
RECIPE = dict(arch="PreActResNet18_EE_BPDA_3", method_name="EE_AT_AWP",
              batch_size=25, lr=0.1, momentum=0.9, weight_decay=5e-4,
              epsilon=0.062745098039216, step_size_1=0.007843137254902,
              random=True, cize=64, r=8, w=1.0, gf=False, low=38.0,
              high=76.0, alpha=0.0, sigma=1.0,
              awp_gamma=0.005, awp_warmup=0, l1=0, l2=0)
NUM_CLASSES = 200      # the Tiny-ImageNet PreActResNet head is hard-wired
EVAL_STEPS = 20        # in-training validate uses num_steps_2 = 20


def parse_reference_log(work_dir: str, epochs: int):
    """Recover a finished reference run from validate()'s log_pgd.txt."""
    log_p = os.path.join(work_dir, "log", "log_pgd.txt")
    init_pth = os.path.join(work_dir, "init.pth")
    if not (os.path.exists(log_p) and os.path.exists(init_pth)):
        return None
    clean, adv = [], []
    for line in open(log_p):
        if line.startswith(" * Clean Prec@1"):
            clean.append(float(line.split()[3]))
        elif line.startswith(" * Adv Prec@1"):
            adv.append(float(line.split()[3]))
    if len(clean) < epochs or len(adv) < epochs:
        return None
    return {"history": {"clean": clean[:epochs], "adv": adv[:epochs]},
            "init_pth": init_pth}


def run_reference(xs_tr, ys_tr, xs_va, ys_va, work_dir: str, epochs: int,
                  num_steps: int, seed: int = 1) -> dict:
    """Train with the reference AWP driver's own train()/validate()."""
    _install_reference_shims()
    awp_dir = os.path.join(REF, "AWP", "Tiny_imagenet")
    if awp_dir not in sys.path:
        sys.path.insert(0, awp_dir)
    import torch
    import torch.nn as nn
    import torch.optim as optim
    from torch.utils.data import DataLoader, TensorDataset

    import experiments_tiny_awp as E
    from models_tiny_awp.preactresnet_EE_BPDA_3 import \
        PreActResNet18_EE_BPDA_3
    from models_tiny_awp.utils_awp import AdvWeightPerturb

    r = RECIPE
    args = types.SimpleNamespace(**r, num_steps_1=num_steps,
                                 num_steps_2=EVAL_STEPS, seed=seed,
                                 epochs=epochs,  # LR schedule denominator
                                 attack_method="PGD", print_freq=10 ** 9)
    E.args = args
    torch.manual_seed(seed)

    def mk_model():
        return PreActResNet18_EE_BPDA_3(
            dataset="Tiny-ImageNet", cize=r["cize"], r=r["r"], w=r["w"],
            with_gf=r["gf"], low=r["low"], high=r["high"],
            alpha=r["alpha"], sigma=r["sigma"])

    model, proxy = mk_model(), mk_model()
    os.makedirs(work_dir, exist_ok=True)
    init_pth = os.path.join(work_dir, "init.pth")
    torch.save({"epoch": 0, "arch": r["arch"],
                "state_dict": model.state_dict(), "best_prec1": 0.0},
               init_pth)

    optimizer = optim.SGD(model.parameters(), lr=r["lr"],
                          momentum=r["momentum"],
                          weight_decay=r["weight_decay"])
    proxy_optimizer = optim.SGD(proxy.parameters(), lr=0.01)
    awp_adversary = AdvWeightPerturb(model=model, proxy=proxy,
                                     proxy_optim=proxy_optimizer,
                                     gamma=r["awp_gamma"])
    criterion = nn.CrossEntropyLoss()

    def mk(x, y, shuffle):
        xt = torch.from_numpy(x.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
        g = torch.Generator()
        g.manual_seed(seed)
        return DataLoader(TensorDataset(xt.contiguous(),
                                        torch.from_numpy(y)),
                          batch_size=r["batch_size"], shuffle=shuffle,
                          generator=g if shuffle else None)

    train_loader, val_loader = mk(xs_tr, ys_tr, True), mk(xs_va, ys_va, False)
    log_dir = os.path.join(work_dir, "log") + os.sep
    os.makedirs(log_dir, exist_ok=True)
    # logs are written in append mode: clear any stale one from an
    # interrupted run so recovery parses only this run's epochs
    for f in os.listdir(log_dir):
        if f.endswith(".txt"):
            os.remove(os.path.join(log_dir, f))
    for epoch in range(epochs):
        E.train(train_loader, model, awp_adversary, criterion, optimizer,
                epoch, args.print_freq, "cpu", log_dir)
        E.validate(val_loader, model, criterion, args.print_freq, "cpu",
                   EVAL_STEPS, r["step_size_1"], log_dir)
    out = parse_reference_log(work_dir, epochs)
    assert out is not None, "reference validate() wrote no summary lines"
    return out


def run_ours(xs_tr, ys_tr, xs_va, ys_va, init_pth, epochs: int,
             num_steps: int, seed: int = 1, platform: str = "cpu",
             ckpt_path: str | None = None) -> dict:
    """Train with our functional AWP step (objectives/awp.py), per-minibatch
    fractional-epoch 50/75 LR exactly like the reference driver."""
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from edge_enhancement_tpu.data.datasets import ArrayDataset
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.objectives.awp import (AWPConfig,
                                                     build_awp_train_step)
    from edge_enhancement_tpu.objectives.methods import MethodConfig
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.schedules import piecewise_50_75
    from edge_enhancement_tpu.train.trainer import (EvalAttackConfig,
                                                    OptimConfig,
                                                    build_eval_step,
                                                    create_train_state)
    from tools.convert_torch_checkpoint import convert, preact_name_map

    r = RECIPE
    train_ds = ArrayDataset(xs_tr, ys_tr)
    val_ds = ArrayDataset(xs_va, ys_va)
    cfg_args = dict(r=r["r"], w=r["w"], gf=r["gf"], low=r["low"],
                    high=r["high"], alpha=r["alpha"], sigma=r["sigma"],
                    dataset="Tiny-ImageNet")
    ops = ModelOps(build_model(r["arch"], cfg_args, NUM_CLASSES))
    state = create_train_state(ops, jax.random.PRNGKey(seed),
                               jnp.zeros((1, 64, 64, 3)))
    if init_pth is not None:
        sd = torch.load(init_pth, map_location="cpu")["state_dict"]
        params, stats, matched, _ = convert(sd, preact_name_map(18),
                                            state.params, state.batch_stats)
        assert matched >= 60, matched  # all convs/BNs/fc of PreActResNet-18
        state = state.replace(params=params, batch_stats=stats)

    mcfg = MethodConfig(method_name=r["method_name"], epsilon=r["epsilon"],
                        num_steps=num_steps, step_size=r["step_size_1"],
                        random=r["random"], num_classes=NUM_CLASSES)
    awp = AWPConfig(gamma=r["awp_gamma"], warmup=r["awp_warmup"],
                    proxy_lr=0.01, l1=float(r["l1"]))
    step = build_awp_train_step(ops, mcfg,
                                OptimConfig(r["momentum"],
                                            r["weight_decay"]), awp)
    eval_step = build_eval_step(ops, EvalAttackConfig(
        "PGD", r["epsilon"], EVAL_STEPS, r["step_size_1"], True,
        NUM_CLASSES))

    key = jax.random.PRNGKey(seed)
    hist = {"clean": [], "adv": []}
    start_epoch = 0
    if ckpt_path and os.path.exists(ckpt_path):
        import pickle
        with open(ckpt_path, "rb") as f:
            saved = pickle.load(f)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, saved["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray,
                                               saved["batch_stats"]),
            momentum_buf=jax.tree_util.tree_map(jnp.asarray,
                                                saved["momentum_buf"]),
            step=saved["step"])
        key = jnp.asarray(saved["key"])
        hist = saved["hist"]
        start_epoch = saved["epoch"] + 1
        print(f"[ours seed{seed}] resumed at epoch {start_epoch}",
              flush=True)
    n_batches = max(len(train_ds) // r["batch_size"], 1)
    for epoch in range(start_epoch, epochs):
        for i, (x, y) in enumerate(train_ds.batches(
                r["batch_size"], shuffle=True, seed=seed, epoch=epoch,
                as_uint8=True)):
            # per-minibatch fractional-epoch LR (adjust_learning_rate_1 at
            # epoch + (i+1)/len(loader), experiments_tiny_awp.py:252-253)
            lr = piecewise_50_75(r["lr"], epoch + (i + 1) / n_batches,
                                 epochs)
            key, k = jax.random.split(key)
            state, _ = step(state, jnp.asarray(x), jnp.asarray(y), k,
                            jnp.float32(lr),
                            jnp.float32(1.0 if epoch >= r["awp_warmup"]
                                        else 0.0))
        c1 = a1 = n = 0.0
        ekey = jax.random.PRNGKey(seed + 777)
        for x, y in val_ds.batches(r["batch_size"], shuffle=False, seed=0,
                                   as_uint8=True):
            ekey, k = jax.random.split(ekey)
            m = jax.device_get(eval_step(state, jnp.asarray(x),
                                         jnp.asarray(y), k))
            c1 += m["clean_top1"] * len(y)
            a1 += m["adv_top1"] * len(y)
            n += len(y)
        hist["clean"].append(float(c1 / n))
        hist["adv"].append(float(a1 / n))
        print(f"[ours seed{seed}] epoch {epoch}: clean "
              f"{hist['clean'][-1]:.2f} adv {hist['adv'][-1]:.2f}",
              flush=True)
        if ckpt_path:
            import pickle
            host = jax.device_get
            tmp = ckpt_path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"params": host(state.params),
                             "batch_stats": host(state.batch_stats),
                             "momentum_buf": host(state.momentum_buf),
                             "step": int(state.step),
                             "key": host(key),
                             "hist": hist, "epoch": epoch}, f)
            os.replace(tmp, ckpt_path)
    return {"history": hist}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n-train", type=int, default=500)
    ap.add_argument("--n-val", type=int, default=250)
    ap.add_argument("--num-steps", type=int, default=10)
    ap.add_argument("--task", default="hard", choices=sorted(TASKS))
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--ours-platform", default="cpu",
                    choices=["cpu", "default"])
    ap.add_argument("--ref-only", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "output",
                                                  "twin_hard_awp"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    gen = TASKS[args.task]
    xs_tr, ys_tr = gen(args.n_train, seed=0)
    xs_va, ys_va = gen(args.n_val, seed=1)
    plat = args.ours_platform

    res = {"recipe": dict(RECIPE, num_steps_1=args.num_steps,
                          epochs=args.epochs, n_train=args.n_train),
           "task": args.task, "seeds": args.seeds,
           "reference": {}, "ours": {}}
    prev_p = os.path.join(args.out, f"twin_{args.task}.json")
    if os.path.exists(prev_p):
        prev = json.load(open(prev_p))
        if prev.get("recipe") == res["recipe"]:
            res["ours"].update(prev.get("ours", {}))
    for seed in args.seeds:
        ref_dir = os.path.join(args.out, f"ref_s{seed}")
        ref = parse_reference_log(ref_dir, args.epochs)
        if ref is not None:
            print(f"=> reference seed {seed} recovered from its log")
        else:
            print(f"=> reference (torch AWP) run, seed {seed} ...",
                  flush=True)
            ref = run_reference(xs_tr, ys_tr, xs_va, ys_va, ref_dir,
                                args.epochs, args.num_steps, seed=seed)
        res["reference"][str(seed)] = ref["history"]
        if args.ref_only:
            continue
        if str(seed) in res["ours"] and \
                len(res["ours"][str(seed)]["clean"]) >= args.epochs:
            print(f"=> our run, seed {seed}: recovered from prior sweep")
            continue
        print(f"=> our run, seed {seed} (same init) ...", flush=True)
        ours = run_ours(xs_tr, ys_tr, xs_va, ys_va, ref["init_pth"],
                        args.epochs, args.num_steps, seed=seed,
                        platform=plat,
                        ckpt_path=os.path.join(args.out,
                                               f"ours_s{seed}.pkl"))
        res["ours"][str(seed)] = ours["history"]
        with open(prev_p, "w") as f:
            json.dump(res, f, indent=1)

    with open(prev_p, "w") as f:
        json.dump(res, f, indent=1)
    if args.ref_only:
        print(json.dumps({"ref_only": True, "task": args.task,
                          "reference": res["reference"]}))
        return

    conv_ref = [converged(res["reference"][str(s)]) for s in args.seeds]
    conv_ours = [converged(res["ours"][str(s)]) for s in args.seeds]
    summary = {"task": args.task, "family": "EE_AT_AWP",
               "seeds": args.seeds}
    for m in ("clean", "adv"):
        rv = [c[m] for c in conv_ref]
        ov = [c[m] for c in conv_ours]
        summary[m] = {
            "ref_mean": float(np.mean(rv)), "ref_vals": rv,
            "ours_mean": float(np.mean(ov)), "ours_vals": ov,
            "band": float(max(max(rv) - min(rv), max(ov) - min(ov))),
            "gap": float(abs(np.mean(rv) - np.mean(ov))),
        }
    with open(os.path.join(args.out, f"summary_{args.task}.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
