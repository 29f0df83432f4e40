#!/usr/bin/env python
"""Digital-twin accuracy run for the TRICK-TRAINING family: the reference's
ImageNet driver (`ImageNet/experiments_imagenet.py` train()/validate() —
its tarEE_trick dispatch through `utils/attacks.py::targeted_PGD_trick`
(the Bernoulli start-from-clean gate at attacks.py:69-71) and its
label-smoothing loss `compute_loss_and_error` (attacks.py:89-106), its
targeted validation) running unmodified on torch-CPU in a 1-process gloo
group, vs our stack (objectives/methods.py kind `tar_at_trick`: the same
clean-start gate and label-smooth assembly), from identical initial
weights on identical data.

This completes the whole-training twin matrix over the reference's
dispatched training methods: the trick family is the only one combining a
stochastic attack-INIT gate (prob_start_from_clean) with a non-CE training
loss (label smoothing). Recipe = `configs_imagenet/
targeted_ee_trick_training.yml`: method tarEE_trick, resnet18_EE, lr 0.1,
wd 1e-4, eps 16/255, num_steps_1 10, prob_start_from_clean 0.2,
label_smooth 0.1 — with the config's own duplicate-key quirk (step_size_1
set twice, 2/255 then 1/255; yaml last-wins so the shipped train step is
1/255, both sides use it) and its latent type_canny gap (the yml omits the
key the driver reads at experiments_imagenet.py:83; the model
constructor's default 'CannyFilter' is the only runnable choice — both
sides use it). bs shrunk 256 -> 25 and cize 224 -> 64 for the one-core
torch side, avgpool(7) -> AdaptiveAvgPool2d(1) exactly as the other
ImageNet twins (the reference's own shape generalization at
Tiny_ImageNet/models_tinyimagenet/resnet.py:115).

    python tools/digital_twin_trick.py --seeds 1 2 3 --epochs 8 \
        --n-train 500 --ours-platform default --out output/twin_hard_trick

Reference match: ImageNet/experiments_imagenet.py:250-251,266-267 (train:
trick branch), :300-393 (validate: targeted attack), utils/attacks.py:
59-86 (targeted_PGD_trick), :89-106 (LabelSmoothLoss),
configs_imagenet/targeted_ee_trick_training.yml (recipe).
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
from digital_twin_free import parse_reference_log  # noqa: E402
from digital_twin_tiny import TASKS, converged  # noqa: E402

# targeted_ee_trick_training.yml, shrunk 224px/bs256 -> 64px/bs25; the
# duplicate step_size_1 keys resolve last-wins to 1/255
RECIPE = dict(arch="resnet18_EE", method_name="tarEE_trick", batch_size=25,
              lr=0.1, momentum=0.9, weight_decay=1e-4,
              epsilon=16.0 / 255, step_size_1=1.0 / 255, random=True,
              cize=64, num_steps_1=10, r=16, w=1.0, gf=False, low=38.0,
              high=76.0, alpha=0.0, sigma=1.0, type_canny="CannyFilter",
              prob_start_from_clean=0.2, label_smooth=0.1)
NUM_CLASSES = 1000     # the ImageNet ResNet_EE head is hard-wired
EVAL_STEPS = 10        # validate at num_steps_1 strength (both sides)
EE_TENSORS = 102       # resnet18 backbone (the EE front-end is param-free
#                        in the converter's view: fixed canny buffers)


def run_reference(xs_tr, ys_tr, xs_va, ys_va, work_dir: str, epochs: int,
                  seed: int = 1) -> dict:
    """Train/eval with experiments_imagenet.py's own train()/validate()."""
    _install_reference_shims()
    for p in (os.path.join(REF, "ImageNet"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch
    import torch.distributed as dist
    import torch.nn as nn
    import torch.optim as optim
    from torch.utils.data import DataLoader, TensorDataset

    import experiments_imagenet as E
    from models_imagenet import resnet18_EE

    r = RECIPE
    E.args = types.SimpleNamespace(
        **r, num_steps_2=50, num_steps_3=EVAL_STEPS,
        step_size_2=1.0 / 255, step_size_3=1.0 / 255, seed=seed,
        local_rank=0, print_freq=10 ** 9, attack_method="PGD")
    if not dist.is_initialized():
        dist.init_process_group("gloo",
                                init_method="tcp://127.0.0.1:29881",
                                world_size=1, rank=0)
    torch.manual_seed(seed)
    model = resnet18_EE(pretrained=False, cize=r["cize"], r=r["r"],
                        w=r["w"], with_gf=r["gf"], low=r["low"],
                        high=r["high"], alpha=r["alpha"], sigma=r["sigma"],
                        type_canny=r["type_canny"])
    model.avgpool = nn.AdaptiveAvgPool2d(1)
    os.makedirs(work_dir, exist_ok=True)
    init_pth = os.path.join(work_dir, "init.pth")
    torch.save({"epoch": 0, "arch": r["arch"],
                "state_dict": model.state_dict(), "best_prec1": 0.0},
               init_pth)

    optimizer = optim.SGD(model.parameters(), lr=r["lr"],
                          momentum=r["momentum"],
                          weight_decay=r["weight_decay"])
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
    for f in os.listdir(log_dir):       # appended logs: start clean
        if f.endswith(".txt"):
            os.remove(os.path.join(log_dir, f))
    for epoch in range(epochs):
        # adjust_learning_rate decays /10 every 30 epochs — constant here
        E.train(train_loader, model, criterion, optimizer, epoch,
                E.args.print_freq, "cpu", log_dir)
        E.validate(val_loader, model, criterion, E.args.print_freq, "cpu",
                   EVAL_STEPS, r["step_size_1"], log_dir)
    out = parse_reference_log(work_dir, epochs)
    assert out is not None, "reference validate() wrote no summary lines"
    return out


def run_ours(xs_tr, ys_tr, xs_va, ys_va, init_pth, epochs: int,
             seed: int = 1, platform: str = "cpu",
             ckpt_path: str | None = None) -> dict:
    """Train with our stack: tar_at_trick objective (Bernoulli clean-start
    gate + fmod random-offset targets + label-smooth loss)."""
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from edge_enhancement_tpu.data.datasets import ArrayDataset
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.objectives.methods import MethodConfig
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import (EvalAttackConfig,
                                                    OptimConfig,
                                                    build_eval_step,
                                                    build_train_step,
                                                    create_train_state)
    from tools.convert_torch_checkpoint import convert, resnet_name_map

    r = RECIPE
    train_ds = ArrayDataset(xs_tr, ys_tr)
    val_ds = ArrayDataset(xs_va, ys_va)
    cfg_args = dict(r=r["r"], w=r["w"], gf=r["gf"], low=r["low"],
                    high=r["high"], alpha=r["alpha"], sigma=r["sigma"],
                    type_canny=r["type_canny"])
    ops = ModelOps(build_model(r["arch"], cfg_args, NUM_CLASSES))
    state = create_train_state(ops, jax.random.PRNGKey(seed),
                               jnp.zeros((1, r["cize"], r["cize"], 3)))
    if init_pth is not None:
        sd = torch.load(init_pth, map_location="cpu")["state_dict"]
        params, stats, matched, _ = convert(sd, resnet_name_map(18),
                                            state.params, state.batch_stats)
        assert matched == EE_TENSORS, matched
        state = state.replace(params=params, batch_stats=stats)

    mcfg = MethodConfig(method_name=r["method_name"], epsilon=r["epsilon"],
                        num_steps=r["num_steps_1"],
                        step_size=r["step_size_1"], random=r["random"],
                        num_classes=NUM_CLASSES,
                        label_smooth=r["label_smooth"],
                        prob_start_from_clean=r["prob_start_from_clean"])
    step = build_train_step(ops, mcfg, OptimConfig(r["momentum"],
                                                   r["weight_decay"]))
    eval_step = build_eval_step(ops, EvalAttackConfig(
        "PGD", r["epsilon"], EVAL_STEPS, r["step_size_1"], True,
        NUM_CLASSES, targeted=True))

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
    for epoch in range(start_epoch, epochs):
        for x, y in train_ds.batches(r["batch_size"], shuffle=True,
                                     seed=seed, epoch=epoch, as_uint8=True):
            key, k = jax.random.split(key)
            state, _ = step(state, jnp.asarray(x), jnp.asarray(y), k,
                            jnp.float32(r["lr"]))
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
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=500)
    ap.add_argument("--n-val", type=int, default=250)
    ap.add_argument("--task", default="hard", choices=sorted(TASKS))
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--ours-platform", default="cpu",
                    choices=["cpu", "default"])
    ap.add_argument("--ref-only", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "output",
                                                  "twin_hard_trick"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    gen = TASKS[args.task]
    xs_tr, ys_tr = gen(args.n_train, seed=0)
    xs_va, ys_va = gen(args.n_val, seed=1)
    plat = args.ours_platform

    res = {"recipe": dict(RECIPE, epochs=args.epochs, n_train=args.n_train),
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
            print(f"=> reference (torch tarEE_trick) run, seed {seed} ...",
                  flush=True)
            ref = run_reference(xs_tr, ys_tr, xs_va, ys_va, ref_dir,
                                args.epochs, seed=seed)
        res["reference"][str(seed)] = ref["history"]
        if args.ref_only:
            continue
        if str(seed) in res["ours"] and \
                len(res["ours"][str(seed)]["clean"]) >= args.epochs:
            print(f"=> our run, seed {seed}: recovered from prior sweep")
            continue
        print(f"=> our run, seed {seed} (same init) ...", flush=True)
        ours = run_ours(xs_tr, ys_tr, xs_va, ys_va, ref["init_pth"],
                        args.epochs, seed=seed, platform=plat,
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
    summary = {"task": args.task, "family": "tarEE_trick",
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
