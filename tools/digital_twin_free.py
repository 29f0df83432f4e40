#!/usr/bin/env python
"""Digital-twin accuracy run for the FREE-AT replay family: the reference's
free-AT DDP driver (`ImageNet/free_imagenet/AT_hfs_canny_free_imagenet_ddp.py`
train()/validate() — its persistent global noise buffer, its n_repeats
replay loop, its step30 LR schedule — running unmodified on torch-CPU in a
single-process gloo group) vs our functional free-AT step
(objectives/free_fast.py: the whole replay loop is one lax.scan with the
noise carried in the step state), from identical initial weights on
identical data.

This extends the whole-training twin evidence (docs/TWIN.md) to the replay
objective family at the free driver's shipped hyperparameters (clip_eps
4/255, fgsm_step 4/255, n_repeats 4, wd 1e-4, plain CannyFilter EE
front-end r=16 — the ImageNet `resnet18_EE` variant at cize 64), bs shrunk
256 -> 25 for the one-core torch run, on the non-saturating synthetic-hard
task. Eval is the driver's own validate() with its PGD at num_steps_3
overridden 100 -> 10 (both sides identically) to fit CPU time.

Deliberate deviation: the reference driver feeds a DistributedSampler; the
twin uses the plain seeded-generator DataLoader the other twins use. The
shuffle stream is a proven non-factor for converged values on this task
(tools/twin_order_probe.py: offsets move <=0.5 pt under an exact order
swap).

    python tools/digital_twin_free.py --seeds 1 2 3 --epochs 8 \
        --n-train 500 --ref-only --out output/twin_hard_free

Reference match: ImageNet/free_imagenet/AT_hfs_canny_free_imagenet_ddp.py
:288-360 (train: replay loop, noise update), :355-447 (validate),
utils/helper.py:71-75 (adjust_learning_rate_free).
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

# free-AT recipe: the free driver's own parser defaults (clip/fgsm 4.0 on
# the 255 scale -> /255 in main(), r=16, w=1, wd 1e-4, CannyFilter — the
# driver does NOT forward type_canny to resnet18_EE), cize 64, bs 256->25
RECIPE = dict(arch="resnet18_EE", method_name="free_AT", batch_size=25,
              lr=0.1, momentum=0.9, weight_decay=1e-4,
              epsilon=4.0 / 255, step_size_1=1.0 / 255, random=True,
              cize=64, r=16, w=1.0, gf=False, low=38.0, high=76.0,
              alpha=0.0, sigma=1.0, type_canny="CannyFilter",
              clip_eps=4.0 / 255, fgsm_step=4.0 / 255, n_repeats=4)
NUM_CLASSES = 1000     # the ImageNet ResNet_EE head is hard-wired
EVAL_STEPS = 10        # validate()'s num_steps_3, overridden 100 -> 10


def parse_reference_log(work_dir: str, epochs: int):
    """Recover a finished reference run from validate()'s log.txt."""
    log_p = os.path.join(work_dir, "log", "log.txt")
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


def _import_free_driver():
    """Import the free driver module (it parses sys.argv and sizes its
    global noise buffer at import time) and give it a 1-process gloo group
    so validate()'s all_gather reductions run on CPU."""
    _install_reference_shims()
    for p in (os.path.join(REF, "ImageNet", "free_imagenet"),
              os.path.join(REF, "ImageNet"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch.distributed as dist
    argv, sys.argv = sys.argv, ["AT_hfs_canny_free_imagenet_ddp.py"]
    try:
        import AT_hfs_canny_free_imagenet_ddp as E
    finally:
        sys.argv = argv
    if not dist.is_initialized():
        dist.init_process_group("gloo",
                                init_method="tcp://127.0.0.1:29877",
                                world_size=1, rank=0)
    return E


def run_reference(xs_tr, ys_tr, xs_va, ys_va, work_dir: str, epochs: int,
                  seed: int = 1) -> dict:
    """Train with the reference free-AT driver's own train()/validate()."""
    E = _import_free_driver()
    import torch
    import torch.nn as nn
    import torch.optim as optim
    from torch.utils.data import DataLoader, TensorDataset

    from utils.helper import adjust_learning_rate_free

    r = RECIPE
    # the driver reads module-level args everywhere; main() pre-divides
    # fgsm_step/clip_eps by max_color_value — RECIPE stores them divided
    E.args = types.SimpleNamespace(
        **r, num_steps_1=10, num_steps_2=50, num_steps_3=EVAL_STEPS,
        step_size_2=1.0 / 255, step_size_3=1.0 / 255, seed=seed,
        local_rank=0, print_freq=10 ** 9, crop_size=r["cize"],
        max_color_value=255.0)
    E.global_noise_data = torch.zeros(
        [r["batch_size"], 3, r["cize"], r["cize"]])
    torch.manual_seed(seed)
    model = E.resnet18_EE(pretrained=False, cize=r["cize"], r=r["r"],
                          w=r["w"], with_gf=r["gf"], low=r["low"],
                          high=r["high"], alpha=r["alpha"], sigma=r["sigma"])
    # the ImageNet model hard-wires AvgPool2d(7) for 224px inputs (final
    # map 7x7 -> global mean); at the twin's 64px the final map is 2x2 and
    # that kernel no longer fits. AdaptiveAvgPool2d(1) is the reference's
    # OWN shape generalization of the same backbone
    # (Tiny_ImageNet/models_tinyimagenet/resnet.py:115) and is the
    # identical global-mean semantics, so the pairing stays faithful.
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
        adjust_learning_rate_free(optimizer, epoch, r["lr"], r["n_repeats"])
        E.train(train_loader, model, criterion, optimizer, epoch,
                E.args.print_freq, "cpu", log_dir)
        E.validate(val_loader, model, criterion, E.args.print_freq, "cpu",
                   log_dir)
    out = parse_reference_log(work_dir, epochs)
    assert out is not None, "reference validate() wrote no summary lines"
    return out


def run_ours(xs_tr, ys_tr, xs_va, ys_va, init_pth, epochs: int,
             seed: int = 1, platform: str = "cpu",
             ckpt_path: str | None = None) -> dict:
    """Train with our functional free-AT step: the replay loop is one
    lax.scan, the persistent noise buffer is threaded through the step."""
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from edge_enhancement_tpu.data.datasets import ArrayDataset
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.objectives.free_fast import (
        FreeFastConfig, build_free_train_step, init_noise)
    from edge_enhancement_tpu.train import schedules
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import (EvalAttackConfig,
                                                    OptimConfig,
                                                    build_eval_step,
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
        assert matched == 102, matched
        state = state.replace(params=params, batch_stats=stats)

    fcfg = FreeFastConfig(n_repeats=r["n_repeats"], fgsm_step=r["fgsm_step"],
                          clip_eps=r["clip_eps"])
    step = build_free_train_step(ops, fcfg, OptimConfig(r["momentum"],
                                                        r["weight_decay"]))
    eval_step = build_eval_step(ops, EvalAttackConfig(
        "PGD", r["epsilon"], EVAL_STEPS, r["step_size_1"], True,
        NUM_CLASSES))

    key = jax.random.PRNGKey(seed)
    noise = init_noise(r["batch_size"], r["cize"])
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
        noise = jnp.asarray(saved["noise"])
        hist = saved["hist"]
        start_epoch = saved["epoch"] + 1
        print(f"[ours seed{seed}] resumed at epoch {start_epoch}",
              flush=True)
    for epoch in range(start_epoch, epochs):
        lr = schedules.step30_free(r["lr"], epoch, r["n_repeats"])
        for x, y in train_ds.batches(r["batch_size"], shuffle=True,
                                     seed=seed, epoch=epoch, as_uint8=True):
            key, k = jax.random.split(key)
            state, noise, _ = step(state, noise, jnp.asarray(x),
                                   jnp.asarray(y), k, jnp.float32(lr))
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
                             "key": host(key), "noise": host(noise),
                             "hist": hist, "epoch": epoch}, f)
            os.replace(tmp, ckpt_path)
    return {"history": hist}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8,
                    help="OUTER epochs (each runs n_repeats replay passes "
                         "per batch, the free-AT accounting)")
    ap.add_argument("--n-train", type=int, default=500)
    ap.add_argument("--n-val", type=int, default=250)
    ap.add_argument("--task", default="hard", choices=sorted(TASKS))
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--ours-platform", default="cpu",
                    choices=["cpu", "default"])
    ap.add_argument("--ref-only", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "output",
                                                  "twin_hard_free"))
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
            print(f"=> reference (torch free-AT) run, seed {seed} ...",
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
    summary = {"task": args.task, "family": "free_AT", "seeds": args.seeds}
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
