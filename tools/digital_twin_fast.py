#!/usr/bin/env python
"""Digital-twin accuracy run for the FAST-AT (FGSM) family: the reference's
fast driver (`ImageNet/fgsm_imagenet/main_fast.py` — its module-level config
globals, its train() ascend/descend split with the noise re-initialised
uniformly per batch, its per-minibatch piecewise-linear cyclic LR, its
lib/validation.py validate()/validate_pgd()) imported and run unmodified on
torch-CPU, vs our functional fast-AT step (objectives/free_fast.py::
build_fast_train_step: ascend-grad on the noise with the pass's param grads
discarded, descend with the noise fixed, BN stats updated on both passes),
from identical initial weights on identical data.

This completes the whole-training twin evidence (docs/TWIN.md) across every
method family: AT / targeted / AWP / TRADES / ALP / free-AT / fast-AT. The
recipe is the fast 4px EE phase-1 config (configs_ee/
configs_fast_4px_phase1_ee.yml: resnet50_EE r=12 w=1.0, clip_eps 4/255,
fgsm_step 5/255 — the fast-AT step-larger-than-ball quirk — n_repeats 1,
random_init, BN params excluded from weight decay, cyclic LR over knots
(0,1,6)), shrunk for the one-core torch side the way the other twins shrink:
crop 128 -> 64, bs 512 -> 25, and the LR peak linearly rescaled with the
batch (0.4 * 25/512 = 0.0195 -> --lr-peak, applied to BOTH sides
identically; the shipped 0.4 peak was tuned for bs 512). half (apex amp O1)
is off on both sides — there is no apex on CPU; bf16-vs-f32 trajectory
equivalence is separately evidenced in docs/PERF.md.

    python tools/digital_twin_fast.py --seeds 1 2 3 --epochs 6 \
        --n-train 500 --ref-only --out output/twin_hard_fast

Reference match: ImageNet/fgsm_imagenet/main_fast.py:200-288 (train),
:172 (lr_schedule interp), :107-112 (BN no-decay groups),
lib/validation.py:8-88 (validate_pgd), :90-140 (validate),
configs_ee/configs_fast_4px_phase1_ee.yml (recipe).
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

# fast 4px EE phase-1 recipe (configs_fast_4px_phase1_ee.yml), shrunk
# 128px/bs512 -> 64px/bs25 with the LR peak batch-rescaled (see module doc)
RECIPE = dict(arch="resnet50_EE", method_name="fast_AT", batch_size=25,
              lr_epochs=(0, 1, 6), lr_peak=0.4 * 25 / 512,
              momentum=0.9, weight_decay=1e-4,
              epsilon=4.0 / 255, step_size_1=1.0 / 255, random=True,
              cize=64, r=12, w=1.0, gf=False, low=38.0, high=76.0,
              alpha=0.0, sigma=1.0, type_canny="CannyFilter",
              clip_eps=4.0 / 255, fgsm_step=5.0 / 255, n_repeats=1,
              random_init=True)
NUM_CLASSES = 1000     # the ImageNet ResNet_EE head is hard-wired
EVAL_STEPS = 10        # the config's own pgd_attack [10, 1/255] entry
R50_TENSORS = 267      # 53 convs + 53 BNs (4 tensors each) + fc (w, b)

_FAST_YML = """\
TRAIN:
    arch: 'resnet50_EE'
    lr: {lr_peak}
    momentum: 0.9
    weight_decay: 0.0001
    print_freq: 1000000000
    mean: !!python/tuple [0.485, 0.456, 0.406]
    std: !!python/tuple [0.229, 0.224, 0.225]
    start_epoch: 0
    epochs: 6
    lr_epochs: !!python/tuple [0, 1, 6]
    lr_values: !!python/tuple [0, {lr_peak}, {lr_tail}]
    half: false
    random_init: true
ADV:
    clip_eps: 4.0
    fgsm_step: 5.0
    n_repeats: 1
    pgd_attack:
    - !!python/tuple [10, 0.00392156862]
DATA:
    workers: 0
    max_color_value: 255.0
    img_size: 0
    batch_size: 25
    crop_size: 64
    r: 12
    w: 1.0
    low: 38.0
    high: 76.0
"""


class _EasyDict(dict):
    """Recursive easydict replacement: the digital_twin shim's flat version
    is enough for import-only consumers, but main_fast actually reads and
    MUTATES nested attributes (configs.ADV.fgsm_step /= 255), which needs
    the nested dicts stored as attribute-capable objects, not re-wrapped
    per access."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in dict(d or {}, **kw).items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setitem__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _import_fast_driver(work_root: str, lr_peak: float):
    """Import main_fast.py unmodified. Its import-time side effects (argv
    parse, yaml config load, logger creation, CUDA noise buffer) are
    satisfied with: a generated config file, a chdir so its ./output logs
    land under the twin dir, an apex stub (half=false so amp is never
    invoked), a PyYAML-6 yaml.load patch (the reference calls the pre-5.1
    single-arg form), and the standard CPU shims."""
    # recursive easydict BEFORE the flat shim's setdefault
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")
        ed.EasyDict = _EasyDict
        sys.modules["easydict"] = ed
    _install_reference_shims()
    if "apex" not in sys.modules:
        apex = types.ModuleType("apex")
        apex.amp = types.SimpleNamespace(
            initialize=lambda m, o, **k: (m, o),
            scale_loss=None)  # half=false: never called
        sys.modules["apex"] = apex
    import yaml
    if not getattr(yaml, "_twin_unsafe_default", False):
        _orig = yaml.load

        def _load(stream, Loader=None):
            return _orig(stream, Loader=Loader or yaml.UnsafeLoader)

        yaml.load = _load
        yaml._twin_unsafe_default = True
    for p in (os.path.join(REF, "ImageNet", "fgsm_imagenet"),
              os.path.join(REF, "ImageNet"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    os.makedirs(work_root, exist_ok=True)
    cfg_p = os.path.join(work_root, "configs_twin_fast.yml")
    with open(cfg_p, "w") as f:
        f.write(_FAST_YML.format(lr_peak=lr_peak, lr_tail=lr_peak / 10))
    cwd, argv = os.getcwd(), sys.argv
    os.chdir(work_root)
    sys.argv = ["main_fast.py", "/nonexistent", "-c", cfg_p]
    try:
        import main_fast as E
    finally:
        sys.argv = argv
        os.chdir(cwd)
    # main() pre-divides the ADV scales by max_color_value; the twin calls
    # train()/validate_pgd() directly, so apply the same scaling once
    if E.configs.ADV.clip_eps > 1.0:
        E.configs.ADV.fgsm_step /= E.configs.DATA.max_color_value
        E.configs.ADV.clip_eps /= E.configs.DATA.max_color_value
    return E


def run_reference(xs_tr, ys_tr, xs_va, ys_va, work_dir: str, epochs: int,
                  seed: int = 1, lr_peak: float = RECIPE["lr_peak"]) -> dict:
    """Train with main_fast.py's own train(); eval with lib/validation.py's
    own validate() (clean) + validate_pgd() (the config's PGD-10 entry)."""
    out_root = os.path.dirname(os.path.abspath(work_dir))
    E = _import_fast_driver(out_root, lr_peak)
    import torch
    import torch.nn as nn
    import torch.optim as optim
    from torch.utils.data import DataLoader, TensorDataset

    from lib.validation import validate, validate_pgd

    r = RECIPE
    hist_p = os.path.join(work_dir, "hist.json")
    init_pth = os.path.join(work_dir, "init.pth")
    if os.path.exists(hist_p) and os.path.exists(init_pth):
        hist = json.load(open(hist_p))
        if len(hist["clean"]) >= epochs:
            return {"history": {m: hist[m][:epochs] for m in ("clean",
                                                              "adv")},
                    "init_pth": init_pth}

    torch.manual_seed(seed)
    model = E.resnet50_EE(pretrained=False, cize=r["cize"], r=r["r"],
                          w=r["w"], low=r["low"], high=r["high"])
    # the ImageNet model hard-wires AvgPool2d(7) for 224px inputs; at the
    # twin's 64px the final map is 2x2. AdaptiveAvgPool2d(1) is the
    # reference's OWN shape generalization of the same global-mean
    # (Tiny_ImageNet/models_tinyimagenet/resnet.py:115) — both twins'
    # standard substitution (see digital_twin_free.py).
    model.avgpool = nn.AdaptiveAvgPool2d(1)
    os.makedirs(work_dir, exist_ok=True)
    torch.save({"epoch": 0, "arch": r["arch"],
                "state_dict": model.state_dict(), "best_prec1": 0.0},
               init_pth)

    # BN parameters get weight_decay 0 (main_fast.py:99-112)
    p2m = {}
    for m in model.modules():
        for p in m.parameters(recurse=False):
            p2m[p] = str(type(m).__name__)
    groups = [dict(params=[p for p in model.parameters()
                           if "BatchNorm" not in p2m[p]]),
              dict(params=[p for p in model.parameters()
                           if "BatchNorm" in p2m[p]], weight_decay=0)]
    optimizer = optim.SGD(groups, lr_peak, momentum=r["momentum"],
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
    knots, values = E.configs.TRAIN.lr_epochs, E.configs.TRAIN.lr_values
    lr_schedule = lambda t: np.interp([t], knots, values)[0]  # noqa: E731

    E.global_noise_data = torch.zeros(
        [r["batch_size"], 3, r["cize"], r["cize"]])
    hist = {"clean": [], "adv": []}
    for epoch in range(epochs):
        E.train(train_loader, model, criterion, optimizer, epoch,
                lr_schedule, half=False)
        c = float(validate(val_loader, model, criterion, E.configs,
                           E.logger))
        a = float(validate_pgd(val_loader, model, criterion, EVAL_STEPS,
                               1.0 / 255, E.configs, E.logger))
        hist["clean"].append(c)
        hist["adv"].append(a)
        print(f"[ref seed{seed}] epoch {epoch}: clean {c:.2f} adv {a:.2f}",
              flush=True)
        with open(hist_p, "w") as f:
            json.dump(hist, f)
    return {"history": hist, "init_pth": init_pth}


def run_ours(xs_tr, ys_tr, xs_va, ys_va, init_pth, epochs: int,
             seed: int = 1, platform: str = "cpu",
             ckpt_path: str | None = None,
             lr_peak: float = RECIPE["lr_peak"]) -> dict:
    """Train with our functional fast-AT step (ascend/descend in one jitted
    lax.scan body); cyclic LR advanced at the host exactly as main_fast.py
    does: lr = interp(epoch + (i*n_repeats + j + 1)/len(loader))."""
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from edge_enhancement_tpu.data.datasets import ArrayDataset
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.objectives.free_fast import (
        FreeFastConfig, build_fast_train_step, init_noise)
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
        params, stats, matched, _ = convert(sd, resnet_name_map(50),
                                            state.params, state.batch_stats)
        assert matched == R50_TENSORS, matched
        state = state.replace(params=params, batch_stats=stats)

    fcfg = FreeFastConfig(n_repeats=r["n_repeats"], fgsm_step=r["fgsm_step"],
                          clip_eps=r["clip_eps"],
                          random_init=r["random_init"])
    step = build_fast_train_step(ops, fcfg,
                                 OptimConfig(r["momentum"],
                                             r["weight_decay"],
                                             bn_no_decay=True))
    eval_step = build_eval_step(ops, EvalAttackConfig(
        "PGD", r["epsilon"], EVAL_STEPS, r["step_size_1"], True,
        NUM_CLASSES))

    knots = list(r["lr_epochs"])
    values = [0.0, lr_peak, lr_peak / 10]
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
    n_batches = (len(xs_tr) + r["batch_size"] - 1) // r["batch_size"]
    for epoch in range(start_epoch, epochs):
        for i, (x, y) in enumerate(train_ds.batches(
                r["batch_size"], shuffle=True, seed=seed, epoch=epoch,
                as_uint8=True)):
            # main_fast.py:228 — with n_repeats=1, j=0
            lr = float(np.interp(epoch + (i + 1) / n_batches, knots, values))
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
    ap.add_argument("--epochs", type=int, default=6,
                    help="the shipped phase-1 cycle length (lr knots 0/1/6)")
    ap.add_argument("--n-train", type=int, default=500)
    ap.add_argument("--n-val", type=int, default=250)
    ap.add_argument("--task", default="hard", choices=sorted(TASKS))
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--lr-peak", type=float, default=RECIPE["lr_peak"])
    ap.add_argument("--ours-platform", default="cpu",
                    choices=["cpu", "default"])
    ap.add_argument("--ref-only", action="store_true")
    ap.add_argument("--ours-only", action="store_true",
                    help="require finished reference runs on disk")
    ap.add_argument("--out", default=os.path.join(REPO, "output",
                                                  "twin_hard_fast"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    gen = TASKS[args.task]
    xs_tr, ys_tr = gen(args.n_train, seed=0)
    xs_va, ys_va = gen(args.n_val, seed=1)
    plat = args.ours_platform

    res = {"recipe": dict(RECIPE, epochs=args.epochs, n_train=args.n_train,
                          lr_peak=args.lr_peak),
           "task": args.task, "seeds": args.seeds,
           "reference": {}, "ours": {}}
    prev_p = os.path.join(args.out, f"twin_{args.task}.json")
    if os.path.exists(prev_p):
        prev = json.load(open(prev_p))
        if prev.get("recipe") == res["recipe"]:
            res["ours"].update(prev.get("ours", {}))
    for seed in args.seeds:
        ref_dir = os.path.join(args.out, f"ref_s{seed}")
        if args.ours_only:
            hist = json.load(open(os.path.join(ref_dir, "hist.json")))
            assert len(hist["clean"]) >= args.epochs, (seed, hist)
            ref = {"history": {m: hist[m][:args.epochs]
                               for m in ("clean", "adv")},
                   "init_pth": os.path.join(ref_dir, "init.pth")}
            print(f"=> reference seed {seed} recovered from hist.json")
        else:
            print(f"=> reference (torch main_fast) run, seed {seed} ...",
                  flush=True)
            ref = run_reference(xs_tr, ys_tr, xs_va, ys_va, ref_dir,
                                args.epochs, seed=seed,
                                lr_peak=args.lr_peak)
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
                                               f"ours_s{seed}.pkl"),
                        lr_peak=args.lr_peak)
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
    summary = {"task": args.task, "family": "fast_AT", "seeds": args.seeds,
               "lr_peak": args.lr_peak}
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
