#!/usr/bin/env python
"""Digital-twin accuracy run: the ACTUAL reference torch driver vs train.py
on identical data and identical initial weights, end to end.

The op/grad/1-step/3-step parity matrix (tests/test_*_parity_torch.py) pins
the per-step math; this harness extends the claim to WHOLE TRAININGS: a
learnable synthetic MNIST (written as real idx files, so our loader's
real-layout path is exercised) is trained with the flagship
EE_BPDA3_AT_square recipe by

  * the reference's own `experiments_mnist.py` train()/validate() loop
    (imported from /root/reference with CPU shims, its PGD/EE models/SGD
    running unmodified), and
  * our train-step/eval-step stack (the exact objects train.py uses),
    initialized from the SAME torch weights via tools/convert_torch_checkpoint.

Per-epoch clean/adversarial accuracies are recorded for both, plus a
second-seed run of ours to size the seed-noise band. `main()` writes
output/twin/*.json and a docs/TWIN.md report.

    python tools/digital_twin.py --epochs 8 --n-train 2000 --num-steps 40

The CI-able mini version lives in tests/test_digital_twin.py.

Reference match: MNIST/experiments_mnist.py:152-268 (train loop),
271-357 (validate), utils/attacks.py:12-29 (PGD).
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"

# flagship MNIST recipe (edge_enhancement_tpu/configs/mnist/ee_at_bpda3_square.yml)
RECIPE = dict(arch="Net2_EE_square", method_name="EE_BPDA3_AT_square",
              batch_size=50, lr=0.1, momentum=0.3, weight_decay=1e-4,
              epsilon=0.3, step_size_1=0.01, random=True,
              r=4, w=1.0, gf=False, low=25.0, high=51.0, alpha=0.3, sigma=1.0,
              type_canny="CannyFilter_step125_1", n_queries=1)


# --------------------------------------------------------------------------
# learnable synthetic MNIST, written as REAL idx files
# --------------------------------------------------------------------------

def _synth_images(n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Class c = bright 10x10 block at grid position c (+-2 px jitter) over
    low noise. Robustly separable at eps=0.3 (block contrast 1.0 vs <=0.15
    background), so adversarial training has signal to learn."""
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, 10, n).astype(np.uint8)
    centers = [(5 + 9 * (c // 4), 4 + 7 * (c % 4)) for c in range(10)]
    xs = rng.uniform(0.0, 0.15, (n, 28, 28)).astype(np.float32)
    for i in range(n):
        cy, cx = centers[ys[i]]
        cy += rng.integers(-2, 3)
        cx += rng.integers(-2, 3)
        y0, x0 = max(cy - 5, 0), max(cx - 5, 0)
        xs[i, y0:y0 + 10, x0:x0 + 10] = rng.uniform(0.85, 1.0)
    return (xs * 255).astype(np.uint8), ys


def _write_idx(path: str, arr: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, arr.ndim))
        f.write(struct.pack(">" + "I" * arr.ndim, *arr.shape))
        f.write(arr.tobytes())


def make_dataset(out_dir: str, n_train: int, n_val: int, seed: int = 0) -> str:
    os.makedirs(out_dir, exist_ok=True)
    tr_x, tr_y = _synth_images(n_train, seed)
    va_x, va_y = _synth_images(n_val, seed + 1)
    _write_idx(os.path.join(out_dir, "train-images-idx3-ubyte"), tr_x)
    _write_idx(os.path.join(out_dir, "train-labels-idx1-ubyte"), tr_y)
    _write_idx(os.path.join(out_dir, "t10k-images-idx3-ubyte"), va_x)
    _write_idx(os.path.join(out_dir, "t10k-labels-idx1-ubyte"), va_y)
    return out_dir


def _read_idx(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        _, _, ndim = struct.unpack(">HBB", f.read(4))
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)


# --------------------------------------------------------------------------
# reference side: run the actual experiments_mnist.py loop on CPU
# --------------------------------------------------------------------------

def _install_reference_shims():
    import torch
    six = types.ModuleType("torch._six")
    import builtins as _b
    six.builtins = _b
    sys.modules.setdefault("torch._six", six)
    torch.Tensor.cuda = lambda self, *a, **k: self
    _orig_to = torch.Tensor.to

    def _to_cpu(self, *args, **kwargs):
        def fix(a):
            if isinstance(a, torch.device) and a.type == "cuda":
                return "cpu"
            if isinstance(a, str) and a.startswith("cuda"):
                return "cpu"
            return a
        args = tuple(fix(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = fix(kwargs["device"])
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to_cpu
    if not callable(getattr(torch, "rfft", None)):
        torch.rfft = lambda x, nd, onesided=True: torch.view_as_real(
            torch.fft.fft2(x))
        torch.irfft = lambda x, nd, onesided=True: torch.fft.ifft2(
            torch.view_as_complex(x.contiguous())).real
    _orig_randn = torch.randn

    def _randn_cpu(*a, **k):
        if str(k.get("device", "")).startswith("cuda"):
            k["device"] = "cpu"
        return _orig_randn(*a, **k)

    torch.randn = _randn_cpu
    for name in ("torchvision", "torchvision.models", "torchvision.datasets",
                 "torchvision.transforms", "torchvision.utils"):
        sys.modules.setdefault(name, types.ModuleType(name))
    mg = types.ModuleType("managpu")

    class GpuManager:  # the reference's CUDA picker; inert on CPU
        def set_by_memory(self, n):
            return "cpu"

    mg.GpuManager = GpuManager
    sys.modules.setdefault("managpu", mg)
    aa = types.ModuleType("autoattack")
    aa.AutoAttack = object
    sys.modules.setdefault("autoattack", aa)
    ed = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            return self[k]

        def __setattr__(self, k, v):
            self[k] = v

    ed.EasyDict = EasyDict
    sys.modules.setdefault("easydict", ed)
    for p in (REF, os.path.join(REF, "MNIST")):
        if p not in sys.path:
            sys.path.insert(0, p)


def _torch_loaders(data_dir: str, batch_size: int, seed: int):
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    def mk(split, shuffle):
        x = _read_idx(os.path.join(data_dir, f"{split}-images-idx3-ubyte"))
        y = _read_idx(os.path.join(data_dir, f"{split}-labels-idx1-ubyte"))
        xt = torch.from_numpy(x.astype(np.float32) / 255.0).unsqueeze(1)
        yt = torch.from_numpy(y.astype(np.int64))
        g = torch.Generator()
        g.manual_seed(seed)
        return DataLoader(TensorDataset(xt, yt), batch_size=batch_size,
                          shuffle=shuffle, generator=g if shuffle else None)

    return mk("train", True), mk("t10k", False)


def run_reference(data_dir: str, work_dir: str, epochs: int, num_steps: int,
                  seed: int = 1) -> dict:
    """Train with the reference's own train()/validate() functions; returns
    per-epoch metrics and saves the INITIAL weights for the twin."""
    _install_reference_shims()
    import torch
    import experiments_mnist as E
    from models_mnist import Net2_EE_square

    r = RECIPE
    args = types.SimpleNamespace(**r, num_steps_1=num_steps, seed=seed,
                                 attack_method="PGD", print_freq=10 ** 9)
    E.args = args
    torch.manual_seed(seed)
    model = Net2_EE_square(r=args.r, w=args.w, with_gf=args.gf, low=args.low,
                           high=args.high, alpha=args.alpha, sigma=args.sigma,
                           type_canny=args.type_canny, epsilon=args.epsilon,
                           n_queries=args.n_queries)
    os.makedirs(work_dir, exist_ok=True)
    init_pth = os.path.join(work_dir, "init.pth")
    torch.save({"epoch": 0, "arch": args.arch, "state_dict": model.state_dict(),
                "best_prec1": 0.0}, init_pth)

    import torch.nn as nn
    import torch.optim as optim
    optimizer = optim.SGD(model.parameters(), lr=args.lr,
                          momentum=args.momentum,
                          weight_decay=args.weight_decay)
    criterion = nn.CrossEntropyLoss()
    train_loader, val_loader = _torch_loaders(data_dir, args.batch_size, seed)
    log_dir = os.path.join(work_dir, "log") + os.sep
    os.makedirs(log_dir, exist_ok=True)
    # logs are written in append mode: clear any stale one from an
    # interrupted run so recovery parses only this run's epochs
    for f in os.listdir(log_dir):
        if f.endswith(".txt"):
            os.remove(os.path.join(log_dir, f))

    def clean_acc():
        model.eval()
        good = tot = 0
        with torch.no_grad():
            for xb, yb in val_loader:
                pred = model(xb).argmax(1)
                good += int((pred == yb).sum())
                tot += len(yb)
        return 100.0 * good / tot

    hist = {"clean": [], "adv": []}
    for epoch in range(epochs):
        E.train(train_loader, model, criterion, optimizer, epoch,
                args.print_freq, "cpu", log_dir)
        adv1, _ = E.validate(val_loader, model, criterion, args.print_freq,
                             "cpu", args.num_steps_1, args.step_size_1, log_dir)
        hist["adv"].append(float(adv1))
        hist["clean"].append(clean_acc())
    return {"history": hist, "init_pth": init_pth}


# --------------------------------------------------------------------------
# our side: the exact train.py step/eval objects, same init, same data
# --------------------------------------------------------------------------

def parse_reference_log(work_dir: str, epochs: int):
    """Recover a finished (or partial) reference run's per-epoch histories
    from its own log.txt (the reference's validate() writes ' * Clean/Adv
    Prec@1' summary lines once per epoch)."""
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


def run_ours(data_dir: str, init_pth: str, epochs: int, num_steps: int,
             seed: int = 1) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from edge_enhancement_tpu.data.datasets import get_dataset
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.objectives.methods import MethodConfig
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import (EvalAttackConfig,
                                                    OptimConfig,
                                                    build_eval_step,
                                                    build_train_step,
                                                    create_train_state)
    from tools.convert_torch_checkpoint import convert, mnist_name_map

    r = RECIPE
    train_ds, spec = get_dataset("mnist", data_dir, train=True)
    val_ds, _ = get_dataset("mnist", data_dir, train=False)
    cfg_args = dict(r=r["r"], w=r["w"], gf=r["gf"], low=r["low"],
                    high=r["high"], alpha=r["alpha"], sigma=r["sigma"],
                    type_canny=r["type_canny"], epsilon=r["epsilon"],
                    n_queries=r["n_queries"], cize=28)
    ops = ModelOps(build_model(r["arch"], cfg_args, spec.num_classes))
    state = create_train_state(ops, jax.random.PRNGKey(seed),
                               jnp.zeros((1, 28, 28, 1)))
    sd = torch.load(init_pth, map_location="cpu")["state_dict"]
    params, stats, matched, _ = convert(sd, mnist_name_map(), state.params,
                                     state.batch_stats)
    assert matched == 8, matched     # conv1/conv2/fc1/fc2 x (kernel, bias)
    state = state.replace(params=params, batch_stats=stats)

    mcfg = MethodConfig(method_name=r["method_name"], epsilon=r["epsilon"],
                        num_steps=num_steps, step_size=r["step_size_1"],
                        random=r["random"], num_classes=spec.num_classes,
                        pre_square=False, square_epsilon=r["epsilon"],
                        square_n_queries=r["n_queries"])
    step = build_train_step(ops, mcfg, OptimConfig(r["momentum"],
                                                   r["weight_decay"]))
    eval_step = build_eval_step(ops, EvalAttackConfig(
        "PGD", r["epsilon"], num_steps, r["step_size_1"], True,
        spec.num_classes))

    key = jax.random.PRNGKey(seed)
    hist = {"clean": [], "adv": []}
    for epoch in range(epochs):
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
    return {"history": hist}


# --------------------------------------------------------------------------
# orchestration + report
# --------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=2000)
    ap.add_argument("--n-val", type=int, default=500)
    ap.add_argument("--num-steps", type=int, default=40)
    ap.add_argument("--out", default=os.path.join(REPO, "output", "twin"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    data_dir = make_dataset(os.path.join(args.out, "data"),
                            args.n_train, args.n_val)
    ref = parse_reference_log(os.path.join(args.out, "ref"), args.epochs)
    if ref is not None:
        print("=> reference run recovered from its log (skipping torch)")
    else:
        print("=> reference (torch) run ...")
        ref = run_reference(data_dir, os.path.join(args.out, "ref"),
                            args.epochs, args.num_steps, seed=1)
    print("=> our run (same init) ...")
    ours = run_ours(data_dir, ref["init_pth"], args.epochs, args.num_steps,
                    seed=1)
    print("=> our run, second seed (noise band) ...")
    ours2 = run_ours(data_dir, ref["init_pth"], args.epochs, args.num_steps,
                     seed=2)

    res = {"recipe": dict(RECIPE, num_steps_1=args.num_steps,
                          epochs=args.epochs, n_train=args.n_train),
           "reference": ref["history"], "ours_seed1": ours["history"],
           "ours_seed2": ours2["history"]}
    with open(os.path.join(args.out, "twin.json"), "w") as f:
        json.dump(res, f, indent=1)

    band = max(max(abs(a - b) for a, b in zip(ours["history"][k],
                                              ours2["history"][k]))
               for k in ("clean", "adv"))
    gap = max(max(abs(a - b) for a, b in zip(ours["history"][k],
                                             ref["history"][k]))
              for k in ("clean", "adv"))
    lines = ["# Digital-twin accuracy run", "",
             f"Flagship recipe `{RECIPE['method_name']}` / `{RECIPE['arch']}`"
             f" on learnable synthetic MNIST ({args.n_train} train / "
             f"{args.n_val} val), PGD-{args.num_steps} AT, identical torch "
             "init on both sides (tools/digital_twin.py).", "",
             "| epoch | ref clean | ours clean | ref adv (PGD) | ours adv |",
             "|---|---|---|---|---|"]
    for e in range(args.epochs):
        lines.append(f"| {e} | {ref['history']['clean'][e]:.2f} | "
                     f"{ours['history']['clean'][e]:.2f} | "
                     f"{ref['history']['adv'][e]:.2f} | "
                     f"{ours['history']['adv'][e]:.2f} |")
    lines += ["", f"Max |ours - reference| over both curves: **{gap:.2f}** "
                  f"accuracy points; seed-noise band (ours seed1 vs seed2): "
                  f"**{band:.2f}** points.", ""]
    with open(os.path.join(REPO, "docs", "TWIN.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"gap": gap, "band": band}))


if __name__ == "__main__":
    main()
