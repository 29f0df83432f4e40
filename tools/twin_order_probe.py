#!/usr/bin/env python
"""Shuffle-order attribution probe for the non-saturating digital twin.

The flagship hard-task twin (docs/TWIN.md v2) found a consistently-signed
converged offset (ours slightly above ref, e.g. +5.7 adv vs a 5.8-point
band) with evaluators proven interchangeable (tools/twin_cross_eval.py).
Two candidate causes remain: (a) the different shuffle streams (torch
DataLoader's seeded randperm chain vs our stateless per-epoch
threefry shuffle) steering different draws from the recipe, and
(b) backend/attack-RNG rounding. This probe isolates (a): it replays the
reference run's EXACT batch order through our trainer.

The order is recovered empirically, not re-derived: a DataLoader built
with the same arguments as the twin's `mk()` (same batch size,
shuffle=True, same dedicated generator seeding — digital_twin_tiny.py
run_reference) over an index-valued TensorDataset yields exactly the
index stream the reference consumed, including the loader-internal
`_base_seed` draw from the shared generator at each epoch's iterator
construction. The dataset CONTENTS never touch the sampler stream, so
an index dataset of the same length reproduces it bit-for-bit.

    python tools/twin_order_probe.py --seeds 1 2 3 --epochs 10 \
        --n-train 500 --ours-platform default

Writes output/twin_hard/order_probe.json: per seed, the reference's
converged values, ours with our native order (from the committed
twin_hard.json), and ours re-trained with torch's order. If the offset
tracks the order swap it was a shuffle-stream property; if it persists,
the remaining cause is backend rounding + attack-RNG draws.

Reference match: /root/reference/Tiny_ImageNet/experiments_tinyimagenet.py
train() loop order consumption; utils/data_loader.py DataLoader use.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from digital_twin_tiny import (TASKS, RECIPE, converged,  # noqa: E402
                               parse_reference_log, run_ours)


def torch_batch_order(n: int, batch_size: int, epochs: int, seed: int):
    """Record the exact per-epoch index batches the reference's DataLoader
    produced: identical constructor arguments, index-valued dataset."""
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    g = torch.Generator()
    g.manual_seed(seed)
    loader = DataLoader(TensorDataset(torch.arange(n)), batch_size=batch_size,
                        shuffle=True, generator=g)
    orders = []
    for _ in range(epochs):
        orders.append([ix[0].numpy().copy() for ix in loader])
    return orders


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n-train", type=int, default=500)
    ap.add_argument("--n-val", type=int, default=250)
    ap.add_argument("--num-steps", type=int, default=10)
    ap.add_argument("--task", default="hard", choices=sorted(TASKS))
    ap.add_argument("--ours-platform", default="cpu",
                    choices=["cpu", "default"])
    ap.add_argument("--twin-dir", default=os.path.join(REPO, "output",
                                                       "twin_hard"))
    args = ap.parse_args()

    gen = TASKS[args.task]
    xs_tr, ys_tr = gen(args.n_train, seed=0)
    xs_va, ys_va = gen(args.n_val, seed=1)

    twin_p = os.path.join(args.twin_dir, f"twin_{args.task}.json")
    twin = json.load(open(twin_p)) if os.path.exists(twin_p) else None

    out_p = os.path.join(args.twin_dir, "order_probe.json")
    res = json.load(open(out_p)) if os.path.exists(out_p) else {}
    for seed in args.seeds:
        if str(seed) in res and \
                len(res[str(seed)]["history"]["clean"]) >= args.epochs:
            print(f"=> seed {seed}: recovered from prior run")
            continue
        ref_dir = os.path.join(args.twin_dir, f"ref_s{seed}")
        ref = parse_reference_log(ref_dir, args.epochs)
        assert ref is not None, f"no finished reference run in {ref_dir}"

        orders = torch_batch_order(args.n_train, RECIPE["batch_size"],
                                   args.epochs, seed)
        # determinism self-check + the swap is real (differs from epoch 0's
        # identity-free native stream with overwhelming probability)
        orders2 = torch_batch_order(args.n_train, RECIPE["batch_size"],
                                    args.epochs, seed)
        assert all((a == b).all() for ea, eb in zip(orders, orders2)
                   for a, b in zip(ea, eb))
        flat0 = np.concatenate(orders[0])
        assert not np.array_equal(flat0, np.arange(args.n_train))

        print(f"=> ours with torch order, seed {seed} ...", flush=True)
        ours = run_ours(xs_tr, ys_tr, xs_va, ys_va, ref["init_pth"],
                        args.epochs, args.num_steps, seed=seed,
                        platform=args.ours_platform, batch_order=orders)
        entry = {"ref": converged(ref["history"]),
                 "ours_torch_order": converged(ours["history"]),
                 "history": ours["history"]}
        if twin is not None and str(seed) in twin.get("ours", {}):
            entry["ours_native_order"] = converged(twin["ours"][str(seed)])
        res[str(seed)] = entry
        with open(out_p, "w") as f:
            json.dump(res, f, indent=1)

    summary = {}
    seed_keys = [s for s in res if s != "summary"]
    for m in ("clean", "adv"):
        rv = [res[s]["ref"][m] for s in seed_keys]
        tv = [res[s]["ours_torch_order"][m] for s in seed_keys]
        nv = [res[s]["ours_native_order"][m] for s in seed_keys
              if "ours_native_order" in res[s]]
        summary[m] = {
            "ref_mean": float(np.mean(rv)),
            "ours_torch_order_mean": float(np.mean(tv)),
            "ours_native_order_mean": float(np.mean(nv)) if nv else None,
            "offset_torch_order": float(np.mean(tv) - np.mean(rv)),
            "offset_native_order": (float(np.mean(nv) - np.mean(rv))
                                    if nv else None),
        }
    res["summary"] = summary
    with open(out_p, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
