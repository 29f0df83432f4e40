#!/usr/bin/env python
"""Cross-stack evaluation for the AWP-family digital twin: run the
reference AWP driver's own validate() — its PGD-20, its eval-mode
semantics — on OUR trained twin checkpoint, inverse-converted into the
reference's torch `PreActResNet18_EE_BPDA_3`.

Same attribution logic as tools/twin_cross_eval.py (flagship family): the
twin trains and evaluates each side within its own stack, so any converged
adv offset conflates trained-model quality with evaluator strength. If the
reference's attacker reproduces our adv number on our weights, the offset
is a property of the trained models, not the evaluators.

    python tools/twin_cross_eval_awp.py --seed 1

Reference match: AWP/Tiny_imagenet/experiments_tiny_awp.py:315-404
(validate, log_pgd.txt), utils/attacks.py:12-29 (PGD).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from digital_twin import _install_reference_shims  # noqa: E402
from digital_twin_awp import EVAL_STEPS, RECIPE  # noqa: E402
from digital_twin_tiny import TASKS  # noqa: E402

from convert_torch_checkpoint import (  # noqa: E402
    params_to_torch_state_dict, preact_name_map)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--task", default="hard")
    ap.add_argument("--n-val", type=int, default=250)
    ap.add_argument("--num-steps", type=int, default=EVAL_STEPS,
                    help="eval attack steps (the AWP driver's in-training "
                         "validate uses num_steps_2 = 20)")
    ap.add_argument("--out", default=os.path.join(REPO, "output",
                                                  "twin_hard_awp"))
    args = ap.parse_args()

    ckpt_p = os.path.join(args.out, f"ours_s{args.seed}.pkl")
    with open(ckpt_p, "rb") as f:
        saved = pickle.load(f)
    print(f"loaded {ckpt_p} (trained through epoch {saved['epoch']}), "
          f"twin-side history tail clean={saved['hist']['clean'][-2:]} "
          f"adv={saved['hist']['adv'][-2:]}")

    _install_reference_shims()
    awp_dir = "/root/reference/AWP/Tiny_imagenet"
    if awp_dir not in sys.path:
        sys.path.insert(0, awp_dir)
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader, TensorDataset

    import experiments_tiny_awp as E
    from models_tiny_awp.preactresnet_EE_BPDA_3 import \
        PreActResNet18_EE_BPDA_3

    r = RECIPE
    eargs = types.SimpleNamespace(**r, num_steps_1=args.num_steps,
                                  num_steps_2=args.num_steps,
                                  seed=args.seed, attack_method="PGD",
                                  print_freq=10 ** 9)
    E.args = eargs
    torch.manual_seed(args.seed)
    model = PreActResNet18_EE_BPDA_3(
        dataset="Tiny-ImageNet", cize=r["cize"], r=r["r"], w=r["w"],
        with_gf=r["gf"], low=r["low"], high=r["high"], alpha=r["alpha"],
        sigma=r["sigma"])

    sd = params_to_torch_state_dict(saved["params"], saved["batch_stats"],
                                    preact_name_map(18))
    # the name map aliases BOTH torch head spellings ('linear' for CIFAR
    # stems, 'fc' for (Tiny-)ImageNet) to our Dense_0; the inverse emits
    # both — drop the alias this model variant doesn't declare
    model_keys = set(model.state_dict())
    for alias in ("linear.weight", "linear.bias", "fc.weight", "fc.bias"):
        if alias in sd and alias not in model_keys:
            del sd[alias]
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # allowed-missing: EE front-end constant buffers (gaussian/sobel/canny
    # kernels and the HFS mask — construction-time constants, identical by
    # the op-parity tests); nothing we trained may go unconsumed
    assert not unexpected, unexpected
    learned = [m for m in missing
               if ".num_batches_tracked" not in m
               and not any(s in m for s in ("canny", "filter", "kernel",
                                            "sobel", "gaussian", "hfs",
                                            "weight_fft", "mask"))]
    print(f"state_dict: {len(sd)} tensors loaded, "
          f"{len(missing)} untouched buffers (front-end constants)")
    assert not learned, learned

    xs_va, ys_va = TASKS[args.task](args.n_val, seed=1)
    xt = torch.from_numpy(xs_va.astype(np.float32) / 255.0)
    xt = xt.permute(0, 3, 1, 2).contiguous()
    loader = DataLoader(TensorDataset(xt, torch.from_numpy(
        ys_va.astype(np.int64))), batch_size=r["batch_size"], shuffle=False)

    log_dir = os.path.join(args.out, f"cross_s{args.seed}") + os.sep
    os.makedirs(log_dir, exist_ok=True)
    E.validate(loader, model, nn.CrossEntropyLoss(), eargs.print_freq,
               "cpu", args.num_steps, r["step_size_1"], log_dir)
    clean = adv = None
    for line in open(os.path.join(log_dir, "log_pgd.txt")):
        if line.startswith(" * Clean Prec@1"):
            clean = float(line.split()[3])
        elif line.startswith(" * Adv Prec@1"):
            adv = float(line.split()[3])
    res = {"seed": args.seed, "task": args.task, "family": "EE_AT_AWP",
           "ours_side_eval": {"clean": saved["hist"]["clean"][-1],
                              "adv": saved["hist"]["adv"][-1]},
           "reference_attacker_on_our_weights": {"clean": clean,
                                                 "adv": adv}}
    with open(os.path.join(args.out, f"cross_s{args.seed}.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
