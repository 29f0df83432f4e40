#!/usr/bin/env python
"""Cross-stack evaluation for the hard digital twin: attribute the adv-side
offset (ours converged ~+6 over the reference, output/twin_hard).

The twin trains and EVALUATES each side within its own stack, so "ours adv
is higher" conflates (a) our training finding a more robust equilibrium
with (b) our PGD evaluator being weaker. This tool separates them: it loads
OUR trained twin checkpoint (output/twin_hard/ours_s{seed}.pkl) into the
reference's own torch `resnet18_EE_square` (inverse of
tools/convert_torch_checkpoint.py) and runs the reference's own
`validate()` — its PGD, its eval-mode semantics — on the identical val
set. If the reference attacker reproduces our adv number on our weights,
the offset is a property of the trained model, not of the evaluator.

    python tools/twin_cross_eval.py --seed 1 [--task hard]

Reference match: Tiny_ImageNet/experiments_tinyimagenet.py:326-432
(validate), utils/attacks.py:12-29 (PGD).
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
from digital_twin_tiny import (METHODS, NUM_CLASSES, RECIPE,  # noqa: E402
                               TASKS)


# single implementation in the converter (also powers its --to-torch mode)
from convert_torch_checkpoint import params_to_torch_state_dict  # noqa: E402,F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--task", default="hard")
    ap.add_argument("--method", default="flagship", choices=sorted(METHODS),
                    help="objective family (must match the twin run being "
                         "attributed; 'tar' makes the reference validate() "
                         "use its targeted attack, as it does for every "
                         "tar* method)")
    ap.add_argument("--n-val", type=int, default=250)
    ap.add_argument("--num-steps", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, "output",
                                                  "twin_hard"))
    args = ap.parse_args()

    RECIPE["method_name"] = METHODS[args.method]
    ckpt_p = os.path.join(args.out, f"ours_s{args.seed}.pkl")
    with open(ckpt_p, "rb") as f:
        saved = pickle.load(f)
    print(f"loaded {ckpt_p} (trained through epoch {saved['epoch']}), "
          f"twin-side history tail clean={saved['hist']['clean'][-2:]} "
          f"adv={saved['hist']['adv'][-2:]}")

    _install_reference_shims()
    tiny = "/root/reference/Tiny_ImageNet"
    if tiny not in sys.path:
        sys.path.insert(0, tiny)
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader, TensorDataset

    import experiments_tinyimagenet as E
    from models_tinyimagenet import resnet18_EE_square

    from tools.convert_torch_checkpoint import resnet_name_map

    r = RECIPE
    eargs = types.SimpleNamespace(**r, num_steps_1=args.num_steps,
                                  seed=args.seed, attack_method="PGD",
                                  print_freq=10 ** 9)
    E.args = eargs
    torch.manual_seed(args.seed)
    model = resnet18_EE_square(
        pretrained=False, cize=r["cize"], r=r["r"], w=r["w"],
        with_gf=r["gf"], low=r["low"], high=r["high"], alpha=r["alpha"],
        sigma=r["sigma"], type_canny=r["type_canny"],
        epsilon=r["epsilon"], n_queries=r["n_queries"])

    sd = params_to_torch_state_dict(saved["params"], saved["batch_stats"],
                                    resnet_name_map(18))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # allowed-missing: EE front-end constant buffers (gaussian/sobel/thin
    # kernels — construction-time constants, identical by the op-parity
    # tests) and the reference's dead `u2netp` submodule (instantiated at
    # resnet_EE_square.py:138 but never called in forward); nothing we
    # trained may go unconsumed
    assert not unexpected, unexpected
    learned = [m for m in missing
               if ".num_batches_tracked" not in m
               and not m.startswith("u2netp.")
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
    for line in open(os.path.join(log_dir, "log.txt")):
        if line.startswith(" * Clean Prec@1"):
            clean = float(line.split()[3])
        elif line.startswith(" * Adv Prec@1"):
            adv = float(line.split()[3])
    res = {"seed": args.seed, "task": args.task,
           "ours_side_eval": {"clean": saved["hist"]["clean"][-1],
                              "adv": saved["hist"]["adv"][-1]},
           "reference_attacker_on_our_weights": {"clean": clean,
                                                 "adv": adv}}
    with open(os.path.join(args.out, f"cross_s{args.seed}.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
