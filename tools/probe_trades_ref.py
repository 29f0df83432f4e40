"""Does the REFERENCE's TRADES recipe also diverge on synthetic-hard?

tools/probe_nan.py showed our TRADES config (TinyIN resnet18, lr 0.1,
beta 6, eps 16/255) exploding to NaN within ~6 steps on synthetic-hard.
This probe runs the reference's own Trades class + driver step
(experiments_tinyimagenet.py:257-291: train-mode preds, eval-mode
PGD_Linf on KL, train-mode adv recompute, CE + beta*KL, SGD) with the
reference's own resnet18 on the same data and hyperparameters, printing
loss / logit max per step. If torch explodes the same way, the NaN is a
property of the RECIPE at this operating point, not of our rebuild.

    python tools/probe_trades_ref.py --steps 10
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from digital_twin import _install_reference_shims  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--bs", type=int, default=100)
    ap.add_argument("--method", default="TRADES", choices=["TRADES", "ALP"])
    ap.add_argument("--beta", type=float, default=None,
                    help="default: the shipped config's value (TRADES 6.0, "
                         "ALP 1.0)")
    ap.add_argument("--lr", type=float, default=0.1)
    args = ap.parse_args()
    if args.beta is None:
        args.beta = 6.0 if args.method == "TRADES" else 1.0

    _install_reference_shims()
    tiny = "/root/reference/Tiny_ImageNet"
    if tiny not in sys.path:
        sys.path.insert(0, tiny)
    import torch
    import torch.nn.functional as F

    from models_tinyimagenet import resnet18
    sys.path.insert(0, "/root/reference")
    from utils.attacks import ALP, Trades

    from edge_enhancement_tpu.data.datasets import synthetic_hard_images

    torch.manual_seed(1)
    model = resnet18(pretrained=False)
    opt = torch.optim.SGD(model.parameters(), lr=args.lr, momentum=0.9,
                          weight_decay=2e-4)
    cls = Trades if args.method == "TRADES" else ALP
    crit = cls(step_size=0.003921568627451, epsilon=0.062745098039216,
               perturb_steps=10, beta=args.beta)

    xs, ys = synthetic_hard_images(args.bs * args.steps, seed=1)
    for i in range(args.steps):
        x = torch.from_numpy(
            xs[i * args.bs:(i + 1) * args.bs].astype(np.float32) / 255.0
        ).permute(0, 3, 1, 2).contiguous()
        y = torch.from_numpy(
            ys[i * args.bs:(i + 1) * args.bs].astype(np.int64))
        model.train()
        preds = model(x)
        if args.method == "TRADES":
            data_adv = crit.PGD_Linf(model, x, preds)
            loss = crit.loss(model, preds, data_adv, y, opt)
        else:
            # ALP driver step (experiments_tinyimagenet.py:245-248,287):
            # PGD_Linf leaves the model in eval mode, so logits_adv are
            # eval-mode — the quirk our objectives reproduce
            data_adv = crit.PGD_Linf(model, x, y)
            output = model(data_adv)
            loss = crit.loss(model, preds, output, y, opt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            model.eval()
            lg = model(x)
        pmax = max(p.detach().abs().max().item() for p in model.parameters())
        print(json.dumps({
            "step": i, "loss": float(loss.item()),
            "logit_max": float(lg.abs().max().item()),
            "logit_finite": bool(torch.isfinite(lg).all().item()),
            "param_max": pmax,
            "params_finite": bool(all(torch.isfinite(p).all().item()
                                      for p in model.parameters()))}))
        if not np.isfinite(loss.item()):
            print(f"reference non-finite at step {i}")
            break


if __name__ == "__main__":
    main()
