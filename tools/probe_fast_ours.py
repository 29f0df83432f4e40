#!/usr/bin/env python
"""Matched-divergence probe for the fast-AT twin (docs/TWIN.md ninth
section): run OUR fast-AT step at the batch-rescaled shipped LR peak
(0.4 * 25/512 = 0.0195) that made the reference's main_fast.py explode on
synthetic-hard (epoch-0 validate loss ~4.4e4, clean 8.8 — see
docs/demo/probe_fast_ref.txt), and record that our stack diverges on the
same trajectory. Companion of tools/probe_trades_ref.py / probe_alp usage.

    python tools/probe_fast_ours.py [--lr-peak 0.01953125] [--epochs 2]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from digital_twin_fast import RECIPE, run_ours  # noqa: E402
from digital_twin_tiny import TASKS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr-peak", type=float, default=RECIPE["lr_peak"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--init",
                    default=os.path.join(REPO, "output", "twin_hard_fast",
                                         "ref_s1", "init.pth"))
    ap.add_argument("--platform", default="default")
    args = ap.parse_args()

    xs_tr, ys_tr = TASKS["hard"](500, seed=0)
    xs_va, ys_va = TASKS["hard"](250, seed=1)
    init = args.init if os.path.exists(args.init) else None
    out = run_ours(xs_tr, ys_tr, xs_va, ys_va, init, args.epochs,
                   seed=args.seed, platform=args.platform,
                   lr_peak=args.lr_peak)
    print({"lr_peak": args.lr_peak, "history": out["history"]})


if __name__ == "__main__":
    main()
