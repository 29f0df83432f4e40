#!/usr/bin/env python
"""Generate the paper-figure panels (reference utils/plot.py workflow):
frequency splits, HFS/Canny visualisation grids, and training curves from a
log file.

    python tools/make_figures.py [--out /tmp/ee_figures] [--log <log.txt>]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ee_figures")
    ap.add_argument("--log", default=None, help="log.txt to plot curves from")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from edge_enhancement_tpu.data.datasets import SPECS, synthetic_dataset
    from edge_enhancement_tpu.utils.analysis import (edge_visualization,
                                                     frequency_split,
                                                     plot_training_curves)

    os.makedirs(args.out, exist_ok=True)
    ds = synthetic_dataset(SPECS["tiny_imagenet"], 4, seed=7)
    (imgs, _) = next(ds.batches(4, shuffle=False, seed=0))

    # Panel grid: original | low-freq | high-freq | HFS | edges (per variant)
    variants = ["CannyFilter", "CannyFilter_step125_1"]
    rows = len(imgs)
    cols = 3 + 1 + len(variants)
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.2 * rows))
    for r in range(rows):
        img = imgs[r]
        low, high = frequency_split(img, 8)
        panels = [("original", img), ("low-freq r=8", np.clip(low, 0, 1)),
                  ("high-freq", np.clip(high + 0.5, 0, 1))]
        viz0 = edge_visualization(img, variant=variants[0], low=38 / 255,
                                  high=76 / 255, r=8)
        panels.append(("HFS", np.clip(viz0["hfs"], 0, 1)))
        for v in variants:
            viz = edge_visualization(img, variant=v, low=38 / 255,
                                     high=76 / 255, r=8)
            panels.append((v.replace("CannyFilter", "canny"),
                           np.repeat(viz["edges"], 3, axis=-1)))
        for c, (title, panel) in enumerate(panels):
            ax = axes[r, c]
            ax.imshow(panel)
            ax.set_xticks([]); ax.set_yticks([])
            if r == 0:
                ax.set_title(title, fontsize=9)
    fig.tight_layout()
    grid_path = os.path.join(args.out, "edge_panels.png")
    fig.savefig(grid_path, dpi=140)
    print("wrote", grid_path)

    if args.log:
        p = plot_training_curves({"run": args.log},
                                 os.path.join(args.out, "curves.png"))
        print("wrote", p)


if __name__ == "__main__":
    main()
