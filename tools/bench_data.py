#!/usr/bin/env python
"""Host-side input-pipeline benchmark: generate a synthetic on-disk
ImageFolder (>= 10k JPEG files by default), then measure streaming
throughput of the train pipeline (read + native JPEG decode +
RandomResizedCrop + hflip + float conversion) with O(batch) memory.

    python tools/bench_data.py [--files 10000] [--size 96] [--image-size 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def generate(root, n_files, src_size, n_classes=20):
    from PIL import Image
    rng = np.random.default_rng(0)
    per = n_files // n_classes
    made = 0
    for ci in range(n_classes):
        d = os.path.join(root, f"n{ci:05d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per):
            arr = rng.integers(0, 256, (src_size, src_size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i:06d}.JPEG"),
                                      quality=85)
            made += 1
    return made


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=10000)
    ap.add_argument("--size", type=int, default=96, help="source JPEG size")
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--root", default="/tmp/ee_bench_imagefolder")
    args = ap.parse_args()

    from edge_enhancement_tpu.data import native
    from edge_enhancement_tpu.data.datasets import StreamingImageFolder

    marker = os.path.join(args.root,
                          f".done_{args.files}_{args.size}")
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        made = generate(args.root, args.files, args.size)
        open(marker, "w").close()
        print(f"generated {made} JPEGs in {time.perf_counter()-t0:.1f}s")

    ds = StreamingImageFolder(args.root, args.image_size, train=True)
    print(f"files: {len(ds)}, native jpeg: {native.has_jpeg()}, "
          f"threads: {os.cpu_count()}")

    import resource
    n = 0
    t0 = time.perf_counter()
    for x, y in ds.batches(args.batch, shuffle=True, seed=0):
        n += len(y)
        if n >= args.files:
            break
    dt = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"streamed {n} imgs in {dt:.2f}s -> {n/dt:.0f} img/s host-side "
          f"(peak RSS {rss:.0f} MB)")


if __name__ == "__main__":
    main()
