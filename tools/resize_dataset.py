#!/usr/bin/env python
"""Pre-resize an ImageFolder dataset to multiple sizes (the fast-AT
progressive-resize data prep; reference fgsm_imagenet/resize.py).

    python tools/resize_dataset.py --src /data/imagenet --dest /data/imagenet-sz \
        --sizes 160 352
"""

import argparse
import os
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

from PIL import Image


def resize_one(args):
    src_root, dest_root, sizes, fn = args
    try:
        with Image.open(fn) as im:
            im = im.convert("RGB")
            w, h = im.size
            for sz in sizes:
                ratio = min(h / sz, w / sz)
                out = im.resize((int(w / ratio), int(h / ratio)),
                                resample=Image.BICUBIC)
                new_fn = Path(dest_root) / str(sz) / fn.relative_to(src_root)
                new_fn.parent.mkdir(parents=True, exist_ok=True)
                out.save(new_fn)
    except Exception as e:  # noqa: BLE001 — skip corrupt files, keep going
        print(f"skip {fn}: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dest", required=True)
    ap.add_argument("--sizes", type=int, nargs="+", default=[160, 352])
    ap.add_argument("--workers", type=int, default=min(48, os.cpu_count() or 1))
    args = ap.parse_args()

    src = Path(args.src)
    files = [p for p in src.rglob("*") if p.suffix.lower() in
             (".jpeg", ".jpg", ".png")]
    print(f"resizing {len(files)} images to {args.sizes}")
    work = [(src, args.dest, args.sizes, f) for f in files]
    with ProcessPoolExecutor(args.workers) as ex:
        list(ex.map(resize_one, work, chunksize=64))


if __name__ == "__main__":
    main()
