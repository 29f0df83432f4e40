"""Dataset loading: MNIST idx files, CIFAR-100 pickle batches, Tiny-ImageNet /
ImageNet image folders (via PIL), plus a synthetic generator for smoke tests
and benchmarking on machines without the datasets.

Parity notes (reference utils/data_loader.py): NO normalisation anywhere —
pixels stay in [0, 1] (the attacks' clamp(0,1) assumes this). Augmentations:
MNIST none; CIFAR-100 pad-4 random crop + hflip + random rotation(15);
Tiny-ImageNet hflip only; ImageNet RandomResizedCrop(224)+hflip train /
Resize(256)+CenterCrop(224) eval.

Layout is NHWC float32 throughout.
"""

from __future__ import annotations

import dataclasses
import gzip
import os
import pickle
import struct as pystruct
from typing import Iterator, Optional

import numpy as np

from . import native


@dataclasses.dataclass
class DatasetSpec:
    name: str
    image_size: int
    channels: int
    num_classes: int
    train_size: int
    eval_size: int


SPECS = {
    "mnist": DatasetSpec("mnist", 28, 1, 10, 60000, 10000),
    "cifar100": DatasetSpec("cifar100", 32, 3, 100, 50000, 10000),
    "tiny_imagenet": DatasetSpec("tiny_imagenet", 64, 3, 200, 100000, 10000),
    "imagenet": DatasetSpec("imagenet", 224, 3, 1000, 1281167, 50000),
}


# --------------------------------------------------------------------------
# In-memory array datasets
# --------------------------------------------------------------------------

class ArrayDataset:
    """Images (N, H, W, C) uint8 + labels (N,) int32, with optional
    per-sample augmentation applied at batch time."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, augment=None):
        assert images.ndim == 4 and images.dtype == np.uint8
        self.images = images
        self.labels = labels.astype(np.int32)
        self.augment = augment

    def __len__(self):
        return len(self.images)

    def batches(self, batch_size: int, *, shuffle: bool, seed: int,
                epoch: int = 0, drop_last: bool = True,
                process_index: int = 0, process_count: int = 1,
                as_uint8: bool = False
                ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Yield float32 [0,1] NHWC batches. With process_count > 1 this
        shards the index stream per host (DistributedSampler equivalent).
        `as_uint8=True` yields raw uint8 pixels instead — 4x less
        host->device traffic; the jitted steps convert to [0,1] f32 on
        device (train/trainer.py::to_float_pixels)."""
        n = len(self)
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        idx = rng.permutation(n) if shuffle else np.arange(n)
        if process_count > 1:
            # every process MUST yield the same number of batches (each batch
            # enters a cross-host sharded computation; a count mismatch
            # deadlocks the collective) — truncate to a common multiple first
            idx = idx[:n - (n % process_count)]
        idx = idx[process_index::process_count]
        stop = (len(idx) // batch_size) * batch_size if drop_last else len(idx)
        for s in range(0, stop, batch_size):
            take = idx[s:s + batch_size].astype(np.int64)
            if self.augment is not None:
                imgs = native.gather_u8(self.images, take)
                imgs = self.augment(imgs, rng)
                if not as_uint8:
                    imgs = imgs.astype(np.float32) / 255.0
                yield imgs, self.labels[take]
            elif as_uint8:
                yield native.gather_u8(self.images, take), self.labels[take]
            else:
                # fused native gather + uint8 -> float32 [0,1]
                yield native.gather_to_float(self.images, take), self.labels[take]


# --------------------------------------------------------------------------
# Augmentations (numpy, applied on uint8 batches)
# --------------------------------------------------------------------------

def hflip_batch(imgs: np.ndarray, rng) -> np.ndarray:
    flip = rng.random(len(imgs)) < 0.5
    return native.hflip(imgs, flip)


def random_resized_crop_augment(imgs: np.ndarray, rng) -> np.ndarray:
    """torchvision RandomResizedCrop semantics (scale 0.08-1.0, ratio
    3/4-4/3, 10 tries then centre fallback) + hflip, on the native resize
    kernel (reference ImageNet train transform, utils/data_loader.py:104-108).
    Output size equals the stored image size."""
    n, h, w, c = imgs.shape
    area = h * w
    boxes = np.empty((n, 4), np.int32)
    for i in range(n):
        for _ in range(10):
            target_area = rng.uniform(0.08, 1.0) * area
            log_ratio = rng.uniform(np.log(3 / 4), np.log(4 / 3))
            ratio = np.exp(log_ratio)
            bw = int(round(np.sqrt(target_area * ratio)))
            bh = int(round(np.sqrt(target_area / ratio)))
            if 0 < bw <= w and 0 < bh <= h:
                by = rng.integers(0, h - bh + 1)
                bx = rng.integers(0, w - bw + 1)
                boxes[i] = (by, bx, bh, bw)
                break
        else:
            s = min(h, w)
            boxes[i] = ((h - s) // 2, (w - s) // 2, s, s)
    out = native.resize_crops(imgs, boxes, h, w)
    return native.hflip(out, rng.random(n) < 0.5)


def cifar_augment(imgs: np.ndarray, rng) -> np.ndarray:
    """RandomCrop(32, padding=4) + hflip + RandomRotation(15), on the native
    runtime (reference transform order: utils/data_loader.py:32-36)."""
    n = len(imgs)
    oy = rng.integers(0, 9, size=n).astype(np.int32)
    ox = rng.integers(0, 9, size=n).astype(np.int32)
    out = native.pad_crop(imgs, 4, oy, ox)
    out = native.hflip(out, rng.random(n) < 0.5)
    angles = rng.uniform(-15, 15, size=n).astype(np.float32)
    return native.rotate(out, angles)


# --------------------------------------------------------------------------
# Real-data loaders
# --------------------------------------------------------------------------

def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = pystruct.unpack(">HBB", f.read(4))
        dims = pystruct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)


def load_mnist(root: str, train: bool) -> ArrayDataset:
    split = "train" if train else "t10k"
    candidates = [root, os.path.join(root, "MNIST", "raw"), os.path.join(root, "raw")]
    for base in candidates:
        img_p = os.path.join(base, f"{split}-images-idx3-ubyte")
        lab_p = os.path.join(base, f"{split}-labels-idx1-ubyte")
        for suffix in ("", ".gz"):
            if os.path.exists(img_p + suffix):
                imgs = _read_idx(img_p + suffix)[..., None]
                labels = _read_idx(lab_p + suffix)
                return ArrayDataset(imgs, labels)
    raise FileNotFoundError(f"MNIST idx files not found under {root!r}")


def load_cifar100(root: str, train: bool) -> ArrayDataset:
    base = root if os.path.exists(os.path.join(root, "train")) else os.path.join(root, "cifar-100-python")
    fname = "train" if train else "test"
    with open(os.path.join(base, fname), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    imgs = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1).copy()
    labels = np.asarray(d[b"fine_labels"])
    return ArrayDataset(imgs, labels, augment=cifar_augment if train else None)


def _decode_files_to_array(paths: list, image_size: int) -> np.ndarray:
    """Decode image files to one (N, S, S, 3) uint8 array.

    JPEGs go through the multithreaded native runtime in chunks (a Tiny-
    ImageNet-scale folder is 100k files — single-threaded PIL cold-start
    dominated short real-data runs); any chunk the native path cannot handle
    (PNGs, truncated files, no libjpeg) falls back to PIL file-by-file."""
    out = np.empty((len(paths), image_size, image_size, 3), np.uint8)
    chunk = 8192
    for lo in range(0, len(paths), chunk):
        sub = paths[lo:lo + chunk]
        got = None
        if all(p.lower().endswith((".jpeg", ".jpg")) for p in sub):
            got = native.stream_decode_files(
                sub, mode=0, draws=None, eval_resize=0, eval_crop=0,
                oh=image_size, ow=image_size, flip_flags=None)
        if got is not None:
            out[lo:lo + len(sub)] = got
            continue
        from PIL import Image
        for i, p in enumerate(sub):
            with Image.open(p) as im:
                im = im.convert("RGB")
                if im.size != (image_size, image_size):
                    im = im.resize((image_size, image_size), Image.BILINEAR)
                out[lo + i] = np.asarray(im, np.uint8)
    return out


def load_image_folder(root: str, image_size: int, augment=None,
                      class_to_idx: Optional[dict] = None) -> ArrayDataset:
    """ImageFolder: root/<class>/*.JPEG, decoded through the native runtime
    (PIL fallback), resized to image_size (Tiny-ImageNet ships at 64x64
    already, where the resize is an exact identity)."""
    classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    if class_to_idx is None:
        class_to_idx = {c: i for i, c in enumerate(classes)}
    paths, labels = [], []
    for c in classes:
        cdir = os.path.join(root, c)
        for dirpath, _, files in os.walk(cdir):
            for fn in sorted(files):
                if not fn.lower().endswith((".jpeg", ".jpg", ".png")):
                    continue
                paths.append(os.path.join(dirpath, fn))
                labels.append(class_to_idx[c])
    return ArrayDataset(_decode_files_to_array(paths, image_size),
                        np.asarray(labels), augment=augment)


def load_tiny_imagenet_val(root: str, image_size: int) -> ArrayDataset:
    """Raw Tiny-ImageNet val split: val/images/*.JPEG labelled by
    val_annotations.txt (tab-separated: filename, wnid, bbox...)."""
    train_dir = os.path.join(root, "train")
    classes = sorted(d for d in os.listdir(train_dir)
                     if os.path.isdir(os.path.join(train_dir, d)))
    class_to_idx = {c: i for i, c in enumerate(classes)}
    val_dir = os.path.join(root, "val")
    ann = {}
    with open(os.path.join(val_dir, "val_annotations.txt")) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                ann[parts[0]] = class_to_idx[parts[1]]
    paths, labels = [], []
    img_dir = os.path.join(val_dir, "images")
    for fn in sorted(os.listdir(img_dir)):
        if fn not in ann:
            continue
        paths.append(os.path.join(img_dir, fn))
        labels.append(ann[fn])
    return ArrayDataset(_decode_files_to_array(paths, image_size),
                        np.asarray(labels))


# --------------------------------------------------------------------------
# Streaming ImageFolder (ImageNet-scale: decode from disk, O(batch) memory)
# --------------------------------------------------------------------------

def rrc_box_from_draws(draws: np.ndarray, h: int, w: int) -> tuple[int, int, int, int]:
    """One torchvision RandomResizedCrop box (scale 0.08-1.0, ratio 3/4-4/3,
    10 tries then centre fallback) in original-image coordinates, computed
    from 40 pre-drawn uniforms (10 tries x {scale, log-ratio, y, x}).
    Mirrors runtime/eedata.cpp::rrc_box exactly so the native and PIL
    fallback pipelines produce identical crops from the same draws."""
    area = h * w
    lr_lo, lr_hi = np.log(3 / 4), np.log(4 / 3)
    # round half AWAY FROM ZERO (= C++ std::lround), NOT Python's banker's
    # rounding — backend-identical boxes require identical rounding
    rnd = lambda v: int(np.floor(v + 0.5))
    for t in range(10):
        target_area = (0.08 + float(draws[t * 4]) * 0.92) * area
        ratio = np.exp(lr_lo + float(draws[t * 4 + 1]) * (lr_hi - lr_lo))
        bw = rnd(np.sqrt(target_area * ratio))
        bh = rnd(np.sqrt(target_area / ratio))
        if 0 < bw <= w and 0 < bh <= h:
            by = int(float(draws[t * 4 + 2]) * (h - bh + 1))
            bx = int(float(draws[t * 4 + 3]) * (w - bw + 1))
            return by, bx, bh, bw
    s = min(h, w)
    return (h - s) // 2, (w - s) // 2, s, s


def _eval_center_box(h: int, w: int, resize_to: int = 256,
                     crop: int = 224) -> tuple[int, int, int, int]:
    """Resize(short=resize_to) + CenterCrop(crop) as ONE original-resolution
    box: a centred (crop/resize_to)*short square (reference eval transform,
    utils/data_loader.py:111-115; single resampling instead of two).
    Half-away-from-zero rounding matches the C++ lround twin."""
    s = min(h, w)
    side = max(1, int(np.floor(s * crop / float(resize_to) + 0.5)))
    return (h - side) // 2, (w - side) // 2, side, side


class StreamingImageFolder:
    """ImageFolder streamed from disk: only paths/labels live in memory; each
    batch is read + JPEG-decoded + cropped/resized on demand through the
    native runtime, with one background prefetch thread (the reference's
    DataLoader-worker role, utils/data_loader.py:98-120). Train mode applies
    RandomResizedCrop(image_size) + hflip FROM THE ORIGINAL RESOLUTION; eval
    mode applies Resize(256)+CenterCrop(224)-equivalent single-box resampling
    (or a plain full-image resize for non-ImageNet sizes)."""

    def __init__(self, root: str, image_size: int, train: bool,
                 class_to_idx: Optional[dict] = None,
                 eval_resize: Optional[int] = None,
                 eval_crop: Optional[int] = None,
                 train_mode: str = "rrc"):
        self.root = root
        self.image_size = int(image_size)
        self.train = train
        # 'rrc' = RandomResizedCrop+hflip (ImageNet train transform);
        # 'hflip' = plain resize + hflip (Tiny-ImageNet train transform,
        # utils/data_loader.py:66-71)
        self.train_mode = train_mode
        self.eval_resize, self.eval_crop = eval_resize, eval_crop
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        if class_to_idx is None:
            class_to_idx = {c: i for i, c in enumerate(classes)}
        self.class_to_idx = class_to_idx
        paths, labels = [], []
        for c in classes:
            cdir = os.path.join(root, c)
            for dirpath, _, files in os.walk(cdir):
                for fn in sorted(files):
                    if fn.lower().endswith((".jpeg", ".jpg", ".png")):
                        paths.append(os.path.join(dirpath, fn))
                        labels.append(class_to_idx[c])
        self.paths = np.asarray(paths)
        self.labels = np.asarray(labels, np.int32)

    def __len__(self):
        return len(self.paths)

    def _load_batch(self, take: np.ndarray, rng,
                    as_uint8: bool = False) -> tuple[np.ndarray, np.ndarray]:
        size = self.image_size
        n = len(take)
        paths = self.paths[take]
        # draw ALL randomness up front (numpy): the native and PIL paths
        # consume the same draws, so crops are backend-independent
        rrc = self.train and self.train_mode == "rrc"
        draws = rng.random((n, 40)).astype(np.float32) if rrc else None
        flips = (rng.random(n) < 0.5).astype(np.uint8) if self.train else None
        if rrc:
            mode = 1
        elif not self.train and self.eval_resize:
            mode = 2
        else:
            mode = 0
        fimgs = native.stream_decode_files(
            paths, mode, draws, self.eval_resize, self.eval_crop or size,
            size, size, flips,
            dtype=np.uint8 if as_uint8 else np.float32)
        if fimgs is not None:
            return fimgs, self.labels[take]
        # PIL fallback with identical draw consumption
        from PIL import Image
        imgs = np.empty((n, size, size, 3), np.uint8)
        for i, p in enumerate(paths):
            with Image.open(p) as im:
                im = im.convert("RGB")
                h, w = im.height, im.width
                if mode == 1:
                    by, bx, bh, bw = rrc_box_from_draws(draws[i], h, w)
                elif mode == 2:
                    by, bx, bh, bw = _eval_center_box(
                        h, w, self.eval_resize, self.eval_crop or size)
                else:
                    by, bx, bh, bw = 0, 0, h, w
                imgs[i] = np.asarray(
                    im.crop((bx, by, bx + bw, by + bh)).resize(
                        (size, size), Image.BILINEAR))
        if flips is not None:
            imgs = native.hflip(imgs, flips)
        if as_uint8:
            return imgs, self.labels[take]
        return imgs.astype(np.float32) / 255.0, self.labels[take]

    def batches(self, batch_size: int, *, shuffle: bool, seed: int,
                epoch: int = 0, drop_last: bool = True,
                process_index: int = 0, process_count: int = 1,
                as_uint8: bool = False
                ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Same contract as ArrayDataset.batches, streaming from disk with
        one batch of lookahead (prefetch thread)."""
        import threading

        n = len(self)
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        idx = rng.permutation(n) if shuffle else np.arange(n)
        if process_count > 1:
            # equal per-process batch counts (see ArrayDataset.batches)
            idx = idx[:n - (n % process_count)]
        idx = idx[process_index::process_count]
        stop = (len(idx) // batch_size) * batch_size if drop_last else len(idx)
        starts = list(range(0, stop, batch_size))
        if not starts:
            return

        slot = {}

        def produce(s, aug_rng):
            # exceptions are re-raised in the CONSUMER (a bare thread death
            # would otherwise surface as an unrelated KeyError below)
            try:
                slot[s] = self._load_batch(
                    idx[s:s + batch_size].astype(np.int64), aug_rng,
                    as_uint8=as_uint8)
            except BaseException as e:  # noqa: BLE001
                slot[s] = e

        # one aug rng per batch, deterministically derived
        rngs = {s: np.random.default_rng(
            np.random.SeedSequence([seed, epoch, 17, s])) for s in starts}
        t = threading.Thread(target=produce, args=(starts[0], rngs[starts[0]]))
        t.start()
        for i, s in enumerate(starts):
            t.join()
            if i + 1 < len(starts):
                nxt = starts[i + 1]
                t = threading.Thread(target=produce, args=(nxt, rngs[nxt]))
                t.start()
            item = slot.pop(s)
            if isinstance(item, BaseException):
                raise item
            yield item


# --------------------------------------------------------------------------
# Synthetic data (smoke tests / benchmarks without the real datasets)
# --------------------------------------------------------------------------

def synthetic_dataset(spec: DatasetSpec, n: int, seed: int = 0,
                      augment=None) -> ArrayDataset:
    """Class-conditional structured images (blobs + edges placed by label) so
    that training actually reduces loss and edge ops see real structure."""
    rng = np.random.default_rng(seed)
    h = spec.image_size
    imgs = np.zeros((n, h, h, spec.channels), np.uint8)
    labels = rng.integers(0, spec.num_classes, size=n).astype(np.int32)
    yy, xx = np.mgrid[0:h, 0:h]
    for i in range(n):
        lab = labels[i]
        cy = (lab * 7919 % (h - 8)) + 4
        cx = (lab * 104729 % (h - 8)) + 4
        r = 3 + lab % 5
        blob = ((np.abs(yy - cy) < r) & (np.abs(xx - cx) < r)).astype(np.float32)
        noise = rng.random((h, h)) * 0.3
        img = np.clip(blob * 0.7 + noise, 0, 1)
        for c in range(spec.channels):
            imgs[i, :, :, c] = (img * 255).astype(np.uint8)
    return ArrayDataset(imgs, labels, augment=augment)


def synthetic_hard_images(n: int, seed: int, h: int = 64,
                          num_label_classes: int = 200,
                          signal_classes: int = 10
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Non-saturating synthetic Tiny-ImageNet (`--data synthetic-hard`, and
    the digital twin's 'hard' task — tools/digital_twin_tiny.py): 10 of the
    200 labels carry a block signal whose per-sample contrast rides a
    continuum a ~ U(0.05, 0.50) ADDED over strong background noise
    U(0, 0.45), with +-6 px jitter and the class colour mixed 65/35 with a
    random distractor class colour. By construction the AT equilibrium at
    eps=16/255 lands mid-band: low-contrast samples are a Bayes floor
    (clean < 100), near-threshold ones are attackable (robust < clean),
    only the high-contrast tail is robust — the regime of the reference's
    headline 28.86/18.87 operating point.

    `num_label_classes` is informational only: labels are always drawn from
    the `signal_classes` signal vocabulary (the remaining label space stays
    empty by design, mirroring the reference model's fixed 200-way head);
    it exists to validate that the caller's label space can hold them."""
    if signal_classes > num_label_classes:
        raise ValueError(
            f"signal_classes={signal_classes} exceeds the caller's label "
            f"space num_label_classes={num_label_classes}")
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, signal_classes, n).astype(np.int64)
    g = h // 64 or 1
    centers = [((14 + 18 * (c // 4)) * h // 64, (12 + 13 * (c % 4)) * h // 64)
               for c in range(10)]
    colors = np.asarray(
        [(1.0, 0.3, 0.3), (0.3, 1.0, 0.3), (0.3, 0.3, 1.0),
         (1.0, 1.0, 0.3), (1.0, 0.3, 1.0), (0.3, 1.0, 1.0),
         (1.0, 0.7, 0.3), (0.7, 0.3, 1.0), (0.3, 0.7, 0.7),
         (0.9, 0.9, 0.9)], np.float32)
    blk = 24 * h // 64
    xs = rng.uniform(0.0, 0.45, (n, h, h, 3)).astype(np.float32)
    for i in range(n):
        c = int(ys[i])
        cy, cx = centers[c]
        cy += rng.integers(-6, 7) * g
        cx += rng.integers(-6, 7) * g
        y0, x0 = max(cy - blk // 2, 0), max(cx - blk // 2, 0)
        a = rng.uniform(0.05, 0.50)
        col = (0.65 * colors[c]
               + 0.35 * colors[(c + 1 + rng.integers(0, 9)) % 10])
        bh = min(h - y0, blk)
        bw = min(h - x0, blk)
        xs[i, y0:y0 + bh, x0:x0 + bw] = np.clip(
            xs[i, y0:y0 + bh, x0:x0 + bw] + a * col, 0.0, 1.0)
    return (xs * 255).astype(np.uint8), ys.astype(np.int32)


def synthetic_hard_dataset(spec: DatasetSpec, n: int, seed: int = 0
                           ) -> ArrayDataset:
    assert spec.channels == 3, "synthetic-hard is an RGB task"
    xs, ys = synthetic_hard_images(n, seed, h=spec.image_size,
                                   num_label_classes=spec.num_classes)
    return ArrayDataset(xs, ys)


def get_dataset(name: str, root: Optional[str], train: bool,
                synthetic_size: Optional[int] = None,
                image_size: Optional[int] = None
                ) -> tuple[ArrayDataset, DatasetSpec]:
    """`image_size` overrides the dataset's native size (the fast-AT
    progressive-resize phases use crops 128/224/288 via their `cize` key)."""
    spec = SPECS[name]
    if image_size and image_size != spec.image_size:
        spec = dataclasses.replace(spec, image_size=int(image_size))
    if root in (None, "synthetic"):
        n = synthetic_size or (512 if train else 256)
        return synthetic_dataset(spec, n, seed=0 if train else 1,
                                 augment=None), spec
    if root == "synthetic-hard":
        # full-scale dress-rehearsal data: TinyIN-sized non-saturating task
        n = synthetic_size or (100000 if train else 10000)
        return synthetic_hard_dataset(spec, n, seed=0 if train else 1), spec
    if name == "mnist":
        return load_mnist(root, train), spec
    if name == "cifar100":
        return load_cifar100(root, train), spec
    if name in ("tiny_imagenet", "imagenet"):
        sub = os.path.join(root, "train" if train else "val")
        if (not train and name == "tiny_imagenet"
                and os.path.exists(os.path.join(sub, "val_annotations.txt"))):
            # raw Tiny-ImageNet val layout (val/images + val_annotations.txt);
            # the reference requires manual restructuring into class dirs —
            # we read it directly, using the train split's class indexing.
            return load_tiny_imagenet_val(root, spec.image_size), spec
        # Streamed from disk with O(batch) memory + native JPEG decode:
        # TinyIN trains with hflip only; ImageNet with RandomResizedCrop +
        # hflip from ORIGINAL resolution and evals with the
        # Resize(256)+CenterCrop(224) protocol (utils/data_loader.py:66-71,
        # 104-115), scaled proportionally when fast-AT overrides the size.
        if name == "imagenet":
            if train:
                ds = StreamingImageFolder(sub, spec.image_size, train=True)
            else:
                ds = StreamingImageFolder(
                    sub, spec.image_size, train=False,
                    eval_resize=int(round(spec.image_size * 256 / 224)),
                    eval_crop=spec.image_size)
        else:
            ds = StreamingImageFolder(sub, spec.image_size, train=train,
                                      train_mode="hflip")
        return ds, spec
    raise ValueError(name)
