"""Data-layer tests: real-format loaders (idx/pickle/ImageFolder) against
tiny generated fixtures, batch iteration invariants, host sharding, native
runtime parity."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from edge_enhancement_tpu.data import native
from edge_enhancement_tpu.data.datasets import (ArrayDataset, cifar_augment,
                                                get_dataset, load_cifar100,
                                                load_image_folder, load_mnist,
                                                synthetic_dataset, SPECS)


def write_idx_images(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


class TestMnistLoader:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (10, 28, 28), dtype=np.uint8)
        labels = rng.integers(0, 10, (10,), dtype=np.uint8)
        write_idx_images(tmp_path / "train-images-idx3-ubyte", imgs)
        write_idx_images(tmp_path / "train-labels-idx1-ubyte", labels)
        ds = load_mnist(str(tmp_path), train=True)
        assert len(ds) == 10
        x, y = next(ds.batches(4, shuffle=False, seed=0))
        assert x.shape == (4, 28, 28, 1) and x.dtype == np.float32
        np.testing.assert_allclose(x[0, :, :, 0], imgs[0] / 255.0)
        np.testing.assert_array_equal(y, labels[:4])

    def test_gzip_variant(self, tmp_path):
        imgs = np.zeros((4, 28, 28), np.uint8)
        labels = np.arange(4, dtype=np.uint8)
        for name, arr in [("t10k-images-idx3-ubyte", imgs),
                          ("t10k-labels-idx1-ubyte", labels)]:
            raw_path = tmp_path / name
            write_idx_images(raw_path, arr)
            with open(raw_path, "rb") as f_in, gzip.open(str(raw_path) + ".gz", "wb") as f_out:
                f_out.write(f_in.read())
            os.unlink(raw_path)
        ds = load_mnist(str(tmp_path), train=False)
        assert len(ds) == 4


class TestCifarLoader:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, (6, 3 * 32 * 32), dtype=np.uint8)
        labels = list(rng.integers(0, 100, 6))
        d = {b"data": data, b"fine_labels": labels}
        base = tmp_path / "cifar-100-python"
        base.mkdir()
        with open(base / "test", "wb") as f:
            pickle.dump(d, f)
        ds = load_cifar100(str(tmp_path), train=False)
        x, y = next(ds.batches(3, shuffle=False, seed=0))
        assert x.shape == (3, 32, 32, 3)
        # CHW -> HWC conversion check
        np.testing.assert_allclose(
            x[0, 0, 0], data[0].reshape(3, 32, 32)[:, 0, 0] / 255.0)


class TestImageFolder:
    def test_roundtrip(self, tmp_path):
        from PIL import Image
        for cls in ("n01", "n02"):
            d = tmp_path / cls / "images"
            d.mkdir(parents=True)
            for i in range(3):
                arr = np.full((64, 64, 3), 40 * i, np.uint8)
                Image.fromarray(arr).save(d / f"{cls}_{i}.JPEG")
        ds = load_image_folder(str(tmp_path), 64)
        assert len(ds) == 6
        x, y = next(ds.batches(6, shuffle=False, seed=0))
        assert x.shape == (6, 64, 64, 3)
        assert set(np.unique(y)) == {0, 1}


class TestBatching:
    def test_shuffle_determinism_and_epoch_variation(self):
        ds = synthetic_dataset(SPECS["mnist"], 64)
        b1 = [y.tolist() for _, y in ds.batches(16, shuffle=True, seed=5, epoch=0)]
        b2 = [y.tolist() for _, y in ds.batches(16, shuffle=True, seed=5, epoch=0)]
        b3 = [y.tolist() for _, y in ds.batches(16, shuffle=True, seed=5, epoch=1)]
        assert b1 == b2
        assert b1 != b3

    def test_process_sharding_partitions(self):
        ds = synthetic_dataset(SPECS["mnist"], 64)
        all_idx = []
        for p in range(4):
            for x, y in ds.batches(8, shuffle=True, seed=3,
                                   process_index=p, process_count=4):
                all_idx.extend(y.tolist())
        # 4 processes x 16 samples each = full pass, disjoint shards
        assert len(all_idx) == 64

    def test_drop_last(self):
        ds = synthetic_dataset(SPECS["mnist"], 30)
        n = sum(1 for _ in ds.batches(16, shuffle=False, seed=0, drop_last=True))
        assert n == 1
        n = sum(1 for _ in ds.batches(16, shuffle=False, seed=0, drop_last=False))
        assert n == 2


class TestNativeRuntime:
    def test_available_and_parity(self):
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
        idx = np.arange(8, dtype=np.int64)[::-1].copy()
        got = native.gather_to_float(imgs, idx)
        np.testing.assert_allclose(got, imgs[idx].astype(np.float32) / 255)

    def test_cifar_augment_shape_and_range(self):
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
        out = cifar_augment(imgs.copy(), rng)
        assert out.shape == imgs.shape and out.dtype == np.uint8


class TestTinyImagenetRawVal:
    def test_raw_val_layout(self, tmp_path):
        from PIL import Image
        from edge_enhancement_tpu.data.datasets import get_dataset
        # train split with class dirs (defines the indexing)
        for cls in ("n100", "n200"):
            d = tmp_path / "train" / cls / "images"
            d.mkdir(parents=True)
            Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(d / "x.JPEG")
        # raw val layout
        vd = tmp_path / "val" / "images"
        vd.mkdir(parents=True)
        for i, cls in enumerate(["n200", "n100", "n200"]):
            Image.fromarray(np.full((64, 64, 3), 10 * i, np.uint8)).save(
                vd / f"val_{i}.JPEG")
        with open(tmp_path / "val" / "val_annotations.txt", "w") as f:
            f.write("val_0.JPEG\tn200\t0 0 1 1\n")
            f.write("val_1.JPEG\tn100\t0 0 1 1\n")
            f.write("val_2.JPEG\tn200\t0 0 1 1\n")
        ds, _ = get_dataset("tiny_imagenet", str(tmp_path), train=False)
        x, y = next(ds.batches(3, shuffle=False, seed=0))
        assert x.shape == (3, 64, 64, 3)
        np.testing.assert_array_equal(y, [1, 0, 1])  # n100=0, n200=1


def _make_image_folder(tmp_path, n_classes=2, per_class=8, size=(72, 96)):
    from PIL import Image
    rng = np.random.default_rng(0)
    for ci in range(n_classes):
        d = tmp_path / f"n{ci:03d}"
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.integers(0, 256, size + (3,), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.JPEG", quality=92)


class TestStreamingImageFolder:
    def test_train_stream_shapes_and_determinism(self, tmp_path):
        from edge_enhancement_tpu.data.datasets import StreamingImageFolder
        _make_image_folder(tmp_path)
        ds = StreamingImageFolder(str(tmp_path), 64, train=True)
        assert len(ds) == 16
        batches1 = list(ds.batches(4, shuffle=True, seed=3, epoch=0))
        batches2 = list(ds.batches(4, shuffle=True, seed=3, epoch=0))
        assert len(batches1) == 4
        for (x1, y1), (x2, y2) in zip(batches1, batches2):
            assert x1.shape == (4, 64, 64, 3) and x1.dtype == np.float32
            assert 0.0 <= x1.min() and x1.max() <= 1.0
            np.testing.assert_array_equal(x1, x2)   # fully deterministic
            np.testing.assert_array_equal(y1, y2)
        # different epoch -> different order/augmentation
        b3 = list(ds.batches(4, shuffle=True, seed=3, epoch=1))
        assert not np.array_equal(batches1[0][0], b3[0][0])

    def test_as_uint8_stream_matches_float(self, tmp_path):
        from edge_enhancement_tpu.data.datasets import StreamingImageFolder
        _make_image_folder(tmp_path)
        ds = StreamingImageFolder(str(tmp_path), 48, train=True)
        xf, yf = next(ds.batches(4, shuffle=True, seed=2, epoch=0))
        xu, yu = next(ds.batches(4, shuffle=True, seed=2, epoch=0,
                                 as_uint8=True))
        assert xu.dtype == np.uint8 and xf.dtype == np.float32
        np.testing.assert_array_equal(yf, yu)
        # same draws -> same crops; uint8 is the pre-conversion pixels
        np.testing.assert_allclose(xu.astype(np.float32) / 255.0, xf,
                                   atol=1e-6)

    def test_process_sharding_disjoint(self, tmp_path):
        from edge_enhancement_tpu.data.datasets import StreamingImageFolder
        _make_image_folder(tmp_path)
        ds = StreamingImageFolder(str(tmp_path), 32, train=False)
        seen = []
        for p in range(2):
            for x, y in ds.batches(4, shuffle=True, seed=1,
                                   process_index=p, process_count=2):
                seen.extend(x.reshape(len(x), -1).sum(1).tolist())
        assert len(seen) == 16 and len(set(np.round(seen, 4))) == 16

    def test_eval_protocol_matches_pil_resize_crop(self, tmp_path):
        """Eval boxes reproduce Resize(256)+CenterCrop(224) (as one resample)
        — cross-checked against the explicit PIL two-step transform."""
        from PIL import Image
        from edge_enhancement_tpu.data.datasets import StreamingImageFolder
        rng = np.random.default_rng(7)
        d = tmp_path / "n000"
        d.mkdir(parents=True)
        yy, xx = np.mgrid[0:300, 0:400]
        smooth = np.stack([(yy * 255 / 300), (xx * 255 / 400),
                           ((yy + xx) * 255 / 700)], -1).astype(np.uint8)
        Image.fromarray(smooth).save(d / "a.JPEG", quality=96)
        ds = StreamingImageFolder(str(tmp_path), 224, train=False,
                                  eval_resize=256, eval_crop=224)
        x, _ = next(ds.batches(1, shuffle=False, seed=0))
        with Image.open(d / "a.JPEG") as im:
            im = im.convert("RGB")
            scale = 256 / min(im.size)
            im2 = im.resize((round(im.width * scale), round(im.height * scale)),
                            Image.BILINEAR)
            left = (im2.width - 224) // 2
            top = (im2.height - 224) // 2
            ref = np.asarray(im2.crop((left, top, left + 224, top + 224)),
                             np.float32) / 255.0
        # one resampling step vs two: small smooth-image deviation allowed
        assert np.abs(x[0] - ref).mean() < 0.02

    def test_get_dataset_imagenet_routes_to_streaming(self, tmp_path):
        from edge_enhancement_tpu.data.datasets import (StreamingImageFolder,
                                                        get_dataset)
        (tmp_path / "train").mkdir()
        (tmp_path / "val").mkdir()
        _make_image_folder(tmp_path / "train", per_class=2)
        _make_image_folder(tmp_path / "val", per_class=2)
        tr, spec = get_dataset("imagenet", str(tmp_path), train=True,
                               image_size=64)
        ev, _ = get_dataset("imagenet", str(tmp_path), train=False,
                            image_size=64)
        assert isinstance(tr, StreamingImageFolder)
        assert isinstance(ev, StreamingImageFolder)
        assert ev.eval_resize == int(round(64 * 256 / 224))
        x, y = next(tr.batches(2, shuffle=True, seed=0))
        assert x.shape == (2, 64, 64, 3)


class TestImageFolderNativeDecode:
    def test_folder_loader_matches_pil(self, tmp_path):
        """load_image_folder's native batch-decode path agrees with a direct
        PIL decode (IFAST vs ISLOW IDCT allows tiny per-pixel deviation; at
        the shipped 64x64 size the resize itself is an exact identity)."""
        from PIL import Image
        from edge_enhancement_tpu.data.datasets import load_image_folder
        _make_image_folder(tmp_path, n_classes=2, per_class=3, size=(64, 64))
        ds = load_image_folder(str(tmp_path), 64)
        assert ds.images.shape == (6, 64, 64, 3)
        paths = sorted(tmp_path.glob("*/*.JPEG"))
        refs = np.stack([np.asarray(Image.open(p).convert("RGB"), np.uint8)
                         for p in paths])
        diff = np.abs(ds.images.astype(int) - refs.astype(int))
        # random-noise JPEGs are the IDCT worst case: measured mean ~1.25,
        # max 6 at quality 92; natural images sit well under this
        assert diff.mean() < 2.0 and diff.max() <= 8

    def test_png_falls_back_to_pil(self, tmp_path):
        from PIL import Image
        from edge_enhancement_tpu.data.datasets import load_image_folder
        d = tmp_path / "n000"
        d.mkdir(parents=True)
        arr = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
        Image.fromarray(arr).save(d / "a.png")
        ds = load_image_folder(str(tmp_path), 64)
        np.testing.assert_array_equal(ds.images[0], arr)  # png decode is exact


class TestJpegDecodeAPI:
    def test_dims_and_explicit_box_decode(self, tmp_path):
        """The lower-level decode API (explicit boxes, bytes in): dims from
        the header, crop-box decode parity between the native and PIL
        backends on a smooth image."""
        from PIL import Image
        yy, xx = np.mgrid[0:90, 0:120]
        img = np.stack([yy * 2, xx * 2, yy + xx], -1).astype(np.uint8)
        p = tmp_path / "a.JPEG"
        Image.fromarray(img).save(p, quality=95)
        data = p.read_bytes()
        assert native.jpeg_dims(data) == (90, 120)
        boxes = np.asarray([[5, 10, 60, 80]], np.int32)
        got = native.decode_jpeg_batch([data], boxes, 48, 48)
        with Image.open(p) as im:
            ref = np.asarray(im.convert("RGB").crop((10, 5, 90, 65))
                             .resize((48, 48), Image.BILINEAR))
        assert got.shape == (1, 48, 48, 3)
        assert np.abs(got[0].astype(int) - ref.astype(int)).mean() < 3.0


class TestRandomResizedCrop:
    def test_shape_range_and_variation(self):
        from edge_enhancement_tpu.data.datasets import random_resized_crop_augment
        rng = np.random.default_rng(5)
        imgs = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
        out = random_resized_crop_augment(imgs.copy(), rng)
        assert out.shape == imgs.shape and out.dtype == np.uint8
        # crops differ per sample and from the originals (w.h.p.)
        assert not np.array_equal(out, imgs)


class TestSyntheticHard:
    """Property tests for the non-saturating twin/dress-rehearsal dataset
    (synthetic_hard_images): determinism, label vocabulary, the background
    noise level, and the per-sample contrast continuum that puts the AT
    equilibrium mid-band (docs/TWIN.md)."""

    def test_deterministic_and_typed(self):
        from edge_enhancement_tpu.data.datasets import synthetic_hard_images
        xa, ya = synthetic_hard_images(64, seed=7)
        xb, yb = synthetic_hard_images(64, seed=7)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
        xc, _ = synthetic_hard_images(64, seed=8)
        assert not np.array_equal(xa, xc)
        assert xa.shape == (64, 64, 64, 3) and xa.dtype == np.uint8
        assert ya.dtype == np.int32
        assert set(np.unique(ya)) <= set(range(10))

    def test_label_space_guard(self):
        from edge_enhancement_tpu.data.datasets import synthetic_hard_images
        with pytest.raises(ValueError):
            synthetic_hard_images(8, seed=0, num_label_classes=5)

    def test_background_noise_and_contrast_continuum(self):
        from edge_enhancement_tpu.data.datasets import synthetic_hard_images
        xs, ys = synthetic_hard_images(200, seed=3)
        f = xs.astype(np.float32) / 255.0
        # class-0 center is (14, 12); the far corner is background-only for
        # every class: noise ~ U(0, 0.45) -> mean ~0.225
        bg = f[:, 48:, :24].mean()
        assert 0.15 < bg < 0.30, bg
        # per-sample signal strength = brightness of the label's block
        # neighbourhood minus background; a ~ U(0.05, 0.50) must give BOTH
        # near-floor samples (unclassifiable) and strong ones (robust tail)
        centers = [(14 + 18 * (c // 4), 12 + 13 * (c % 4)) for c in range(10)]
        lift = []
        for i in range(200):
            cy, cx = centers[ys[i]]
            y0, x0 = max(cy - 6, 0), max(cx - 6, 0)
            lift.append(f[i, y0:y0 + 12, x0:x0 + 12].mean() - bg)
        lift = np.asarray(lift)
        assert (lift < 0.10).any(), lift.min()   # Bayes-floor tail exists
        assert (lift > 0.25).any(), lift.max()   # robust tail exists
        assert lift.std() > 0.05                 # a continuum, not two modes
