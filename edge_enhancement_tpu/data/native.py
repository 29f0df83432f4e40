"""ctypes bindings for the native data runtime (runtime/libeedata.so).

Auto-builds on first import if the shared library is missing and a compiler
is available; every entry point has a pure-numpy fallback, so the framework
works without the native library (just slower on the host path).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")


def _build_runtime() -> bool:
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ee_runtime_build", os.path.join(_RUNTIME_DIR, "build.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.build(verbose=False)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_RUNTIME_DIR, "libeedata.so")
    src = os.path.join(_RUNTIME_DIR, "eedata.cpp")
    # (re)build when missing OR stale (an .so from an older source revision
    # may lack newer symbols — binding them below would raise)
    stale = (not os.path.exists(so)
             or (os.path.exists(src)
                 and os.path.getmtime(so) < os.path.getmtime(src)))
    if stale and not _build_runtime():
        return None
    try:
        lib = ctypes.CDLL(so)
        if not hasattr(lib, "ee_stream_decode_files"):
            # stale binary despite mtimes: rebuild once and reload (dlopen
            # may cache the old handle in-process; verify before binding)
            if not _build_runtime():
                return None
            lib = ctypes.CDLL(so)
            if not hasattr(lib, "ee_stream_decode_files"):
                return None
    except OSError:
        return None

    i64 = ctypes.c_int64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.ee_gather_to_float.argtypes = [u8p, i64p, i64, i64, f32p]
    lib.ee_gather_u8.argtypes = [u8p, i64p, i64, i64, u8p]
    lib.ee_hflip.argtypes = [u8p, i64, i64, i64, i64, u8p]
    lib.ee_pad_crop.argtypes = [u8p, u8p, i64, i64, i64, i64, i64, i32p, i32p]
    lib.ee_rotate_bilinear.argtypes = [u8p, u8p, i64, i64, i64, i64, f32p]
    lib.ee_resize_bilinear.argtypes = [u8p, u8p, i64, i64, i64, i64,
                                       i32p, i32p, i32p, i32p, i64, i64]
    lib.ee_num_threads.restype = ctypes.c_int
    lib.ee_has_jpeg.restype = ctypes.c_int
    lib.ee_jpeg_dims.argtypes = [u8p, i64, ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int32)]
    lib.ee_jpeg_dims.restype = ctypes.c_int
    lib.ee_decode_jpeg_batch.argtypes = [u8p, i64p, i64p, i64, i32p, i64,
                                         i64, u8p]
    lib.ee_decode_jpeg_batch.restype = ctypes.c_int
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.ee_stream_decode_files.argtypes = [
        ctypes.c_char_p, i64p, i64, ctypes.c_int32,
        ctypes.c_void_p,                 # draws (float*, may be NULL)
        ctypes.c_int32, ctypes.c_int32, i64, i64,
        ctypes.c_void_p,                 # out u8 (may be NULL)
        ctypes.c_void_p,                 # out f32 (may be NULL)
        ctypes.c_void_p]                 # flip flags (uint8*, may be NULL)
    lib.ee_stream_decode_files.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def gather_to_float(images: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """images (N, ...) uint8, idx int64 -> float32 [0,1] batch."""
    lib = _load()
    sample_elems = int(np.prod(images.shape[1:]))
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        return images[idx].astype(np.float32) / 255.0
    out = np.empty((len(idx),) + images.shape[1:], np.float32)
    lib.ee_gather_to_float(images.reshape(len(images), -1), idx, len(idx),
                           sample_elems, out.reshape(len(idx), -1))
    return out


def gather_u8(images: np.ndarray, idx: np.ndarray) -> np.ndarray:
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        return images[idx].copy()
    out = np.empty((len(idx),) + images.shape[1:], np.uint8)
    lib.ee_gather_u8(images.reshape(len(images), -1), idx, len(idx),
                     int(np.prod(images.shape[1:])), out.reshape(len(idx), -1))
    return out


def hflip(imgs: np.ndarray, flags: np.ndarray) -> np.ndarray:
    """In-place conditional hflip; returns imgs."""
    lib = _load()
    flags = np.ascontiguousarray(flags.astype(np.uint8))
    if lib is None:
        sel = flags.astype(bool)
        imgs[sel] = imgs[sel, :, ::-1]
        return imgs
    n, h, w, c = imgs.shape
    lib.ee_hflip(imgs, n, h, w, c, flags)
    return imgs


def pad_crop(imgs: np.ndarray, pad: int, oy: np.ndarray, ox: np.ndarray) -> np.ndarray:
    lib = _load()
    n, h, w, c = imgs.shape
    oy = np.ascontiguousarray(oy, np.int32)
    ox = np.ascontiguousarray(ox, np.int32)
    if lib is None:
        padded = np.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = np.empty_like(imgs)
        for i in range(n):
            out[i] = padded[i, oy[i]:oy[i] + h, ox[i]:ox[i] + w]
        return out
    out = np.empty_like(imgs)
    lib.ee_pad_crop(imgs, out, n, h, w, c, pad, oy, ox)
    return out


def rotate(imgs: np.ndarray, angles: np.ndarray) -> np.ndarray:
    lib = _load()
    n, h, w, c = imgs.shape
    angles = np.ascontiguousarray(angles, np.float32)
    if lib is None:
        try:
            import scipy.ndimage as ndi
            out = np.empty_like(imgs)
            for i in range(n):
                out[i] = ndi.rotate(imgs[i], angles[i], reshape=False, order=1)
            return out
        except ImportError:
            return imgs.copy()
    out = np.empty_like(imgs)
    lib.ee_rotate_bilinear(imgs, out, n, h, w, c, angles)
    return out


def has_jpeg() -> bool:
    lib = _load()
    return bool(lib is not None and lib.ee_has_jpeg())


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """JPEG (h, w) from the header only. Falls back to PIL."""
    lib = _load()
    arr = np.frombuffer(data, np.uint8)
    if lib is not None and lib.ee_has_jpeg():
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        if lib.ee_jpeg_dims(arr, len(arr), ctypes.byref(h),
                            ctypes.byref(w)) == 0:
            return int(h.value), int(w.value)
    import io
    from PIL import Image
    with Image.open(io.BytesIO(data)) as im:
        return im.height, im.width


def decode_jpeg_batch(datas: list, boxes: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Decode JPEG byte strings, crop boxes (by, bx, bh, bw in ORIGINAL
    coordinates; bh <= 0 means the full image), bilinear-resize to (oh, ow)
    RGB. Uses the native libjpeg kernel (DCT-scaled decode) when available,
    PIL otherwise."""
    lib = _load()
    n = len(datas)
    boxes = np.ascontiguousarray(boxes, np.int32).reshape(n, 4)
    out = np.empty((n, oh, ow, 3), np.uint8)
    if lib is not None and lib.ee_has_jpeg():
        lens = np.asarray([len(d) for d in datas], np.int64)
        offsets = np.zeros(n, np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        blob = np.frombuffer(b"".join(datas), np.uint8)
        fails = lib.ee_decode_jpeg_batch(blob, offsets, lens, n,
                                         boxes.ravel(), oh, ow,
                                         out.reshape(n, -1))
        if fails == 0:
            return out
    import io
    from PIL import Image
    for i, d in enumerate(datas):
        with Image.open(io.BytesIO(d)) as im:
            im = im.convert("RGB")
            by, bx, bh, bw = (int(v) for v in boxes[i])
            if bh <= 0 or bw <= 0:
                by, bx, bh, bw = 0, 0, im.height, im.width
            out[i] = np.asarray(
                im.crop((bx, by, bx + bw, by + bh)).resize(
                    (ow, oh), Image.BILINEAR))
    return out


def stream_decode_files(paths, mode: int, draws, eval_resize: int,
                        eval_crop: int, oh: int, ow: int, flip_flags,
                        dtype=np.uint8) -> Optional[np.ndarray]:
    """One-call streaming batch: read + JPEG decode + crop/resize (+hflip)
    (+float conversion) entirely in the native runtime. mode 0=full,
    1=RRC(draws n x 40), 2=eval centre box. dtype float32 scales to [0,1].
    Returns None when the native path is unavailable or any file failed
    (caller falls back to PIL)."""
    lib = _load()
    if lib is None or not lib.ee_has_jpeg():
        return None
    n = len(paths)
    enc = [os.fsencode(p) + b"\0" for p in paths]
    offsets = np.zeros(n, np.int64)
    lens = np.asarray([len(e) for e in enc], np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    blob = b"".join(enc)
    out = np.empty((n, oh, ow, 3), dtype)
    out_p = out.ctypes.data_as(ctypes.c_void_p)
    u8_p, f32_p = (out_p, None) if dtype == np.uint8 else (None, out_p)
    draws_p = None
    if draws is not None:
        draws = np.ascontiguousarray(draws, np.float32)
        draws_p = draws.ctypes.data_as(ctypes.c_void_p)
    flags_p = None
    if flip_flags is not None:
        flip_flags = np.ascontiguousarray(flip_flags, np.uint8)
        flags_p = flip_flags.ctypes.data_as(ctypes.c_void_p)
    fails = lib.ee_stream_decode_files(
        blob, offsets, n, int(mode), draws_p, int(eval_resize or 0),
        int(eval_crop or 0), oh, ow, u8_p, f32_p, flags_p)
    return out if fails == 0 else None


def resize_crops(imgs: np.ndarray, boxes: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """boxes (N, 4) int32 rows (by, bx, bh, bw) -> (N, oh, ow, C)."""
    lib = _load()
    n, sh, sw, c = imgs.shape
    boxes = np.ascontiguousarray(boxes, np.int32)
    by, bx, bh, bw = (np.ascontiguousarray(boxes[:, k]) for k in range(4))
    out = np.empty((n, oh, ow, c), np.uint8)
    if lib is None:
        from PIL import Image
        for i in range(n):
            im = Image.fromarray(imgs[i].squeeze() if c == 1 else imgs[i])
            box = (int(bx[i]), int(by[i]), int(bx[i] + bw[i]), int(by[i] + bh[i]))
            r = np.asarray(im.crop(box).resize((ow, oh), Image.BILINEAR))
            out[i] = r[..., None] if c == 1 else r
        return out
    lib.ee_resize_bilinear(imgs, out, n, sh, sw, c, by, bx, bh, bw, oh, ow)
    return out
