"""Independent numpy re-implementations of the edge-op semantics, used as
golden references in tests. Written from the reference's *behaviour* (NCHW
torch code, see SURVEY.md section 2.1), not from its code: plain loops and
scipy-free numpy, trading speed for obvious correctness.
"""

import math

import numpy as np


def np_gaussian(k=3, mu=0.0, sigma=1.0):
    line = np.linspace(-1, 1, k)
    x, y = np.meshgrid(line, line)
    d = np.sqrt(x ** 2 + y ** 2)
    g = np.exp(-((d - mu) ** 2) / (2 * sigma ** 2)) / (2 * np.pi * sigma ** 2)
    return g / g.sum()


def np_sobel(k=3):
    line = np.linspace(-(k // 2), k // 2, k)
    x, y = np.meshgrid(line, line)
    den = x ** 2 + y ** 2
    den[:, k // 2] = 1
    return x / den


def conv2d_same(img, kernel, pad="edge"):
    """Single-channel 2-D cross-correlation with 'same' size. img: (H, W)."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    mode = "edge" if pad == "edge" else "constant"
    p = np.pad(img, ((ph, ph), (pw, pw)), mode=mode)
    h, w = img.shape
    out = np.zeros_like(img, dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kernel[i, j] * p[i:i + h, j:j + w]
    return out


def np_hfs_mask(h, w, r):
    mask = np.zeros((h, w), np.float64)
    ch, cw = h // 2, w // 2
    dh = r if h % 2 == 0 else r + 1
    dw = r if w % 2 == 0 else r + 1
    mask[max(ch - r, 0):ch + dh, max(cw - r, 0):cw + dw] = 1.0
    mask = np.roll(mask, -ch, axis=0)
    mask = np.roll(mask, -cw, axis=1)
    return mask


def np_hfs(img_hw, r):
    """Low-pass one (H, W) channel: Re(ifft2(fft2(x) * mask))."""
    h, w = img_hw.shape
    return np.real(np.fft.ifft2(np.fft.fft2(img_hw) * np_hfs_mask(h, w, r)))


DIRECTION_OFFSETS = [(0, 1), (-1, 1), (-1, 0), (-1, -1),
                     (0, -1), (1, -1), (1, 0), (1, 1)]


def np_canny_stages(img_hwc, sigma=1.0, alpha=0.0):
    """Return (blurred, gx, gy, magnitude, positive_idx, thin_after_nms)
    for an (H, W, C) image, float64."""
    h, w, c = img_hwc.shape
    blurred = np.stack(
        [conv2d_same(img_hwc[..., ch], np_gaussian(3, 0.0, sigma), "edge")
         for ch in range(c)], axis=-1)
    sob = np_sobel(3)
    gx = sum(conv2d_same(blurred[..., ch], sob, "edge") for ch in range(c)) / c
    gy = sum(conv2d_same(blurred[..., ch], sob.T, "edge") for ch in range(c)) / c
    mag = np.sqrt(gx ** 2 + gy ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        orient = np.arctan(gy / gx)
    deg = orient * (360.0 / math.pi) + 180.0
    pos_idx = np.mod(np.round(deg / 45.0), 8.0)

    mag_masked = np.where(mag < alpha, 0.0, mag)

    directional = []
    for dr, dc in DIRECTION_OFFSETS:
        padded = np.pad(mag_masked, 1, mode="constant")
        directional.append(mag_masked - padded[1 + dr:1 + dr + h, 1 + dc:1 + dc + w])

    thin = mag_masked.copy()
    for pos_i in range(4):
        neg_i = pos_i + 4
        oriented = (pos_idx == pos_i) | (pos_idx == neg_i)
        is_max = np.minimum(directional[pos_i], directional[neg_i]) > 0.0
        thin[(~is_max) & oriented] = 0.0
    return blurred, gx, gy, mag_masked, pos_idx, thin


def np_canny_full(img_hwc, low, high, hysteresis=True, sigma=1.0, alpha=0.0):
    _, _, _, _, _, thin = np_canny_stages(img_hwc, sigma, alpha)

    def safe_sign(v):
        s = np.sign(v)
        s[s == 0] = -1
        return s

    low_m = (safe_sign(thin - low) + 1) / 2
    high_m = (safe_sign(thin - high) + 1) / 2
    out = 0.5 * low_m + 0.5 * high_m
    if hysteresis:
        weak = (out == 0.5).astype(np.float64)
        votes = conv2d_same(out, np.full((3, 3), 1.25), pad="zero")
        weak_is_high = (votes > 1.0).astype(np.float64) * weak
        out = high_m + weak_is_high
    return out


def np_canny_step125(img_hwc, high, sigma=1.0, alpha=0.0):
    h, w, c = img_hwc.shape
    blurred = np.stack(
        [conv2d_same(img_hwc[..., ch], np_gaussian(3, 0.0, sigma), "edge")
         for ch in range(c)], axis=-1)
    sob = np_sobel(3)
    gx = sum(conv2d_same(blurred[..., ch], sob, "edge") for ch in range(c)) / c
    gy = sum(conv2d_same(blurred[..., ch], sob.T, "edge") for ch in range(c)) / c
    mag = np.sqrt(gx ** 2 + gy ** 2)
    mag = np.where(mag < alpha, 0.0, mag)
    return (mag > high).astype(np.float64)
