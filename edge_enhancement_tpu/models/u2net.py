"""U2-Net salient-edge detectors (full + small) and the fixed Sobel module.

Parity target: reference utils/u2net.py — RSU7..RSU4 recursive U-blocks
(conv+BN+ReLU with dilation, ceil-mode 2x2 maxpools, bilinear upsampling to
the skip's size), RSU4F (dilation pyramid, no pooling), six side outputs
upsampled to full resolution, a 1x1 fusion conv, sigmoid outputs.
U2NET(3,1) returns all seven sigmoid maps (u2net.py:425-431); U2NETP(3,1)
returns only the fused map (u2net.py:534-538). `Sobel` is the fixed-kernel
gradient magnitude (u2net.py:541-555).

The RSU-L blocks share one parameterised implementation (the reference
spells out RSU7/6/5/4 separately; they differ only in depth).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.stencil import stencil2d


class REBNConv(nn.Module):
    out_ch: int
    dirate: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), padding=self.dirate,
                    kernel_dilation=(self.dirate, self.dirate))(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x)


def _pool_ceil(x):
    """2x2 stride-2 max pool with ceil_mode=True (pad odd dims on the high side)."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        pad = [(0, 0), (0, ph), (0, pw), (0, 0)]
        x = jax.lax.pad(x, jnp.asarray(-jnp.inf, x.dtype),
                        [(lo, hi, 0) for lo, hi in pad])
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample_like(src, tar):
    """Bilinear resize src to tar's spatial dims (reference F.upsample)."""
    b, _, _, c = src.shape
    return jax.image.resize(src, (b, tar.shape[1], tar.shape[2], c),
                            method="bilinear")


class RSU(nn.Module):
    """RSU-L block: L encoder convs (pools between), one dilated bottom conv,
    L-1 decoder convs with skip concats, residual add of the input conv."""
    levels: int            # 7 for RSU7 ... 4 for RSU4
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNConv(self.out_ch)(x, train)
        enc = []
        hx = hxin
        for i in range(self.levels - 1):
            hx = REBNConv(self.mid_ch)(hx, train)
            enc.append(hx)
            if i < self.levels - 2:
                hx = _pool_ceil(hx)
        bottom = REBNConv(self.mid_ch, dirate=2)(enc[-1], train)

        hx = bottom
        for i in range(self.levels - 2, 0, -1):
            hx = REBNConv(self.mid_ch)(jnp.concatenate([hx, enc[i]], -1), train)
            hx = _upsample_like(hx, enc[i - 1])
        hx = REBNConv(self.out_ch)(jnp.concatenate([hx, enc[0]], -1), train)
        return hx + hxin


class RSU4F(nn.Module):
    """Dilation-pyramid RSU (no pooling): rates 1,2,4 encode, 8 bottom,
    4,2,1 decode."""
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNConv(self.out_ch)(x, train)
        hx1 = REBNConv(self.mid_ch, dirate=1)(hxin, train)
        hx2 = REBNConv(self.mid_ch, dirate=2)(hx1, train)
        hx3 = REBNConv(self.mid_ch, dirate=4)(hx2, train)
        hx4 = REBNConv(self.mid_ch, dirate=8)(hx3, train)
        hx3d = REBNConv(self.mid_ch, dirate=4)(jnp.concatenate([hx4, hx3], -1), train)
        hx2d = REBNConv(self.mid_ch, dirate=2)(jnp.concatenate([hx3d, hx2], -1), train)
        hx1d = REBNConv(self.out_ch, dirate=1)(jnp.concatenate([hx2d, hx1], -1), train)
        return hx1d + hxin


class U2Net(nn.Module):
    """U2NET (full=True, u2net.py:329-431) or U2NETP (full=False, :435-538)."""
    full: bool = False
    out_ch: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.full:
            stages = [RSU(7, 32, 64), RSU(6, 32, 128), RSU(5, 64, 256),
                      RSU(4, 128, 512), RSU4F(256, 512), RSU4F(256, 512)]
            dstages = [RSU4F(256, 512), RSU(4, 128, 256), RSU(5, 64, 128),
                       RSU(6, 32, 64), RSU(7, 16, 64)]
        else:
            stages = [RSU(7, 16, 64), RSU(6, 16, 64), RSU(5, 16, 64),
                      RSU(4, 16, 64), RSU4F(16, 64), RSU4F(16, 64)]
            dstages = [RSU4F(16, 64), RSU(4, 16, 64), RSU(5, 16, 64),
                       RSU(6, 16, 64), RSU(7, 16, 64)]

        # encoder
        encs = []
        hx = x
        for i, st in enumerate(stages):
            hx = st(hx, train)
            encs.append(hx)
            if i < 5:
                hx = _pool_ceil(hx)
        hx6 = encs[5]

        # decoder
        hxd = [None] * 5  # hx5d..hx1d
        up = _upsample_like(hx6, encs[4])
        cur = up
        decs = []
        for i, dst in enumerate(dstages):
            enc_skip = encs[4 - i]
            cur = dst(jnp.concatenate([cur, enc_skip], -1), train)
            decs.append(cur)
            if i < 4:
                cur = _upsample_like(cur, encs[3 - i])

        hx5d, hx4d, hx3d, hx2d, hx1d = decs

        side = partial(nn.Conv, self.out_ch, (3, 3), padding=1)
        d1 = side()(hx1d)
        sides = [d1]
        for hmap in (hx2d, hx3d, hx4d, hx5d, hx6):
            sides.append(_upsample_like(side()(hmap), d1))
        d0 = nn.Conv(self.out_ch, (1, 1))(jnp.concatenate(sides, -1))

        if self.full:
            return tuple(jax.nn.sigmoid(d) for d in [d0] + sides)
        return jax.nn.sigmoid(d0)


def u2net_full() -> U2Net:
    return U2Net(full=True)


def u2net_small() -> U2Net:
    return U2Net(full=False)


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)


def sobel_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    """Fixed-kernel Sobel gradient magnitude on a single-channel NHWC batch
    (reference Sobel module, utils/u2net.py:541-555; zero padding)."""
    v = stencil2d(img, _SOBEL_X, pad_mode="zero")
    h = stencil2d(img, _SOBEL_Y, pad_mode="zero")
    return jnp.sqrt(v ** 2 + h ** 2)
