"""Channels-on-contraction Pallas GEMM-conv for 64-channel 3x3 layers.

WHY: XLA's NHWC conv lowering puts channels on the 128-wide lane axis of
both GEMM operands. Every 64-channel conv (the TinyIN/R50 stem output and
all of layer1 — ~45% of model FLOPs at 64x64 input) therefore caps at ~50%
MXU utilization twice over: contraction depth C_in=64 AND output lanes
C_out=64 (docs/PERF.md "structural ceilings"). This kernel transposes the
problem instead of the hardware: activations live as (C, B*H*W) with the
huge batch*spatial axis on lanes, output channels on the streamed sublane
axis, and the contraction runs over C_in x taps — tap-PAIRED to K=128 so
the systolic array is full:

    out[co, n] = sum_p  W_pair[co, 128] @ [x_shift(t0); x_shift(t1)][128, n]

Shifts are lane rolls of the flattened (h*W + w) axis; zero-padding is an
iota mask (int32 compares — Mosaic on this v5e rejects bf16 compares, see
ops/pallas/ee_fused.py). Blocks are whole images (lane offset multiples of
H*W), so roll wrap-around only crosses image boundaries at positions the
pad masks already zero.

Reference workload: resnet layer1 3x3 convs
(/root/reference/Tiny_ImageNet/models_tinyimagenet/resnet.py:36,
conv3x3 64->64), profiled at ~29-50% MXU in docs/PERF.md. Benchmarked by
tools/bench_gemm_conv.py against XLA's native lowering INCLUDING the
NHWC<->CHW boundary transposes, so the comparison charges this kernel its
full integration cost.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ee_fused import _interpret


def _tap_pairs(kh: int, kw: int):
    taps = [(dh, dw) for dh in range(kh) for dw in range(kw)]
    pairs = [tuple(taps[i:i + 2]) for i in range(0, len(taps), 2)]
    return taps, pairs


def _kernel(x_ref, w_ref, o_ref, *, H, W, kh, kw, cin, cout):
    """x_ref: (cin, nblk) bf16 in image-major flat (h*W+w) lane order;
    w_ref: (cout, cin*kh*kw) with contraction laid out tap-major
    (t*cin + ci); o_ref: (cout, nblk)."""
    x = x_ref[:]
    n = x.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    hh = (pos // W) % H
    ww = pos % W
    ph, pw = kh // 2, kw // 2

    def shifted(dh, dw):
        # read x[., h+dh-ph, w+dw-pw] with zero pad; the lane roll wraps
        # only across whole-image boundaries, which the mask zeroes anyway
        oh, ow = dh - ph, dw - pw
        s = oh * W + ow
        xs = jnp.roll(x, -s, axis=1) if s != 0 else x
        valid = ((hh + oh >= 0) & (hh + oh < H)
                 & (ww + ow >= 0) & (ww + ow < W))
        return jnp.where(valid, xs, jnp.zeros_like(xs))

    taps, pairs = _tap_pairs(kh, kw)
    acc = jnp.zeros((cout, n), jnp.float32)
    for pair in pairs:
        blocks = [shifted(dh, dw) for dh, dw in pair]
        stacked = (jnp.concatenate(blocks, axis=0) if len(blocks) > 1
                   else blocks[0])
        k0 = taps.index(pair[0]) * cin
        wp = w_ref[:, k0:k0 + cin * len(blocks)]
        acc = acc + jax.lax.dot_general(
            wp, stacked, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def conv_cgemm_flat(x_flat: jnp.ndarray, w_flat: jnp.ndarray, *, H: int,
                    W: int, kh: int = 3, kw: int = 3,
                    images_per_block: int = 8) -> jnp.ndarray:
    """SAME conv on channel-major flattened activations.

    x_flat: (C_in, B*H*W) — image-major, row-major (h*W + w) within image.
    w_flat: (C_out, kh*kw*C_in) — contraction tap-major (t*C_in + ci).
    Returns (C_out, B*H*W) in x_flat.dtype.
    """
    cin, ntot = x_flat.shape
    cout = w_flat.shape[0]
    hw = H * W
    if ntot % hw:
        raise ValueError(
            f"x_flat lane dim {ntot} is not a multiple of H*W={hw}; "
            "conv_cgemm_flat needs whole images on the lane axis")
    b = ntot // hw
    ib = min(images_per_block, b)
    while b % ib:
        ib -= 1
    if ib < min(images_per_block, b):
        # a non-divisible batch decays the block size, shrinking the lane
        # tile (and the kernel's perf premise for small H*W) — surface it
        warnings.warn(
            f"conv_cgemm_flat: batch {b} not divisible by "
            f"images_per_block={images_per_block}; using {ib} images per "
            f"block (lane tile {ib * hw})", stacklevel=2)
    nblk = ib * hw
    grid = (b // ib,)
    kernel = functools.partial(_kernel, H=H, W=W, kh=kh, kw=kw, cin=cin,
                               cout=cout)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((cin, nblk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cout, kh * kw * cin), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cout, nblk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, ntot), x_flat.dtype),
        interpret=_interpret(),
    )(x_flat, w_flat)


def pack_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(kh, kw, C_in, C_out) HWIO -> (C_out, kh*kw*C_in) tap-major."""
    kh, kw, cin, cout = w_hwio.shape
    return jnp.transpose(w_hwio, (3, 0, 1, 2)).reshape(cout, kh * kw * cin)


def conv_cgemm_nhwc(x: jnp.ndarray, w_hwio: jnp.ndarray,
                    images_per_block: int = 8) -> jnp.ndarray:
    """Drop-in SAME 3x3 stride-1 conv on NHWC input: transposes to the
    channel-major layout, runs the kernel, transposes back. The boundary
    transposes are part of the op (and of its benchmark)."""
    b, h, wdim, cin = x.shape
    cout = w_hwio.shape[3]
    x_flat = jnp.transpose(x, (3, 0, 1, 2)).reshape(cin, b * h * wdim)
    o_flat = conv_cgemm_flat(x_flat, pack_weights(w_hwio).astype(x.dtype),
                             H=h, W=wdim,
                             images_per_block=images_per_block)
    return jnp.transpose(o_flat.reshape(cout, b, h, wdim), (1, 2, 3, 0))


# ---------------------------------------------------------------------------
# Training path: custom VJP. dgrad is the SAME kernel with rotated weights
# (stride-1 SAME 3x3: dx = conv(dy, rot180(W) with I/O swapped) — the dgrad
# is exactly the fwd-shaped problem, so it inherits the full-contraction
# layout win). wgrad stays on XLA's native lowering: its GEMM contracts over
# batch*spatial (huge K), which the native lowering already tiles well.
# ---------------------------------------------------------------------------

def _dgrad_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(w_hwio[::-1, ::-1], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_cgemm(x: jnp.ndarray, w_hwio: jnp.ndarray,
                  images_per_block: int = 8) -> jnp.ndarray:
    """Differentiable SAME 3x3 stride-1 conv (NHWC x HWIO -> NHWC) on the
    channels-on-contraction kernel."""
    return conv_cgemm_nhwc(x, w_hwio, images_per_block)


def _cgemm_fwd(x, w_hwio, images_per_block):
    return conv_cgemm_nhwc(x, w_hwio, images_per_block), (x, w_hwio)


def _cgemm_bwd(images_per_block, res, dy):
    x, w_hwio = res
    dx = conv_cgemm_nhwc(dy, _dgrad_weights(w_hwio), images_per_block)
    # native wgrad: differentiate the equivalent XLA conv w.r.t. weights
    _, wgrad = jax.vjp(
        lambda wk: jax.lax.conv_general_dilated(
            x, wk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dy.dtype),
        w_hwio)
    return dx, wgrad(dy)[0]


conv3x3_cgemm.defvjp(_cgemm_fwd, _cgemm_bwd)
