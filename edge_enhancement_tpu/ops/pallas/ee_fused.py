"""Fully-fused Pallas TPU kernel pair for the EE defense front-end.

One VMEM-resident forward pass per batch tile computes the ENTIRE front-end
of the flagship models (reference resnet_EE_square.forward,
Tiny_ImageNet/models_tinyimagenet/resnet_EE_square.py + utils/core.py):

    xs   = add_square(x)                       (square variants; n_queries=1)
    hfs  = HighFreqSuppress(xs)                (separable-mask MXU sandwich)
    edge = CannyFilter_step125_1(x)            (blur -> sobel -> |g| -> STE)
    out  = clip(hfs + w * edge, 0, 1)

and the backward kernel is the HAND-DERIVED exact adjoint of that chain
under jax's own subgradient conventions (clip: 0.5 at exact boundaries;
min/max: 0.5 at ties — verified against jax.grad), including the
ball-projection paths through which gradient flows into x via the x±eps
bounds, the STE To_compare mask, the alpha gate, the zero-at-zero magnitude
rule, and the transposed edge-padded stencils. Residuals are just (x, y):
the cheap VPU chain is recomputed in the backward instead of spilling
mag/gx/gy to HBM (the round-1 forward-only kernel lost to XLA precisely on
that residual traffic).

The random square draws happen OUTSIDE the kernel with the exact
`add_square` key sequence (ops/square.add_square_draws), so fused and
unfused paths are RNG-identical. Layout: (B, C, H, W) blocks — W on lanes,
H on sublanes; shifts are lane/sublane moves, the HFS matmuls run on the
MXU with f32 accumulation and the same intermediate-dtype casts as the
jnp path (ops/hfs.py).

STATUS — measured NEGATIVE, kept opt-in as an experiment record
(docs/PERF.md "fused EE front-end"): both kernels in this module match
XLA's own fusion per-iteration; the custom_vjp boundary (layout
transposes, broken producer fusion, the y-residual) costs ~15% end to end
at TinyIN bs512 bf16 (10,656 vs 12,587 img/s), and the canny-only kernel
loses the same way. Enable with `fused_canny: true` / EEConfig.fused.
This file also hosts the standalone `canny_step125_fused` kernel pair
(formerly ops/pallas/canny_fused.py) — one module, one doc section, so
the two experiments don't live as parallel dead code paths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filters import gaussian_kernel, sobel_kernel
from ..hfs import _hfs_axis_operators
from ..square import add_square_draws


# --------------------------------------------------------------------------
# Shared stencil machinery (edge-replicated shifts and their exact adjoints)
# --------------------------------------------------------------------------

def _shift_edge(x, dh: int, dw: int):
    """x[..., clamp(h+dh), clamp(w+dw)] for a (B, C, H, W) array, with edge
    replication — the stencil read pattern for replication-padded conv."""
    if dh > 0:
        x = jnp.concatenate([x[:, :, dh:, :], x[:, :, -1:, :].repeat(dh, 2)], axis=2)
    elif dh < 0:
        x = jnp.concatenate([x[:, :, :1, :].repeat(-dh, 2), x[:, :, :dh, :]], axis=2)
    if dw > 0:
        x = jnp.concatenate([x[:, :, :, dw:], x[:, :, :, -1:].repeat(dw, 3)], axis=3)
    elif dw < 0:
        x = jnp.concatenate([x[:, :, :, :1].repeat(-dw, 3), x[:, :, :, :dw]], axis=3)
    return x


def _edge_shift_adjoint(u, dh: int, dw: int):
    """Adjoint of `_shift_edge(., dh, dw)`: scatter u back through the
    clamped read. Interior: u shifted by (-dh, -dw) with zero fill; boundary
    rows/cols additionally absorb the contributions that were clamped onto
    them. Per-axis adjoints compose (the 2-D clamp factorises)."""
    def axis_adjoint(v, d, axis):
        if d == 0:
            return v
        size = v.shape[axis]

        def take(sl):
            idx = [slice(None)] * v.ndim
            idx[axis] = sl
            return v[tuple(idx)]

        zero = jnp.zeros_like(take(slice(0, abs(d))))
        if d > 0:
            # reads came from h+d clamped at size-1: edge bin absorbs rows
            # size-d .. size-1 of u
            interior = jnp.concatenate([zero, take(slice(0, size - d))], axis=axis)
            edge_sum = jnp.sum(take(slice(size - d, size)), axis=axis, keepdims=True)
            mask_shape = [1] * v.ndim
            mask_shape[axis] = size
            idx = jax.lax.broadcasted_iota(jnp.int32, tuple(mask_shape), axis)
            return interior + jnp.where(idx == size - 1, edge_sum, 0.0)
        else:
            d = -d
            interior = jnp.concatenate([take(slice(d, size)), zero], axis=axis)
            edge_sum = jnp.sum(take(slice(0, d)), axis=axis, keepdims=True)
            mask_shape = [1] * v.ndim
            mask_shape[axis] = size
            idx = jax.lax.broadcasted_iota(jnp.int32, tuple(mask_shape), axis)
            return interior + jnp.where(idx == 0, edge_sum, 0.0)

    return axis_adjoint(axis_adjoint(u, dh, 2), dw, 3)


def _stencil_taps(kernel: np.ndarray):
    taps = []
    kh, kw = kernel.shape
    for i in range(kh):
        for j in range(kw):
            c = float(kernel[i, j])
            if c != 0.0:
                taps.append((i - kh // 2, j - kw // 2, c))
    return taps


def _apply_taps_edge(x, taps):
    out = None
    for dh, dw, c in taps:
        term = c * _shift_edge(x, dh, dw)
        out = term if out is None else out + term
    return out


def _apply_taps_adjoint(u, taps):
    out = None
    for dh, dw, c in taps:
        term = c * _edge_shift_adjoint(u, dh, dw)
        out = term if out is None else out + term
    return out


def _interpret() -> bool:
    """Pallas compiles only on TPU; fall back to interpret mode elsewhere
    (CPU tests / the virtual host-platform mesh)."""
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# Standalone fused canny_step125 kernel pair (experiment record; see module
# docstring STATUS)
# --------------------------------------------------------------------------

def _canny_fwd_kernel(x_ref, out_ref, mag_ref, gx_ref, gy_ref, *, g_taps,
                      sx_taps, sy_taps, alpha, high, channels):
    x = x_ref[:]                                     # (Bt, C, H, W)
    blurred = _apply_taps_edge(x, g_taps)
    summed = jnp.sum(blurred, axis=1, keepdims=True)  # (Bt, 1, H, W)
    gx = _apply_taps_edge(summed, sx_taps) / channels
    gy = _apply_taps_edge(summed, sy_taps) / channels
    v = gx * gx + gy * gy
    zero = v == 0.0
    mag = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, v)))
    mag_m = jnp.where(mag < alpha, 0.0, mag)
    out_ref[:] = (mag_m > high).astype(x.dtype)
    mag_ref[:] = mag
    gx_ref[:] = gx
    gy_ref[:] = gy


def _canny_bwd_kernel(u_ref, mag_ref, gx_ref, gy_ref, dx_ref, *, g_taps,
                      sx_taps, sy_taps, alpha, high, channels):
    u = u_ref[:]
    mag = mag_ref[:]
    gx = gx_ref[:]
    gy = gy_ref[:]
    mag_m = jnp.where(mag < alpha, 0.0, mag)
    # To_compare STE: grad where thin > high and thin <= 1.001
    keep = (mag_m > high) & (mag_m <= 1.001)
    # alpha mask gate: where(mag < alpha) routed to the zero branch
    u_mag = jnp.where(keep & (mag >= alpha), u, 0.0)
    inv_mag = jnp.where(mag == 0.0, 0.0, 1.0 / jnp.where(mag == 0.0, 1.0, mag))
    u_gx = u_mag * gx * inv_mag
    u_gy = u_mag * gy * inv_mag
    u_summed = (_apply_taps_adjoint(u_gx, sx_taps)
                + _apply_taps_adjoint(u_gy, sy_taps)) / channels
    u_blurred = jnp.broadcast_to(u_summed,
                                 (u.shape[0], channels) + u.shape[2:])
    dx_ref[:] = _apply_taps_adjoint(u_blurred, g_taps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def canny_step125_fused(img, high_threshold: float, sigma: float = 1.0,
                        alpha: float = 0.0, batch_tile: int = 8):
    """Fused Pallas kernel pair for canny_step125: one VMEM-resident pass
    (blur -> channel-summed sobel -> safe |g| -> alpha mask -> hard high
    threshold) plus the exact hand-derived adjoint (To_compare STE window,
    alpha gate, zero-at-zero d|g|/dg, transposed edge-padded stencils).
    Numerics match ops/canny.py bit-for-bit (golden-tested)."""
    out, _, _, _ = _canny_fused_fwd_impl(img, high_threshold, sigma, alpha,
                                         batch_tile)
    return out


def _canny_fused_fwd_impl(img, high, sigma, alpha, batch_tile):
    b, h, w, c = img.shape
    x = jnp.transpose(img, (0, 3, 1, 2))             # (B, C, H, W)
    bt = min(batch_tile, b)
    grid = (pl.cdiv(b, bt),)
    g_taps = _stencil_taps(gaussian_kernel(3, 0.0, sigma))
    sob = sobel_kernel(3)
    sx_taps = _stencil_taps(sob)
    sy_taps = _stencil_taps(sob.T)

    kernel = functools.partial(_canny_fwd_kernel, g_taps=g_taps,
                               sx_taps=sx_taps, sy_taps=sy_taps, alpha=alpha,
                               high=high, channels=c)
    spec_in = pl.BlockSpec((bt, c, h, w), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((bt, 1, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out, mag, gx, gy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_in],
        out_specs=(spec1, spec1, spec1, spec1),
        out_shape=tuple(jax.ShapeDtypeStruct((b, 1, h, w), img.dtype)
                        for _ in range(4)),
        interpret=_interpret(),
    )(x)
    return jnp.transpose(out, (0, 2, 3, 1)), mag, gx, gy


def _canny_fused_fwd(img, high, sigma, alpha, batch_tile):
    out, mag, gx, gy = _canny_fused_fwd_impl(img, high, sigma, alpha,
                                             batch_tile)
    return out, (mag, gx, gy, img.shape)


def _canny_fused_bwd(high, sigma, alpha, batch_tile, res, u):
    mag, gx, gy, shape = res
    b, h, w, c = shape
    bt = min(batch_tile, b)
    grid = (pl.cdiv(b, bt),)
    g_taps = _stencil_taps(gaussian_kernel(3, 0.0, sigma))
    sob = sobel_kernel(3)
    kernel = functools.partial(_canny_bwd_kernel, g_taps=g_taps,
                               sx_taps=_stencil_taps(sob),
                               sy_taps=_stencil_taps(sob.T),
                               alpha=alpha, high=high, channels=c)
    u_nchw = jnp.transpose(u, (0, 3, 1, 2))
    spec1 = pl.BlockSpec((bt, 1, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((bt, c, h, w), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec1, spec1, spec1, spec1],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), u.dtype),
        interpret=_interpret(),
    )(u_nchw, mag, gx, gy)
    return (jnp.transpose(dx, (0, 2, 3, 1)),)


canny_step125_fused.defvjp(_canny_fused_fwd, _canny_fused_bwd)


def _clip01(v):
    return jnp.clip(v, 0.0, 1.0)


def _f32(v):
    return v.astype(jnp.float32) if hasattr(v, "astype") else v


def _feq(a, b):
    """Comparisons run on f32 operands throughout this module: Mosaic on
    v5e rejects bf16 compares ("Target does not support this comparison")
    and the bf16->f32 cast is exact, so f32 compares are equivalent."""
    return _f32(a) == _f32(b)


def _fgt(a, b):
    return _f32(a) > _f32(b)


def _flt(a, b):
    return _f32(a) < _f32(b)


def _fge(a, b):
    return _f32(a) >= _f32(b)


def _fle(a, b):
    return _f32(a) <= _f32(b)


def _clip_mask(v):
    """d clip(v,0,1)/dv under jax's convention: 1 inside, 0.5 at an exact
    boundary, 0 outside."""
    inside = (_fgt(v, 0.0) & _flt(v, 1.0)).astype(v.dtype)
    edge = (_feq(v, 0.0) | _feq(v, 1.0)).astype(v.dtype)
    return inside + 0.5 * edge


def _max_masks(a, b):
    """(d max/d a, d max/d b) with the 0.5 tie split."""
    tie = _feq(a, b).astype(a.dtype)
    return (_fgt(a, b).astype(a.dtype) + 0.5 * tie,
            _fgt(b, a).astype(a.dtype) + 0.5 * tie)


def _min_masks(a, b):
    tie = _feq(a, b).astype(a.dtype)
    return (_flt(a, b).astype(a.dtype) + 0.5 * tie,
            _flt(b, a).astype(a.dtype) + 0.5 * tie)


def _square_forward(x, stripes, sq_delta, eps):
    """add_square (n_queries=1) on an NCHW block; returns xs."""
    t2 = _clip01(x + eps * stripes)
    t3 = t2 + sq_delta
    t5 = jnp.minimum(jnp.maximum(t3, x - eps), x + eps)
    return _clip01(t5)


def _square_backward(u_xs, x, stripes, sq_delta, eps):
    """Adjoint of `_square_forward` w.r.t. x (stripes/delta are constants).
    Gradient reaches x through BOTH the perturbation chain and the
    projection bounds x±eps (the reference differentiates through the
    clamps; ops/square.py docstring)."""
    t1 = x + eps * stripes
    t2 = _clip01(t1)
    t3 = t2 + sq_delta
    xl, xh = x - eps, x + eps
    t4 = jnp.maximum(t3, xl)
    t5 = jnp.minimum(t4, xh)
    u_t5 = u_xs * _clip_mask(t5)
    d_t4, d_xh = _min_masks(t4, xh)
    u_t4 = u_t5 * d_t4
    d_t3, d_xl = _max_masks(t3, xl)
    u_t1 = u_t4 * d_t3 * _clip_mask(t1)
    return u_t1 + u_t5 * d_xh + u_t4 * d_xl


def _bmm(lhs, rhs):
    """Standard batched matmul (b,m,k)x(b,k,n) — the only 3-D dot_general
    form Mosaic lowers natively (middle-dim contractions without batch dims
    fail with 'unsupported shape cast')."""
    return jax.lax.dot_general(lhs, rhs, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _hfs_sandwich(xs2, a_mat, b_mat, dtype):
    """A @ X @ B^T per leading index, mirroring ops/hfs.py's einsum order
    (A-contraction first) and its intermediate cast to the compute dtype.
    xs2: (N, H, W); returns (N, A, B)."""
    n = xs2.shape[0]
    a_b = jnp.broadcast_to(a_mat[None], (n,) + a_mat.shape)
    bt_b = jnp.broadcast_to(b_mat.T[None], (n,) + b_mat.T.shape)
    t = _bmm(a_b, xs2).astype(dtype)                 # (N, A, W)
    return _bmm(t, bt_b)                             # (N, A, B) f32


def _hfs_sandwich_adjoint(u2, a_mat, b_mat, dtype):
    """Adjoint of `_hfs_sandwich` w.r.t. X, mirroring the jnp chain's vjp
    dtype casts. u2: (N, A, B) in `dtype`; returns (N, H, W) f32."""
    n = u2.shape[0]
    b_b = jnp.broadcast_to(b_mat[None], (n,) + b_mat.shape)
    at_b = jnp.broadcast_to(a_mat.T[None], (n,) + a_mat.T.shape)
    dt = _bmm(u2, b_b).astype(dtype)                 # (N, A, W)
    return _bmm(at_b, dt)                            # (N, H, W) f32


def _canny125_forward(x, g_taps, sx_taps, sy_taps, alpha, high, channels):
    """blur -> channel-summed sobel -> safe |g| -> alpha mask -> hard
    threshold, on an NCHW block (ops/canny.py::canny_step125)."""
    blurred = _apply_taps_edge(x, g_taps)
    summed = jnp.sum(blurred, axis=1, keepdims=True)
    # magnitude chain in f32: this target's Mosaic path rejects bf16 EUP
    # ops (sqrt/divide) — XLA's own bf16 lowering upcasts the same way
    gxf = _f32(_apply_taps_edge(summed, sx_taps)) / channels
    gyf = _f32(_apply_taps_edge(summed, sy_taps)) / channels
    v = gxf * gxf + gyf * gyf
    zero = v == 0.0
    mag = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, v)))
    mag_m = jnp.where(mag < alpha, 0.0, mag)
    edge = (mag_m > high).astype(x.dtype)
    return edge, mag, gxf, gyf


def _canny125_backward(u_edge, mag, gx, gy, g_taps, sx_taps, sy_taps,
                       alpha, high, channels):
    # mag/gx/gy arrive as f32 (see _canny125_forward); run the whole
    # adjoint in f32 and cast at the caller
    mag_m = jnp.where(mag < alpha, 0.0, mag)
    keep = (mag_m > high) & (mag_m <= 1.001)      # To_compare STE window
    u_mag = jnp.where(keep & (mag >= alpha), _f32(u_edge), 0.0)
    mag_zero = mag == 0.0
    inv_mag = jnp.where(mag_zero, 0.0,
                        1.0 / jnp.where(mag_zero, 1.0, mag))
    u_gx = u_mag * gx * inv_mag
    u_gy = u_mag * gy * inv_mag
    u_summed = (_apply_taps_adjoint(u_gx, sx_taps)
                + _apply_taps_adjoint(u_gy, sy_taps)) / channels
    u_blurred = jnp.broadcast_to(
        u_summed, (u_summed.shape[0], channels) + u_summed.shape[2:])
    return _apply_taps_adjoint(u_blurred, g_taps)


def _fwd_kernel(x_ref, stripes_ref, sqd_ref, ar_ref, ai_ref, br_ref, bi_ref,
                out_ref, y_ref, *, g_taps, sx_taps, sy_taps, eps, w, alpha,
                high, channels, square):
    x = x_ref[:]                                         # (Bt, C, H, W)
    bt, c, h, wdim = x.shape
    xs = (_square_forward(x, stripes_ref[:], sqd_ref[:], eps)
          if square else x)
    xs2 = xs.reshape(bt * c, h, wdim)
    hfs = (_hfs_sandwich(xs2, ar_ref[:], br_ref[:], x.dtype)
           - _hfs_sandwich(xs2, ai_ref[:], bi_ref[:], x.dtype))
    hfs = hfs.astype(x.dtype).reshape(bt, c, h, wdim)
    edge, _, _, _ = _canny125_forward(x, g_taps, sx_taps, sy_taps,
                                      alpha, high, channels)
    y = hfs + jnp.asarray(w, x.dtype) * edge             # edge bcast over C
    out_ref[:] = _clip01(y)
    y_ref[:] = y


def _bwd_kernel(u_ref, x_ref, stripes_ref, sqd_ref, y_ref, ar_ref, ai_ref,
                br_ref, bi_ref, dx_ref, *, g_taps, sx_taps, sy_taps, eps, w,
                alpha, high, channels, square):
    u = u_ref[:]
    x = x_ref[:]
    y = y_ref[:]
    bt, c, h, wdim = x.shape
    u_y = u * _clip_mask(y)                              # x.dtype

    # HFS branch -> d xs -> through the square chain -> dx
    u2 = u_y.reshape(bt * c, h, wdim)
    dxs = (_hfs_sandwich_adjoint(u2, ar_ref[:], br_ref[:], x.dtype)
           - _hfs_sandwich_adjoint(u2, ai_ref[:], bi_ref[:], x.dtype))
    dxs = dxs.astype(x.dtype).reshape(bt, c, h, wdim)
    dx_hfs = (_square_backward(dxs, x, stripes_ref[:], sqd_ref[:], eps)
              if square else dxs)

    # Canny branch (VPU chain recomputed — cheaper than spilling residuals)
    _, mag, gx, gy = _canny125_forward(x, g_taps, sx_taps, sy_taps,
                                       alpha, high, channels)
    u_edge = jnp.asarray(w, x.dtype) * jnp.sum(u_y, axis=1, keepdims=True)
    dx_canny = _canny125_backward(u_edge, mag, gx, gy, g_taps, sx_taps,
                                  sy_taps, alpha, high, channels)
    dx_ref[:] = (dx_hfs + dx_canny).astype(x.dtype)


def _taps(sigma):
    sob = sobel_kernel(3)
    return (_stencil_taps(gaussian_kernel(3, 0.0, sigma)),
            _stencil_taps(sob), _stencil_taps(sob.T))


def _specs(bt, c, h, w, square):
    img = pl.BlockSpec((bt, c, h, w), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    if square:
        stripes = pl.BlockSpec((bt, c, 1, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        stripes = pl.BlockSpec((1, 1, 1, 1), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    sqd = pl.BlockSpec((1, c, h, w), lambda i: (0, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    mat_h = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_w = pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return img, stripes, sqd, mat_h, mat_w


# nondiff: r, eps, w, alpha, high, sigma, batch_tile, square
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _ee_fused(x, stripes, sq_delta, r: int, eps: float, w: float,
              alpha: float, high: float, sigma: float, batch_tile: int,
              square: bool):
    out, _ = _ee_fused_fwd_impl(x, stripes, sq_delta, r, eps, w, alpha,
                                high, sigma, batch_tile, square)
    return out


def _ee_fused_fwd_impl(x, stripes, sq_delta, r, eps, w, alpha, high, sigma,
                       batch_tile, square):
    b, h, wdim, c = x.shape
    xn = jnp.transpose(x, (0, 3, 1, 2))                 # (B, C, H, W)
    stripes_n = stripes.astype(x.dtype)
    sqd_n = sq_delta.astype(x.dtype)
    ar, ai, br, bi = (jnp.asarray(m, x.dtype)
                      for m in _hfs_axis_operators(h, wdim, r))
    g_taps, sx_taps, sy_taps = _taps(sigma)
    bt = min(batch_tile, b)
    img, st_spec, sqd_spec, mat_h, mat_w = _specs(bt, c, h, wdim, square)
    kernel = functools.partial(_fwd_kernel, g_taps=g_taps, sx_taps=sx_taps,
                               sy_taps=sy_taps, eps=eps, w=w, alpha=alpha,
                               high=high, channels=c, square=square)
    out, y = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(b, bt),),
        in_specs=[img, st_spec, sqd_spec, mat_h, mat_h, mat_w, mat_w],
        out_specs=(img, img),
        out_shape=(jax.ShapeDtypeStruct((b, c, h, wdim), x.dtype),
                   jax.ShapeDtypeStruct((b, c, h, wdim), x.dtype)),
        interpret=_interpret(),
    )(xn, stripes_n, sqd_n, ar, ai, br, bi)
    return jnp.transpose(out, (0, 2, 3, 1)), (xn, stripes_n, sqd_n, y)


def _ee_fused_fwd(x, stripes, sq_delta, r, eps, w, alpha, high, sigma,
                  batch_tile, square):
    out, res = _ee_fused_fwd_impl(x, stripes, sq_delta, r, eps, w, alpha,
                                  high, sigma, batch_tile, square)
    return out, res


def _ee_fused_bwd(r, eps, w, alpha, high, sigma, batch_tile, square, res, u):
    xn, stripes_n, sqd_n, y = res
    b, c, h, wdim = xn.shape
    dtype = xn.dtype
    ar, ai, br, bi = (jnp.asarray(m, dtype)
                      for m in _hfs_axis_operators(h, wdim, r))
    g_taps, sx_taps, sy_taps = _taps(sigma)
    bt = min(batch_tile, b)
    img, st_spec, sqd_spec, mat_h, mat_w = _specs(bt, c, h, wdim, square)
    kernel = functools.partial(_bwd_kernel, g_taps=g_taps, sx_taps=sx_taps,
                               sy_taps=sy_taps, eps=eps, w=w, alpha=alpha,
                               high=high, channels=c, square=square)
    u_n = jnp.transpose(u, (0, 3, 1, 2)).astype(dtype)
    dx = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(b, bt),),
        in_specs=[img, img, st_spec, sqd_spec, img, mat_h, mat_h, mat_w,
                  mat_w],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((b, c, h, wdim), dtype),
        interpret=_interpret(),
    )(u_n, xn, stripes_n, sqd_n, y, ar, ai, br, bi)
    # stripes/sq_delta are random constants w.r.t. the attack gradient
    return (jnp.transpose(dx, (0, 2, 3, 1)),
            jnp.zeros(stripes_n.shape, dtype),
            jnp.zeros(sqd_n.shape, dtype))


_ee_fused.defvjp(_ee_fused_fwd, _ee_fused_bwd)


def ee_frontend_fused(x: jnp.ndarray, cfg, square_key: Optional[jax.Array],
                      batch_tile: int = 8) -> jnp.ndarray:
    """Drop-in fused replacement for `ee_frontend` (square / plain variants
    with the step125 canny). The caller guards applicability: only invoke
    for type_canny == 'CannyFilter_step125_1', with_gf == False, no
    edge_map."""
    b, h, w, c = x.shape
    if cfg.square:
        if square_key is None:
            raise ValueError("square=True requires a PRNG key")
        stripes4, sq_mask, ch_sign = add_square_draws(
            square_key, x.shape, epsilon=cfg.epsilon,
            n_queries=cfg.n_queries)
        # kernel layout: stripes (B, C, 1, W); additive square (1, C, H, W).
        # Cast to x.dtype HERE so the custom_vjp primal/cotangent dtypes line
        # up (the kernel computes in x.dtype anyway).
        stripes = jnp.transpose(stripes4, (0, 3, 1, 2)).astype(x.dtype)
        sq_delta = (2.0 * cfg.epsilon
                    * jnp.transpose(ch_sign, (0, 3, 1, 2))
                    * sq_mask[None, None, :, :]).astype(x.dtype)
    else:
        stripes = jnp.zeros((1, 1, 1, 1), x.dtype)
        sq_delta = jnp.zeros((1, c, h, w), x.dtype)
    return _ee_fused(x, stripes, sq_delta, int(cfg.r), float(cfg.epsilon),
                     float(cfg.w), float(cfg.alpha), float(cfg.high_scaled),
                     float(cfg.sigma), batch_tile, bool(cfg.square))
