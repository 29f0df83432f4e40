"""Fused Pallas TPU kernel for the BPDA-3 Canny front-end (canny_step125).

One VMEM-resident pass per batch tile computes: per-channel Gaussian blur
(replication padding) -> channel-summed Sobel -> safe magnitude -> alpha
mask -> hard high-threshold. The custom VJP is a second fused kernel
implementing the exact adjoint: the To_compare STE mask, the alpha-mask
gate, d|g|/dg with the zero-at-zero convention, and the transposed
edge-padded stencils (interior shift + boundary fold).

Layout: the kernel works on (B, C, H, W) blocks — W on the 128-lane axis,
H on sublanes — so every shift is a cheap lane/sublane move; the NHWC<->NCHW
transposes at the boundary fuse into neighbouring ops. Numerics match the
jnp implementation in ops/canny.py bit-for-bit (golden-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filters import gaussian_kernel, sobel_kernel


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


def _shift_zero(x, dh: int, dw: int):
    """x[..., h+dh, w+dw] with zeros outside — used by the adjoint's
    interior term."""
    b, c, h, w = x.shape
    out = x
    if dh != 0:
        pad = jnp.zeros_like(out[:, :, :abs(dh), :])
        out = (jnp.concatenate([out[:, :, dh:, :], pad], axis=2) if dh > 0
               else jnp.concatenate([pad, out[:, :, :dh, :]], axis=2))
    if dw != 0:
        pad = jnp.zeros_like(out[:, :, :, :abs(dw)])
        out = (jnp.concatenate([out[:, :, :, dw:], pad], axis=3) if dw > 0
               else jnp.concatenate([pad, out[:, :, :, :dw]], axis=3))
    return out


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


def _fwd_kernel(x_ref, out_ref, mag_ref, gx_ref, gy_ref, *, g_taps, sx_taps,
                sy_taps, alpha, high, channels):
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


def _bwd_kernel(u_ref, mag_ref, gx_ref, gy_ref, dx_ref, *, g_taps, sx_taps,
                sy_taps, alpha, high, channels):
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


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _interpret() -> bool:
    """Pallas compiles only on TPU; fall back to interpret mode elsewhere
    (CPU tests / the virtual host-platform mesh)."""
    return jax.default_backend() != "tpu"



@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def canny_step125_fused(img, high_threshold: float, sigma: float = 1.0,
                        alpha: float = 0.0, batch_tile: int = 8):
    out, _, _, _ = _fused_fwd_impl(img, high_threshold, sigma, alpha, batch_tile)
    return out


def _fused_fwd_impl(img, high, sigma, alpha, batch_tile):
    b, h, w, c = img.shape
    x = jnp.transpose(img, (0, 3, 1, 2))             # (B, C, H, W)
    bt = min(batch_tile, b)
    grid = (pl.cdiv(b, bt),)
    g_taps = _stencil_taps(gaussian_kernel(3, 0.0, sigma))
    sob = sobel_kernel(3)
    sx_taps = _stencil_taps(sob)
    sy_taps = _stencil_taps(sob.T)

    kernel = functools.partial(_fwd_kernel, g_taps=g_taps, sx_taps=sx_taps,
                               sy_taps=sy_taps, alpha=alpha, high=high,
                               channels=c)
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


def _fused_fwd(img, high, sigma, alpha, batch_tile):
    out, mag, gx, gy = _fused_fwd_impl(img, high, sigma, alpha, batch_tile)
    return out, (mag, gx, gy, img.shape)


def _fused_bwd(high, sigma, alpha, batch_tile, res, u):
    mag, gx, gy, shape = res
    b, h, w, c = shape
    bt = min(batch_tile, b)
    grid = (pl.cdiv(b, bt),)
    g_taps = _stencil_taps(gaussian_kernel(3, 0.0, sigma))
    sob = sobel_kernel(3)
    kernel = functools.partial(_bwd_kernel, g_taps=g_taps,
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


canny_step125_fused.defvjp(_fused_fwd, _fused_bwd)
