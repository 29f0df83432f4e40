"""Differentiable Canny edge filters (three variants), TPU-native.

Parity targets (reference utils/core.py):
  * `canny`         — CannyFilter (:148-326): Gaussian blur (replication pad)
                      -> channel-summed Sobel -> magnitude/orientation ->
                      alpha mask -> 8-direction non-max suppression ->
                      STE double threshold (BinaryConnect) -> optional
                      hysteresis (gradient flows only through `high`).
  * `canny_bpda`    — CannyFilter_BPDA (:386-505): every non-differentiable
                      step replaced by an STE (To_compare / To_eq), NMS via
                      multiply, no alpha mask.
  * `canny_step125` — CannyFilter_step125_1 (:509-585): blur -> sobel ->
                      magnitude -> alpha mask -> single high-threshold STE.

TPU design notes: all convs are 3x3 fixed-kernel stencils executed as fused
VPU shift/multiply-adds (see stencil.py) — no MXU, no gather. The NMS loop
over 4 orientations is unrolled at trace time into pure elementwise selects,
so the whole pipeline compiles to a handful of fused elementwise passes over
the image. Layout NHWC; edge maps come back as (B, H, W, 1).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .filters import direction_offsets, gaussian_kernel, hysteresis_kernel, sobel_kernel
from .stencil import shift2d, stencil2d
from .ste import binary_connect, to_compare, to_eq

_DEG_PER_RAD = 360.0 / math.pi  # reference converts with 360/pi (utils/core.py:259)


def _safe_magnitude(grad_x: jnp.ndarray, grad_y: jnp.ndarray) -> jnp.ndarray:
    """sqrt(gx^2 + gy^2) with a ZERO gradient at exactly-zero magnitude.

    Deliberate deviation from the reference: torch's `(gx**2+gy**2)**0.5`
    back-propagates NaN wherever gx == gy == 0 exactly (d sqrt(v)/dv -> inf at
    v=0, times a zero cotangent = NaN) — verified against the reference ops on
    CPU; the reference only survives because random attack init makes exact
    zeros measure-zero. We zero the gradient on that measure-zero set instead
    (the standard double-where trick), matching torch everywhere torch is
    finite and staying NaN-free on constant image regions.
    """
    v = grad_x * grad_x + grad_y * grad_y
    is_zero = v == 0.0
    safe_v = jnp.where(is_zero, 1.0, v)
    return jnp.where(is_zero, 0.0, jnp.sqrt(safe_v))


def _blur_sobel_magnitude(img: jnp.ndarray, sigma: float):
    """Shared front: per-channel Gaussian blur, channel-summed Sobel, magnitude.

    Matches utils/core.py:231-258. The reference convolves the C-channel
    blurred image with a Sobel kernel repeated over channels (a channel sum);
    since padding and channel-sum commute, we sum channels first and run the
    Sobel stencil on a single channel.
    """
    c = img.shape[-1]
    blurred = stencil2d(img, gaussian_kernel(3, 0.0, sigma), pad_mode="edge")
    summed = jnp.sum(blurred, axis=-1, keepdims=True)
    sob = sobel_kernel(3)
    grad_x = stencil2d(summed, sob, pad_mode="edge") / c
    grad_y = stencil2d(summed, sob.T, pad_mode="edge") / c
    magnitude = _safe_magnitude(grad_x, grad_y)
    return blurred, grad_x, grad_y, magnitude


def _nms(magnitude: jnp.ndarray, grad_x: jnp.ndarray, grad_y: jnp.ndarray) -> jnp.ndarray:
    """8-direction non-maximum suppression (utils/core.py:258-290).

    The reference computes atan(gy/gx) (note: atan, not atan2 — IEEE rules
    give +/-pi/2 for gx==0 and NaN for 0/0, NaN compares false everywhere),
    quantises to 45-degree bins, and zeroes pixels that are not a local max
    along their gradient direction. The directional convs are shift
    differences: directional_i = mag - mag_shifted(offset_i).

    Knife-edge caveat (measure-zero): the `> 0.0` test is STRICT in both
    implementations, so an EXACT magnitude tie across an edge (only ideal
    synthetic steps produce one — e.g. a binary axis-aligned square)
    suppresses both pixels. On such inputs torch's conv accumulation order
    leaves a 1-ULP asymmetry (1.451863 vs 1.451862 measured) that keeps one
    column by rounding luck, where our channel-sum-first ordering computes
    the exact tie. Any realistic input (noise, attack perturbations, real
    images) breaks the tie identically on both sides — elementwise forward
    agreement on non-degenerate inputs is pinned by test_parity_torch.py.
    """
    # The orientation only feeds equality comparisons (non-differentiable in
    # the reference too); stop_gradient keeps the 0/0 division's NaN out of
    # the backward graph. IEEE forward semantics match torch: gx==0 gives
    # +/-pi/2, 0/0 gives NaN which compares false in every bin.
    orientation = jax.lax.stop_gradient(jnp.arctan(grad_y / grad_x))
    degrees = orientation * _DEG_PER_RAD + 180.0
    positive_idx = jnp.mod(jnp.round(degrees / 45.0), 8.0)

    offsets = direction_offsets()
    directional = [magnitude - shift2d(magnitude, dr, dc) for dr, dc in offsets]

    thin = magnitude
    for pos_i in range(4):
        neg_i = pos_i + 4
        is_oriented = (positive_idx == pos_i) | (positive_idx == neg_i)
        is_max = jnp.minimum(directional[pos_i], directional[neg_i]) > 0.0
        to_remove = (~is_max) & is_oriented
        thin = jnp.where(to_remove, 0.0, thin)
    return thin


def canny(img: jnp.ndarray,
          low_threshold: Optional[float] = None,
          high_threshold: Optional[float] = None,
          hysteresis: bool = False,
          *, sigma: float = 1.0, alpha: float = 0.0) -> jnp.ndarray:
    """Full differentiable Canny (reference CannyFilter.forward)."""
    _, grad_x, grad_y, magnitude = _blur_sobel_magnitude(img, sigma)
    magnitude = jnp.where(magnitude < alpha, 0.0, magnitude)
    thin = _nms(magnitude, grad_x, grad_y)

    if low_threshold is None:
        return thin
    low = (binary_connect(thin - low_threshold) + 1.0) / 2.0
    if high_threshold is None:
        return low
    high = (binary_connect(thin - high_threshold) + 1.0) / 2.0
    thin = low * 0.5 + high * 0.5
    if hysteresis:
        # In the reference the weak/vote path is built from boolean comparisons
        # (no STE), so gradient flows only through `high` (utils/core.py:317-321).
        weak = (thin == 0.5).astype(thin.dtype)
        votes = stencil2d(thin, hysteresis_kernel(), pad_mode="zero")
        weak_is_high = (votes > 1.0).astype(thin.dtype) * weak
        thin = high + jax.lax.stop_gradient(weak_is_high)
    return thin


def canny_bpda(img: jnp.ndarray,
               low_threshold: Optional[float] = None,
               high_threshold: Optional[float] = None,
               hysteresis: bool = False,
               *, sigma: float = 1.0, alpha: float = 0.0) -> jnp.ndarray:
    """BPDA Canny: STE thresholds, multiplicative NMS, no alpha mask
    (reference CannyFilter_BPDA.forward, utils/core.py:426-505)."""
    del alpha  # kept for constructor parity; the BPDA forward never masks
    _, grad_x, grad_y, magnitude = _blur_sobel_magnitude(img, sigma)
    thin = _nms(magnitude, grad_x, grad_y)

    if low_threshold is None:
        return thin
    low = to_compare(thin, float(low_threshold))
    if high_threshold is None:
        return thin  # reference returns un-thresholded thin when only low is given
    high = to_compare(thin, float(high_threshold))
    thin = low * 0.5 + high * 0.5
    if hysteresis:
        weak = to_eq(thin)
        votes = stencil2d(thin, hysteresis_kernel(), pad_mode="zero")
        weak_is_high = to_compare(votes, 1.0) * weak
        thin = high + weak_is_high
    return thin


def canny_step125(img: jnp.ndarray,
                  low_threshold: Optional[float] = None,
                  high_threshold: Optional[float] = None,
                  hysteresis: bool = False,
                  *, sigma: float = 1.0, alpha: float = 0.0) -> jnp.ndarray:
    """"BPDA-3" Canny steps 1,2,5: blur -> sobel -> magnitude -> alpha mask ->
    single high-threshold STE (reference CannyFilter_step125_1.forward)."""
    del low_threshold, hysteresis  # unused by this variant, as in the reference
    _, _, _, magnitude = _blur_sobel_magnitude(img, sigma)
    magnitude = jnp.where(magnitude < alpha, 0.0, magnitude)
    return to_compare(magnitude, float(high_threshold))


CANNY_VARIANTS = {
    "CannyFilter": canny,
    "CannyFilter_BPDA": canny_bpda,
    "CannyFilter_step125_1": canny_step125,
}
