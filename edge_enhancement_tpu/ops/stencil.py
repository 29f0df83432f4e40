"""Small-stencil convolutions expressed as fused shift/multiply-adds.

On TPU, a 3x3 single-channel convolution is a terrible MXU workload (the
systolic array wants large contraction dims), but it is a perfect VPU
workload: k*k shifted multiply-adds that XLA fuses into one bandwidth-bound
elementwise pass. Every small fixed-kernel conv in the edge pipeline
(Gaussian blur, Sobel, directional NMS differences, hysteresis voting) goes
through these helpers instead of `lax.conv`.

Layout is NHWC throughout (TPU-native; channels on the 128-lane axis).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def stencil2d(x: jnp.ndarray, kernel: np.ndarray, pad_mode: str = "edge") -> jnp.ndarray:
    """Depthwise k x k cross-correlation with 'same' output size.

    Equivalent to the reference's `F.conv2d(ReplicationPad2d(p)(x), w)` per
    channel (utils/core.py:233-252) when pad_mode='edge', and to
    `F.conv2d(x, w, padding=p)` when pad_mode='zero'.

    Args:
      x: (B, H, W, C) array.
      kernel: (kh, kw) numpy constant; baked into the program at trace time.
      pad_mode: 'edge' (replication) or 'zero'.
    """
    kernel = np.asarray(kernel)
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    mode = {"edge": "edge", "zero": "constant"}[pad_mode]
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)
    h, w = x.shape[1], x.shape[2]
    out = None
    for i in range(kh):
        for j in range(kw):
            coeff = float(kernel[i, j])
            if coeff == 0.0:
                continue
            term = coeff * xp[:, i:i + h, j:j + w, :]
            out = term if out is None else out + term
    if out is None:
        out = jnp.zeros_like(x)
    return out


def shift2d(x: jnp.ndarray, drow: int, dcol: int) -> jnp.ndarray:
    """out[b, r, c, k] = x[b, r+drow, c+dcol, k], zero outside the image.

    Used for the directional NMS differences: conv with a "+1 centre, -1 at
    neighbour (drow, dcol)" kernel equals `x - shift2d(x, drow, dcol)`.
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="constant")
    h, w = x.shape[1], x.shape[2]
    return xp[:, 1 + drow:1 + drow + h, 1 + dcol:1 + dcol + w, :]
