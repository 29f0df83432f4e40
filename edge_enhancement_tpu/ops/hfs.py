"""High-frequency suppression: low-pass filter in the 2-D Fourier domain.

Parity target: `HighFreqSuppress` (reference utils/core.py:15-55) — full
(two-sided) 2-D FFT, multiply by a binary centred-square mask of radius `r`
rolled to FFT index order, inverse FFT, keep the real part. The mask is a
static compile-time constant per (h, w, r); the whole op lowers to two XLA
FFTs plus a fused elementwise multiply.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def hfs_mask(h: int, w: int, r: int) -> np.ndarray:
    """Binary low-pass mask in FFT index order, shape (h, w).

    Built exactly like the reference template (utils/core.py:23-42): ones on
    a centred square [c-r, c+r) per axis — extended one extra index on the
    high side for odd dims — then rolled so index 0 is the DC bin.
    """
    mask = np.zeros((h, w), dtype=np.float32)
    ch, cw = h // 2, w // 2
    dh = r if h % 2 == 0 else r + 1
    dw = r if w % 2 == 0 else r + 1
    mask[max(ch - r, 0):ch + dh, max(cw - r, 0):cw + dw] = 1.0
    mask = np.roll(mask, -ch, axis=0)
    mask = np.roll(mask, -cw, axis=1)
    return mask


def high_freq_suppress(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Low-pass filter each channel of an NHWC batch.

    y = Re(ifft2(fft2(x) * mask)); gradient is the same linear operator
    (the mask is real and the op is linear), matching torch.rfft/irfft with
    onesided=False in the reference forward (utils/core.py:47-52).
    """
    h, w = x.shape[1], x.shape[2]
    mask = jnp.asarray(hfs_mask(h, w, r))[None, :, :, None]
    x_hat = jnp.fft.fft2(x, axes=(1, 2))
    y = jnp.fft.ifft2(x_hat * mask, axes=(1, 2))
    return jnp.real(y).astype(x.dtype)
