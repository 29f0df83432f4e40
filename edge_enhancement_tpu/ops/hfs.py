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


@functools.lru_cache(maxsize=None)
def _hfs_axis_operators(h: int, w: int, r: int):
    """Factor the FFT->mask->IFFT sandwich into per-axis linear operators.

    The reference's 2-D mask is separable (an outer product of 1-D binary
    masks: the template is a filled rectangle rolled per axis), so

        y = Re(ifft2(fft2(x) * M)) = Re(A @ x @ B.T),
        A = iF_h diag(m_row) F_h,   B = iF_w diag(m_col) F_w,

    and with real x the imaginary cross-terms drop:
        y = Re(A) x Re(B).T - Im(A) x Im(B).T.

    This is EXACT (same linear operator), and turns the op from TPU's
    matmul-emulated FFT (~28 ms/batch measured) into two small MXU matmuls.
    """
    mask = hfs_mask(h, w, r)
    # recover the 1-D factors from the first nonzero row/col
    row_any = mask.max(axis=1)
    col_any = mask.max(axis=0)
    assert np.allclose(np.outer(row_any, col_any), mask), "mask not separable"
    fh = np.fft.fft(np.eye(h), axis=0)
    fw = np.fft.fft(np.eye(w), axis=0)
    a = np.fft.ifft(row_any[:, None] * fh, axis=0)          # iF diag(m) F
    b = np.fft.ifft(col_any[:, None] * fw, axis=0)
    # numpy constants (NOT jnp arrays: caching device arrays created inside a
    # trace leaks tracers across jit invocations)
    return (a.real.astype(np.float32), a.imag.astype(np.float32),
            b.real.astype(np.float32), b.imag.astype(np.float32))


def high_freq_suppress(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Low-pass filter each channel of an NHWC batch.

    Equals Re(ifft2(fft2(x) * mask)) — torch.rfft/irfft with onesided=False
    in the reference forward (utils/core.py:47-52) — computed as two per-axis
    matmuls on the MXU (see _hfs_axis_operators). The gradient is the same
    linear operator.
    """
    h, w = x.shape[1], x.shape[2]
    ar, ai, br, bi = _hfs_axis_operators(h, w, r)

    def sandwich(a_mat, b_mat):
        # operators in the input dtype (bf16 under the mixed-precision
        # policy -> MXU bf16 throughput), accumulation in f32
        a_mat = jnp.asarray(a_mat, x.dtype)
        b_mat = jnp.asarray(b_mat, x.dtype)
        t = jnp.einsum("ah,nhwc->nawc", a_mat, x,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("nawc,bw->nabc", t.astype(x.dtype), b_mat,
                          preferred_element_type=jnp.float32)

    y = sandwich(ar, br) - sandwich(ai, bi)
    return y.astype(x.dtype)


def high_freq_suppress_fft(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Reference FFT formulation (kept for golden tests)."""
    h, w = x.shape[1], x.shape[2]
    mask = jnp.asarray(hfs_mask(h, w, r))[None, :, :, None]
    x_hat = jnp.fft.fft2(x, axes=(1, 2))
    y = jnp.fft.ifft2(x_hat * mask, axes=(1, 2))
    return jnp.real(y).astype(x.dtype)
